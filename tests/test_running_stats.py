"""transformWithStateInPandas running per-source stats: lifetime counters
must accumulate within a run and RESUME across runs via the checkpoint."""

from __future__ import annotations

import importlib.util

import pytest

pytestmark = pytest.mark.skipif(
    importlib.util.find_spec("google.protobuf") is None
    if importlib.util.find_spec("google") is not None
    else True,
    reason="transformWithStateInPandas needs protobuf (state-server "
    "protocol); package absent from this container",
)


def _write_docs(spark, rows, path):
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("append").parquet(path)


@pytest.fixture()
def dirs(tmp_path):
    return str(tmp_path / "src"), str(tmp_path / "chk")


def test_lifetime_stats_resume_across_runs(spark, dirs):
    from ispaq_spark.streaming.running_stats import run_stats_once

    src, chk = dirs
    _write_docs(
        spark,
        [
            (0, "a", "en", "s0", 100),
            (1, "b", "en", "s0", 300),
            (2, "c", "en", "s1", 50),
        ],
        src,
    )
    first = {r["source"]: r for r in run_stats_once(spark, src, chk)}
    assert first["s0"]["docs_seen"] == 2
    assert first["s0"]["total_chars"] == 400
    assert first["s0"]["mean_chars"] == pytest.approx(200.0)
    assert first["s1"]["docs_seen"] == 1

    # second run, same checkpoint: new files arrive; counters must CONTINUE
    # from checkpointed state, not restart
    _write_docs(spark, [(3, "d", "en", "s0", 500)], src)
    second = {r["source"]: r for r in run_stats_once(spark, src, chk)}
    assert set(second) == {"s0"}  # only the touched source re-emits
    assert second["s0"]["docs_seen"] == 3
    assert second["s0"]["total_chars"] == 900
    assert second["s0"]["mean_chars"] == pytest.approx(300.0)
