"""Streaming session windows: gap-merged sessions finalize exactly once,
after the watermark (advanced by later data, possibly in a later run)
passes their close."""

from __future__ import annotations

import datetime
import tempfile

from ispaq_spark.streaming.stream_pipeline import run_sessions_once

T0 = datetime.datetime(2024, 1, 1, 12, 0, 0)


def _write(spark, path, rows):
    spark.createDataFrame(rows, "user_id bigint, ts timestamp").coalesce(
        1
    ).write.mode("append").parquet(path)


def test_session_windows_emit_once_closed(spark):
    src = tempfile.mkdtemp(prefix="sess_src_")
    ckpt = tempfile.mkdtemp(prefix="sess_ckpt_")
    out = tempfile.mkdtemp(prefix="sess_out_") + "/result"

    mins = lambda m: T0 + datetime.timedelta(minutes=m)  # noqa: E731
    # user 1: two sessions (0,5,8) and (30,33) with a 10-minute gap rule;
    # user 2: a single-event session
    _write(
        spark,
        src,
        [(1, mins(0)), (1, mins(5)), (1, mins(8)),
         (1, mins(30)), (1, mins(33)), (2, mins(1))],
    )
    run_sessions_once(spark, src, ckpt, out)
    # nothing may emit yet: the watermark hasn't passed any session close
    assert spark.read.parquet(out).count() == 0

    # a later event (next day) advances the watermark past every close
    _write(spark, src, [(99, T0 + datetime.timedelta(days=1))])
    run_sessions_once(spark, src, ckpt, out)
    got = {
        (r["user_id"], r["n_events"]): r
        for r in spark.read.parquet(out).collect()
    }
    assert set(got) == {(1, 3), (1, 2), (2, 1)}
    s13 = got[(1, 3)]
    assert s13["session_start"] == mins(0)
    assert s13["session_end"] == mins(8 + 10)  # last event + gap
