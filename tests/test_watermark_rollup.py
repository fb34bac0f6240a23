"""Watermarked windowed rollup: late-data drop + exactly-once emission.

Proves the streaming lineage rollup's event-time contract end-to-end
through the parquet file sink, across three checkpoint-resumed drains:

* a row arriving LATER than the checkpointed watermark is dropped from its
  (already finalized) daily window — the window's counts are exactly the
  on-time rows;
* an on-time late-batch row (>= watermark) IS counted;
* a window is emitted only after the watermark passes its end, and exactly
  once (windows still open at the final watermark never appear);
* the watermark itself survives query restarts via the checkpoint — each
  drain is a separate streaming query run.
"""

from __future__ import annotations

import tempfile

from ispaq_spark.streaming.stream_pipeline import run_rollup_stream_once

SCHEMA = "ds string, keep boolean, quality_flag int"


def _write(spark, src, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)


def test_watermark_drops_late_rows_and_emits_once(spark):
    src = tempfile.mkdtemp(prefix="wm_src_")
    out = tempfile.mkdtemp(prefix="wm_out_")
    ckpt = tempfile.mkdtemp(prefix="wm_ckpt_")

    # drain 1: days 01..07 (2 rows each, one kept) + day 10 watermark
    # driver. Watermark delay is 2 days -> checkpointed watermark = 01-08.
    batch1 = []
    for d in range(1, 8):
        batch1.append((f"2024-01-{d:02d}", True, 0))
        batch1.append((f"2024-01-{d:02d}", False, -9))
    batch1.append(("2024-01-10", True, 0))
    _write(spark, src, batch1)
    run_rollup_stream_once(spark, src, out, ckpt)

    # drain 2 (restart from checkpoint): a LATE row for day 03 (behind the
    # 01-08 watermark -> must be dropped), an on-time row for day 09, and
    # a day-12 row that advances the watermark to 01-10.
    _write(
        spark,
        src,
        [
            ("2024-01-03", True, 0),  # late: below checkpointed watermark
            ("2024-01-09", True, 0),  # on time
            ("2024-01-12", True, 0),  # advances watermark
        ],
    )
    run_rollup_stream_once(spark, src, out, ckpt)

    # drain 3: one far-future row so the batch runs with watermark 01-10
    # and flushes the day-08..09 windows closed at the end of drain 2.
    _write(spark, src, [("2024-01-15", True, 0)])
    run_rollup_stream_once(spark, src, out, ckpt)

    got = {
        str(r["day"])[:10]: (r["docs_in"], r["docs_kept"], r["docs_error"])
        for r in spark.read.parquet(out).collect()
    }

    # day 03: the late row was dropped -> counts are drain-1 rows only
    assert got["2024-01-03"] == (2, 1, 1)
    # every drain-1 day emitted once with exact counts
    for d in range(1, 8):
        assert got[f"2024-01-{d:02d}"] == (2, 1, 1)
    # the on-time drain-2 row landed in its window
    assert got["2024-01-09"] == (1, 1, 0)
    # windows not yet closed by the final watermark (01-13) never emitted
    assert "2024-01-15" not in got
    # exactly-once: no duplicate day rows in the sink
    days = [str(r["day"])[:10] for r in spark.read.parquet(out).collect()]
    assert len(days) == len(set(days))
