"""Watermarked stream-stream join: crawl pages joined to a late-arriving
per-url label/verdict stream (human review, classifier backfill, abuse
reports) within a bounded time skew.

This is the streaming surface the rest of `streaming/` doesn't cover:
stream-STREAM (both sides unbounded), where Spark must buffer each side in
the state store until the other side's watermark proves no more matches can
arrive. Two bounds make the state finite and eviction provable:

  * each side declares a watermark on its own event time, and
  * the join predicate carries a TIME-RANGE condition tying the two event
    times together (label_ts within [warc_ts, warc_ts + horizon]) — without
    it Spark would have to keep every page forever.

State size is therefore O(arrival rate x horizon) per side, independent of
stream length — the same bounded-state argument as
`stateful_dedup.dedup_within_watermark`.

Graft slot: the reference's event-window metric join (QuakeML events picked
up after the waveform day is already ingested, concierge event loop,
SURVEY.md §2.3 interval joins) promoted to a both-sides-streaming shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_labels(
    pages_stream: DataFrame,
    labels_stream: DataFrame,
    horizon: str = "2 days",
    late: str = "1 day",
) -> DataFrame:
    """pages (url, warc_ts, ...) INNER JOIN labels (url, label_ts, label)
    where the label arrives within `horizon` after the page's warc_ts.
    Both sides watermarked by `late`; emits (url, warc_ts, label_ts,
    label) exactly once per matching pair in append mode."""
    p = pages_stream.select("url", "warc_ts").withWatermark(
        "warc_ts", late
    )
    lb = (
        labels_stream.select(
            F.col("url").alias("l_url"), "label_ts", "label"
        ).withWatermark("label_ts", late)
    )
    cond = (
        (F.col("url") == F.col("l_url"))
        & (F.col("label_ts") >= F.col("warc_ts"))
        & (
            F.col("label_ts")
            <= F.col("warc_ts") + F.expr(f"INTERVAL {horizon}")
        )
    )
    return p.join(lb, cond, "inner").select(
        "url", "warc_ts", "label_ts", "label"
    )


def run_label_join_once(
    spark,
    pages_dir: str,
    labels_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    pages_schema: str = "url string, warc_ts timestamp",
    labels_schema: str = "url string, label_ts timestamp, label string",
):
    """Drain both file-source streams through the watermarked join into a
    parquet sink; the checkpoint carries both sides' buffered state, so a
    label file landing in a LATER run still matches pages ingested in an
    earlier one (within the watermark bounds)."""
    from .stream_pipeline import _await_drained

    pages = (
        spark.readStream.schema(pages_schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(pages_dir)
    )
    labels = (
        spark.readStream.schema(labels_schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(labels_dir)
    )
    q = (
        join_labels(pages, labels)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await_drained(q, 300)
    return q
