"""Stateful streaming exact-dedup: applyInPandasWithState keyed by content
hash — emit a document the FIRST time its content is seen, across
micro-batches and across restarts (state lives in the checkpoint).

Graft slot: the idempotent-rerun guarantee of the reference's keyed SQLite
upsert (ispaq/utils.py:157-272 — reruns overwrite, never duplicate),
promoted to a streaming invariant: late re-crawls of identical content
never re-enter the curated table. The batch analog is operators/dedup.py
exact_dedup; this is its arbitrary-stateful-operator form (SURVEY.md §2.8).

Scale posture: state is ONE tiny row per distinct content hash (the hash is
the group key, so it is never stored twice); the shuffle carries
(hash, url, ts) only, never document bodies.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "chash string, url string, n_dups_dropped bigint"
STATE_SCHEMA = "seen int"


def _first_per_hash(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n_rows = 0
    first_url = None
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        n_rows += len(pdf)
        cand = pdf["url"].min()
        if first_url is None or cand < first_url:
            first_url = cand
    if n_rows == 0:
        return
    if state.exists:
        # content already emitted in an earlier batch/run: drop everything
        (seen,) = state.get
        state.update((seen + n_rows,))
        return
    state.update((n_rows,))
    yield pd.DataFrame(
        [{"chash": key[0], "url": first_url, "n_dups_dropped": n_rows - 1}]
    )


def dedup_stream(pages_stream: DataFrame) -> DataFrame:
    """pages stream -> stream of first-seen documents (chash, url,
    n_dups_dropped)."""
    keyed = (
        pages_stream.where(F.col("text").isNotNull())
        .select(F.md5("text").alias("chash"), "url")
        .groupBy("chash")
    )
    # append mode: each content hash is emitted AT MOST ONCE ever (the
    # state row guards re-emission), which is exactly append semantics —
    # and append is what fault-tolerant file sinks require for
    # checkpoint-recovery (the memory sink cannot resume from checkpoint).
    return keyed.applyInPandasWithState(
        _first_per_hash,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_dedup_once(spark, source_dir: str, checkpoint_dir: str, out_dir: str):
    """Drain available input through the stateful dedup into a parquet
    sink; rerunning with the same checkpoint restores the seen-hash state,
    so duplicates arriving in LATER runs are still dropped. Read results
    with spark.read.parquet(out_dir)."""
    from .stream_pipeline import _await_drained, streaming_pages

    out = dedup_stream(streaming_pages(spark, source_dir))
    q = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    _await_drained(q, 300)
    return q


def dedup_within_watermark(
    pages_stream: DataFrame, horizon: str = "2 days"
) -> DataFrame:
    """Bounded-state streaming dedup via the built-in
    `dropDuplicatesWithinWatermark`: a page is dropped if a page with the
    same content hash arrived within the watermark horizon — the crawl
    re-fetch suppressor. Unlike `dedup_stream` (whose seen-hash state
    grows forever — the exact-once-EVER contract), the state store here
    EVICTS hashes older than the horizon, so state size is bounded by the
    distinct-content arrival rate times the horizon: the form that runs
    indefinitely at crawl scale. A re-crawl after the horizon re-emits —
    by design (content that old is re-scored anyway).

    Emits the surviving pages themselves (full rows), not a digest —
    this stage slots in FRONT of the streaming metric pipeline."""
    return (
        pages_stream.where(F.col("text").isNotNull())
        .withColumn("chash", F.md5("text"))
        .withWatermark("warc_ts", horizon)
        .dropDuplicatesWithinWatermark(["chash"])
    )


def run_watermark_dedup_once(
    spark, source_dir: str, checkpoint_dir: str, out_dir: str,
    horizon: str = "2 days",
):
    """Drain available input through the watermark-bounded dedup into a
    parquet sink (append mode; the operator emits each survivor exactly
    once)."""
    from .stream_pipeline import _await_drained, streaming_pages

    out = dedup_within_watermark(
        streaming_pages(spark, source_dir), horizon
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    _await_drained(q, 300)
    return q
