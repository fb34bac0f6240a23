"""Per-source running corpus statistics via transformWithStateInPandas —
the Spark 4 arbitrary-stateful API (successor surface to
applyInPandasWithState, which streaming/stateful_dedup.py covers).

ENVIRONMENT GATE: executing this stage requires the `protobuf` package
(the transformWithState state-server protocol is protobuf-framed), which
is absent from this container — the test skips with that reason, and
`streaming/stateful_dedup.py` (applyInPandasWithState) is the covered
arbitrary-stateful surface here. The code below is the real API usage a
protobuf-equipped cluster runs unchanged.

Acquisition attempted and blocked (recorded 2026-08-17, re-attempted
2026-08-18): `pip download protobuf` fails with "Name or service not
known" on every retry (no network route to a package index from this
sandbox, and environment policy forbids installs); no protobuf wheel is
vendored anywhere on the image, and pyspark's bundled
`pyspark/sql/protobuf` dir is the from_protobuf SQL function wrapper,
not the python `google.protobuf` runtime.

Emits, after every micro-batch, the lifetime (docs_seen, total_chars,
mean_chars) per source — the always-current ingest ledger a curation
pipeline reads to rebalance its training mixture while the crawl streams
in. State is ONE fixed-width row per source (two bigints), so state size
is |sources|, independent of stream length; the shuffle carries
(source, n_chars) pairs only, never document bodies.

Graft slot: the reference's per-target metric accumulation across the day
loop (ispaq/simple_metrics.py:83-258), as a stateful streaming invariant.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = (
    "source string, docs_seen bigint, total_chars bigint, mean_chars double"
)
_STATE_SCHEMA = "n bigint, total_chars bigint"


class RunningSourceStats(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._agg = handle.getValueState("agg", _STATE_SCHEMA)

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n, total = (self._agg.get() or (0, 0)) if self._agg.exists() else (0, 0)
        batch_n = 0
        for pdf in rows:
            batch_n += len(pdf)
            total += int(pdf["n_chars"].sum())
        if batch_n == 0:
            return
        n += batch_n
        self._agg.update((n, total))
        yield pd.DataFrame(
            [
                {
                    "source": key[0],
                    "docs_seen": n,
                    "total_chars": total,
                    "mean_chars": total / n,
                }
            ]
        )

    def close(self) -> None:
        pass


def running_stats_stream(docs_stream: DataFrame) -> DataFrame:
    """documents-shaped stream -> update-mode stream of per-source lifetime
    stats (one refreshed row per source per micro-batch that touched it)."""
    keyed = (
        docs_stream.where(F.col("n_chars").isNotNull())
        .select("source", "n_chars")
        .groupBy("source")
    )
    return keyed.transformWithStateInPandas(
        statefulProcessor=RunningSourceStats(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def run_stats_once(spark, source_dir: str, checkpoint_dir: str) -> list:
    """Drain available input through the stateful aggregation; returns the
    update rows emitted by this run (via foreachBatch, the sink that
    supports update mode AND checkpoint recovery). Rerunning with the same
    checkpoint resumes the per-source counters — lifetime totals keep
    growing across runs, which the test asserts across two batches."""
    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, "
            "n_chars long"
        )
        .parquet(source_dir)
    )
    collected: list = []

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        collected.extend(batch_df.collect())

    q = (
        running_stats_stream(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return collected
