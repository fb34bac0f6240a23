"""Table-format catalog integration: MERGE INTO generation + runtime probe.

The reference's metric store is an upsert keyed (target, start, end): rerun
a day and rows overwrite, never duplicate (SQLite upsert,
ispaq/utils.py:157-272). On a lakehouse that contract is Iceberg/Delta
`MERGE INTO`. This container ships NEITHER runtime — `probe_table_catalog`
records exactly why (no iceberg/delta jars under pyspark's jars dir, and
the local DuckDB 1.0.0 predates its MERGE support) — so the catalog path
here is:

  * `merge_into_sql` — generate the MERGE statement an Iceberg/Delta
    catalog executes. The text is validated against Spark's own SQL parser
    in tests (parsePlan accepts it without needing a catalog), so the day
    a catalog jar is on the classpath, `CatalogMergeSink` runs unchanged.
  * `dataframe_merge` — the engine-agnostic semantics twin (target rows
    whose key is absent from the batch + the whole batch), the same
    shape `run_resumable`'s partition overwrite implements at day grain
    and the `merge_upsert` driver query proves cross-engine.
  * `CatalogMergeSink` — MetricSink backend that executes the generated
    MERGE via spark.sql against a configured catalog table and keeps
    snapshot fingerprints in a table property. Constructing it without a
    catalog raises with the probe's reason (no silent fallback).

tests/test_catalog_merge.py proves: generated SQL parses under Spark;
dataframe_merge == a DELETE+INSERT upsert transaction run by a second
engine (DuckDB) on the same rows; a rerun of the same batch is a no-op
(no duplicates) — the reference's idempotency contract; and the
generated statement is actually SUBMITTED for execution against both a
Spark-managed parquet table (V1) and a Derby-backed JDBCTableCatalog
(V2) — a self-upgrading gate that verifies the replace semantics end to
end wherever a row-level-capable catalog exists, and in this container
pins Spark's exact UNSUPPORTED_FEATURE.TABLE_OPERATION capability error
on both routes (recorded 2026-08-18; DuckDB 1.0.0 predates MERGE with a
ParserException, so no engine here can execute one).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sinks import MetricSink


def probe_table_catalog() -> dict:
    """Report which lakehouse runtimes this environment can actually run.

    Looks for iceberg-spark-runtime / delta-spark jars on pyspark's jar
    path (the only classpath a local[*] session loads without extra
    --packages, which would need network access this sandbox lacks)."""
    import pyspark

    jar_dir = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    jars = [os.path.basename(p) for p in glob.glob(f"{jar_dir}/*.jar")]
    found = {
        "iceberg": [j for j in jars if "iceberg" in j.lower()],
        "delta": [j for j in jars if "delta" in j.lower()],
    }
    return {
        "jar_dir": jar_dir,
        "iceberg": bool(found["iceberg"]),
        "delta": bool(found["delta"]),
        "jars": {k: v for k, v in found.items() if v},
        "reason": (
            None
            if found["iceberg"] or found["delta"]
            else "no iceberg/delta runtime jar on the pyspark classpath"
        ),
    }


def merge_into_sql(
    target: str,
    source: str,
    key_cols: list[str],
    value_cols: list[str],
    replace_scope: tuple[str, list] | None = None,
) -> str:
    """MERGE INTO text for the (target, start, end)-keyed metric upsert.

    `source` is a view/subquery name already registered in the session
    (e.g. createOrReplaceTempView of the new batch). Matched keys update
    every value column; unmatched keys insert — rerunning the same batch
    is a no-op, the reference's idempotency contract
    (ispaq/utils.py:157-272).

    `replace_scope=(col, values)` adds
    `WHEN NOT MATCHED BY SOURCE AND t.col IN (values) THEN DELETE`
    (Spark 3.4+ / Iceberg / Delta), turning the upsert into an atomic
    partition REPLACE for exactly those partitions: target rows in the
    scoped partitions that the batch no longer carries are deleted in the
    SAME commit that upserts the batch. One statement, one snapshot — a
    failure anywhere leaves the table untouched, so readers never observe
    a deleted-but-not-yet-merged day (the failure mode a separate
    DELETE-then-MERGE sequence has)."""
    on = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
    sets = ", ".join(f"t.{c} = s.{c}" for c in value_cols)
    cols = ", ".join(key_cols + value_cols)
    vals = ", ".join(f"s.{c}" for c in key_cols + value_cols)
    stmt = (
        f"MERGE INTO {target} t\n"
        f"USING {source} s\n"
        f"ON {on}\n"
        f"WHEN MATCHED THEN UPDATE SET {sets}\n"
        f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({vals})"
    )
    if replace_scope is not None:
        col, values = replace_scope
        # Backslash must be escaped BEFORE the quote doubling: under
        # Spark's default parser (escapedStringLiterals=false) a literal
        # value ending in \ would otherwise escape the closing quote and
        # corrupt (or inject into) the statement.
        quoted = ", ".join(
            "'"
            + str(v).replace("\\", "\\\\").replace("'", "''")
            + "'"
            for v in values
            if v is not None
        )
        # IN () never matches NULL, so a NULL partition value needs its
        # own IS NULL branch or its stale rows silently survive the
        # replace.
        branches = []
        if quoted:
            branches.append(f"t.{col} IN ({quoted})")
        if any(v is None for v in values):
            branches.append(f"t.{col} IS NULL")
        if branches:
            stmt += (
                f"\nWHEN NOT MATCHED BY SOURCE AND ({' OR '.join(branches)}) "
                f"THEN DELETE"
            )
    return stmt


def dataframe_merge(
    target: DataFrame, batch: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Engine-agnostic MERGE semantics: rows of `target` whose key is NOT
    in the batch, plus the whole batch. The batch must be key-unique
    (MERGE itself requires at most one source row per target row). One
    broadcast-able anti-join at metric-batch sizes; at fact scale the
    catalog executes this as MERGE INTO with partition pruning instead."""
    return target.join(
        batch.select(key_cols), on=key_cols, how="left_anti"
    ).unionByName(batch)


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    num_buckets: int = 32,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a DataFrame as a bucketed (optionally sort-bucketed) managed
    table, so every later join or aggregation on `keys` between
    co-bucketed tables is EXCHANGE-FREE: the bucket layout on disk IS the
    hash partitioning a shuffle would produce, paid once at write time and
    amortized over every downstream read. This is the 100-TB recipe for a
    fact table joined repeatedly on the same key (documents x metrics on
    doc_id, events x sessions on user_id): co-bucket both sides with the
    SAME bucket count. tests/test_bucketing.py proves the plan property.

    Graft slot: the reference's per-SNCL sqlite table layout
    (ispaq/utils.py:157-272) — its "one file per stream" is bucketing by
    another name, minus the join-locality payoff."""
    w = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *keys)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


class CatalogMergeSink(MetricSink):
    """MetricSink over a real catalog table via generated MERGE INTO.

    Requires an Iceberg/Delta-enabled SparkSession; constructing one in an
    environment whose probe finds no runtime raises immediately with the
    reason — the resume logic must never silently run against nothing."""

    SNAPSHOT_PROP = "ispaq.fingerprints"

    def __init__(
        self,
        spark: SparkSession,
        table: str,
        key_cols: list[str] | None = None,
    ):
        probe = probe_table_catalog()
        if not (probe["iceberg"] or probe["delta"]):
            raise RuntimeError(
                f"no table-format runtime available: {probe['reason']} "
                f"(probed {probe['jar_dir']})"
            )
        self.spark = spark
        self.table = table
        self.key_cols = key_cols or ["target", "start", "end"]

    def merge(self, metrics: DataFrame) -> None:
        import uuid

        # ds joins the MERGE key when present: without it a batch row can
        # MATCH a row in a DIFFERENT ds partition and UPDATE would rewrite
        # that partition's row — violating the "leave every other
        # partition untouched" contract.
        key_cols = list(self.key_cols)
        if "ds" in metrics.columns and "ds" not in key_cols:
            key_cols = ["ds"] + key_cols
        value_cols = [c for c in metrics.columns if c not in key_cols]
        # Pin ONE materialization of the batch before any use of it: the
        # ds scope below is collected from an execution of the plan and
        # the MERGE re-reads the same view — without the pin a
        # nondeterministic stage could insert ds values the scope never
        # covered, leaving stale rows in partitions the replace was
        # supposed to clear.
        # Snapshot the persisted-RDD ids first so the checkpoint blocks can
        # be RELEASED after the MERGE commits: localCheckpoint has no
        # public release API and its blocks otherwise stay pinned in
        # executor storage until driver GC — a long resumable ingest
        # calling merge() per day would accumulate one materialized batch
        # per day for the session lifetime. Merges on one sink run
        # serially (the day loop), so the id delta is this checkpoint's.
        jsc = self.spark.sparkContext._jsc
        rdd_ids_before = set(jsc.getPersistentRDDs().keySet().toArray())
        metrics = metrics.localCheckpoint(eager=True)
        # Per-call unique view name: a fixed session-global name lets two
        # sinks (or concurrent merges) in one SparkSession clobber each
        # other's source view mid-statement.
        view = f"_ispaq_merge_batch_{uuid.uuid4().hex}"
        metrics.createOrReplaceTempView(view)
        try:
            replace_scope = None
            if "ds" in metrics.columns:
                # MetricSink.merge must REPLACE the batch's ds partitions
                # (sinks.py:46-49): a key-grain MERGE alone never deletes
                # rows absent from a recomputed day (doc removed, metric
                # dropped), so stale rows would survive while
                # commit_snapshot marks the day's fingerprint green. The
                # replace rides the SAME MERGE statement as a
                # WHEN NOT MATCHED BY SOURCE ... THEN DELETE clause scoped
                # to exactly the batch's ds values — one atomic commit, so
                # a MERGE failure of any kind (analyzer error, OOM, schema
                # drift, crash) leaves the previous day intact instead of
                # deleted-and-empty. The ds values are collected ONCE
                # driver-side from the pinned batch (day grain, a handful
                # of strings).
                ds_rows = [
                    r["ds"]
                    for r in metrics.select("ds").distinct().collect()
                ]
                # NULL ds sorts (and quotes) as its own IS NULL branch in
                # merge_into_sql — sorted() over None-vs-str would raise,
                # and IN () would never match the NULL partition anyway.
                ds_vals = sorted(v for v in ds_rows if v is not None)
                if None in ds_rows:
                    ds_vals.append(None)
                if ds_vals:
                    replace_scope = ("ds", ds_vals)
            self.spark.sql(
                merge_into_sql(
                    self.table,
                    view,
                    key_cols,
                    value_cols,
                    replace_scope=replace_scope,
                )
            )
        finally:
            self.spark.catalog.dropTempView(view)
            jmap = jsc.getPersistentRDDs()
            for rid in jmap.keySet().toArray():
                if rid not in rdd_ids_before:
                    jmap.get(rid).unpersist(False)

    def read_snapshot(self) -> dict[str, str]:
        import json

        rows = self.spark.sql(
            f"SHOW TBLPROPERTIES {self.table}"
        ).collect()
        for r in rows:
            if r["key"] == self.SNAPSHOT_PROP:
                return json.loads(r["value"])
        return {}

    def commit_snapshot(self, fingerprints: dict[str, str]) -> None:
        import json

        payload = json.dumps(fingerprints, sort_keys=True).replace("'", "''")
        self.spark.sql(
            f"ALTER TABLE {self.table} SET TBLPROPERTIES "
            f"('{self.SNAPSHOT_PROP}' = '{payload}')"
        )

    def partition_complete(self, ds: str) -> bool:
        # merge() is one atomic MERGE (upsert + scoped BY SOURCE delete in
        # a single commit), so a failed merge leaves the day's previous
        # rows intact; this probe covers the remaining gap — a day whose
        # merge never ran at all — so run_resumable recomputes it.
        return (
            self.spark.table(self.table)
            .where(F.col("ds") == ds)
            .limit(1)
            .count()
            > 0
        )
