"""Resumable idempotent sink (ispaq_spark/sinks.py): upsert-by-partition +
manifest-fingerprint resume — the SQLite-upsert / Iceberg-snapshot analog."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from ispaq_spark.sinks import run_resumable, read_manifest
from ispaq_spark.synthesize import default_model, pages_df


def test_resume_skips_then_recomputes(spark, tmp_path):
    out = str(tmp_path / "metrics")
    model = default_model()
    pages = pages_df(spark, 400).cache()
    pages.count()

    # first run computes every day
    r1 = run_resumable(spark, pages, out, model=model)
    assert r1["computed"] and not r1["skipped"]
    full = spark.read.parquet(out)
    n_total = full.count()
    # parquet partition-type inference reads ds back as a date
    all_ds = sorted(str(r["ds"]) for r in full.select("ds").distinct().collect())
    assert all_ds == r1["computed"]

    # identical rerun is a complete no-op
    r2 = run_resumable(spark, pages, out, model=model)
    assert not r2["computed"] and r2["skipped"] == all_ds

    # simulate losing one partition's output (executor/driver crash between
    # write and manifest, or a deleted snapshot): only that day recomputes
    lost = all_ds[1]
    shutil.rmtree(f"{out}/ds={lost}")
    r3 = run_resumable(spark, pages, out, model=model)
    assert r3["computed"] == [lost]
    assert sorted(r3["skipped"] + r3["computed"]) == all_ds

    # the resumed table equals a from-scratch run, row for row
    assert spark.read.parquet(out).count() == n_total
    again = str(tmp_path / "metrics_fresh")
    run_resumable(spark, pages, again, model=model)
    a = spark.read.parquet(out).orderBy("url").toPandas()
    b = spark.read.parquet(again).orderBy("url").toPandas()
    assert a.equals(b)

    pages.unpersist()


def test_changed_input_invalidates_partition(spark, tmp_path):
    out = str(tmp_path / "metrics")
    model = default_model()
    pages = pages_df(spark, 300).cache()
    pages.count()
    run_resumable(spark, pages, out, model=model)
    manifest_before = read_manifest(out)

    # perturb one day's input (an extra page): only that day recomputes
    extra_ds = sorted(manifest_before)[0]
    extra = pages.limit(1).withColumn(
        "url", F.concat(F.col("url"), F.lit("-new"))
    ).withColumn("warc_ts", F.to_timestamp(F.lit(f"{extra_ds} 12:00:00")))
    perturbed = pages.unionByName(extra)
    r = run_resumable(spark, perturbed, out, model=model)
    assert r["computed"] == [extra_ds]
    assert read_manifest(out)[extra_ds] != manifest_before[extra_ds]
    pages.unpersist()


class _MemorySink:
    """A second MetricSink backend (collected rows + in-memory snapshot):
    proves run_resumable drives the interface, not the parquet backend —
    the shape an Iceberg-catalog implementation drops into."""

    def __init__(self):
        self.partitions: dict[str, list] = {}
        self.snapshot: dict[str, str] = {}
        self.merge_calls = 0

    def merge(self, metrics):
        self.merge_calls += 1
        for ds, rows in _group_by_ds(metrics):
            self.partitions[ds] = rows

    def read_snapshot(self):
        return dict(self.snapshot)

    def commit_snapshot(self, fingerprints):
        self.snapshot = dict(fingerprints)

    def partition_complete(self, ds):
        return ds in self.partitions


def _group_by_ds(metrics):
    from collections import defaultdict

    by_ds = defaultdict(list)
    for r in metrics.collect():
        by_ds[str(r["ds"])].append(r)
    return by_ds.items()


def test_run_resumable_drives_any_sink(spark):
    model = default_model()
    pages = pages_df(spark, 200).cache()
    pages.count()
    sink = _MemorySink()

    r1 = run_resumable(spark, pages, model=model, sink=sink)
    assert r1["computed"] and not r1["skipped"]
    assert sorted(sink.partitions) == r1["computed"]
    assert sink.merge_calls == 1

    # no-op rerun: the resume logic consults only the interface
    r2 = run_resumable(spark, pages, model=model, sink=sink)
    assert not r2["computed"]
    assert sink.merge_calls == 1

    # losing a partition in the backend triggers exactly that recompute
    lost = r1["computed"][0]
    del sink.partitions[lost]
    r3 = run_resumable(spark, pages, model=model, sink=sink)
    assert r3["computed"] == [lost]
    pages.unpersist()
