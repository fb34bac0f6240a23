"""The composed curation recipe: monotone stage survival, determinism
across runs, contamination actually removed, caps and splits honored."""

from __future__ import annotations

from pyspark.sql import functions as F

from ispaq_spark.curation import (
    CurationPolicy,
    curate_corpus,
    decontaminate,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_stage_counts_monotone_and_nonempty(spark):
    docs = _docs(spark)
    bench = docs.orderBy("doc_id").limit(5)  # pretend-benchmark from corpus
    res = curate_corpus(docs, benchmark=bench, keep_stages=True)
    rep = res.report()
    order = [
        "input",
        "exact_dedup",
        "near_dedup",
        "quality",
        "decontaminated",
        "capped",
        "split",
    ]
    assert list(rep) == order
    counts = [rep[k] for k in order]
    assert counts[0] == 500
    # each stage only removes (split adds a column, not rows)
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    assert rep["split"] > 0
    # the pretend-benchmark overlaps itself -> decontamination really bit
    assert rep["decontaminated"] < rep["quality"]


def test_deterministic_across_runs(spark):
    docs = _docs(spark)
    a = curate_corpus(docs).curated.select("doc_id", "split").collect()
    b = curate_corpus(docs).curated.select("doc_id", "split").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_no_contamination_survives(spark):
    docs = _docs(spark)
    bench = docs.orderBy("doc_id").limit(10)
    clean = decontaminate(docs, bench)
    grams = lambda df: df.select(  # noqa: E731
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(F.split("text", " ")) - F.lit(7)),
                lambda i: F.array_join(
                    F.slice(F.split(F.col("text"), " "), i, 8), " "
                ),
            )
        ).alias("g")
    )
    overlap = grams(clean).join(grams(bench).distinct(), "g")
    assert overlap.count() == 0


def test_cap_and_split_fractions(spark):
    docs = _docs(spark)
    pol = CurationPolicy(cap_per_source=10)
    out = curate_corpus(docs, policy=pol).curated
    per_src = out.groupBy("source").count().collect()
    assert per_src and all(r["count"] <= 10 for r in per_src)
    splits = dict(
        out.groupBy("split").count().rdd.map(tuple).collect()
    )
    assert set(splits) <= {"train", "val", "test"}
    assert splits.get("train", 0) > splits.get("test", 0)
