"""translate-based symbol count must exactly equal regexp_count with the
contract pattern (the optimization swapped regex for a char map)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ispaq_spark.contract import SYMBOL_PATTERN
from ispaq_spark.functions.heuristics import symbol_count


def test_translate_equals_regex(spark, fixture_labels):
    texts = [
        (u, lab["text"]) for u, lab in fixture_labels.items() if lab["text"]
    ]
    df = spark.createDataFrame(texts, ["url", "text"])
    bad = (
        df.select(
            symbol_count(F.col("text")).alias("a"),
            F.regexp_count("text", F.lit(SYMBOL_PATTERN)).alias("b"),
        )
        .where("a <> b")
        .count()
    )
    assert bad == 0


def test_translate_edge_cases(spark):
    rows = [
        ("plain words here", 0),
        ("a@b #x <tag>", 4),  # @ # < >
        ("dots. commas, quotes' dash-", 0),
        ("", 0),
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], ["text"])
    got = [r["c"] for r in df.select(symbol_count(F.col("text")).alias("c")).collect()]
    assert got == [c for _, c in rows]
