"""Scrub: JVM regexp_replace chain == pandas-UDF chain == reference, byte-
for-byte on every fixture doc."""

from __future__ import annotations

from pyspark.sql import functions as F

from ispaq_spark.functions.scrub import scrub_pandas_udf, scrub_sql
from ispaq_spark.reference_impl import scrub_text


def test_three_way_byte_identity(spark, fixture_labels):
    texts = [
        (url, lab["text"])
        for url, lab in fixture_labels.items()
        if lab["text"] is not None
    ]
    df = spark.createDataFrame(texts, ["url", "text"])
    out = df.select(
        "url",
        scrub_sql(F.col("text")).alias("sql_scrub"),
        scrub_pandas_udf(F.col("text")).alias("pd_scrub"),
    ).collect()
    assert len(out) > 300
    ref = {url: scrub_text(text) for url, text in texts}
    for r in out:
        assert r["sql_scrub"] == ref[r["url"]], r["url"]
        assert r["pd_scrub"] == ref[r["url"]], r["url"]
