"""Approximate aggregates — the 100-TB substitutes for exact sort-based
median and exact countDistinct (SURVEY §2.4: exact percentile/mode are the
only non-algebraic aggregations in the inventory).

The driver-contract queries use EXACT forms because the oracle demands
value parity; at real scale `approx_percentile` (t-digest style sketch,
algebraic, map-side combinable) and `approx_count_distinct` (HyperLogLog++)
are the right plan. These tests pin that the approximations stay within
advertised error on the fixture so the swap is a config flip, not a leap.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def test_approx_percentile_close_to_exact(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    r = li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.5)).alias("exact"),
        F.percentile_approx("l_quantity", F.lit(0.5), F.lit(10000)).alias(
            "approx"
        ),
    )
    for row in r.collect():
        # quantity is 1..50-ish; at accuracy 10000 the rank error is tiny
        assert abs(row["approx"] - row["exact"]) <= 1.0, row


def test_approx_count_distinct_within_rsd(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    r = li.agg(
        F.countDistinct("l_orderkey").alias("exact"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx"),
    ).collect()[0]
    rel_err = abs(r["approx"] - r["exact"]) / r["exact"]
    assert rel_err < 0.06, (r["exact"], r["approx"])  # 3x the 2% rsd
