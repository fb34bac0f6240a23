"""Structured Streaming variant: same stages, micro-batched, checkpointed."""

from __future__ import annotations

import tempfile

from ispaq_spark.streaming.stream_pipeline import run_stream_once
from ispaq_spark.synthesize import pages_df


def test_stream_matches_batch(spark, model):
    src = tempfile.mkdtemp(prefix="stream_src_")
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    # two "arriving" file batches
    pages_df(spark, 60, partitions=2).write.mode("append").parquet(src)
    pages_df(spark, 60, partitions=2).write.mode("append").parquet(src)

    run_stream_once(spark, src, ckpt, out_table="smoke_out", model=model)
    got = spark.sql("SELECT * FROM smoke_out")
    # 120 rows arrived (60 urls x2 duplicates is fine - stream is append)
    assert got.count() == 120
    cols = set(got.columns)
    assert {"url", "keep", "scrubbed_text", "quality_flag"} <= cols

    # batch pipeline on the same input gives identical per-url decisions
    from ispaq_spark.pipeline import run_pipeline

    batch = run_pipeline(spark, spark.read.parquet(src), model=model)
    b = {(r["url"]): (r["keep"], r["scrubbed_text"]) for r in batch.collect()}
    for r in got.collect():
        assert (r["keep"], r["scrubbed_text"]) == b[r["url"]], r["url"]
