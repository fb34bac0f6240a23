"""Explicit schema constants — the engine's single schema registry.

The reference declares schemas ad hoc at each construction site (availability
column tuple at ispaq/concierge.py:563-567, sqlite DDLs at ispaq/utils.py:37-147,
no inference, no evolution). Here every table shape lives in one module as a
StructType constant, per SURVEY.md §1.3.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# Input: Common-Crawl-style pages (BASELINE.json input_hint; the graft analog
# of the miniSEED waveform store, SURVEY.md §1.4).
# ---------------------------------------------------------------------------
PAGES = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)

# Reference-truth labels fixture (FIXTURES.md §1): the F1 / byte-identity gate.
LABELS = StructType(
    [
        StructField("url", StringType(), False),
        StructField("keep", BooleanType(), False),
        StructField("scrubbed_text", StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Output: wide per-document metric row. One column per metric — the wide form
# of ispaq's long/EAV GeneralValueMetric rows (IRISMustangMetrics/R/
# Class-Metric.R:487-573); unpivot at the sink if EAV output is required.
# ---------------------------------------------------------------------------
DOC_METRICS = StructType(
    [
        StructField("url", StringType(), False),
        StructField("ds", StringType(), False),  # civil UTC day partition
        StructField("extracted_text", StringType(), True),
        StructField("scrubbed_text", StringType(), True),
        StructField("word_count", LongType(), True),
        StructField("mean_word_len", DoubleType(), True),
        StructField("max_word_len", LongType(), True),
        StructField("stopword_ratio", DoubleType(), True),
        StructField("symbol_word_ratio", DoubleType(), True),
        StructField("dup_5gram_frac", DoubleType(), True),
        StructField("pred_lang", StringType(), True),
        StructField("lang_conf", DoubleType(), True),
        StructField("perplexity", DoubleType(), True),
        StructField("num_pii", LongType(), True),
        StructField("num_tox", LongType(), True),
        StructField("keep", BooleanType(), True),
        # quality_flag: 0 = ok, -9 = quarantined (the reference's sentinel for
        # fetch/compute failure, ispaq/simple_metrics.py:128-140). Rows never
        # fail the job; they carry the flag.
        StructField("quality_flag", IntegerType(), False),
    ]
)

# Long/EAV metric view (ispaq sink shape, ispaq/utils.py:317-326).
METRICS_EAV = StructType(
    [
        StructField("target", StringType(), False),
        StructField("start", TimestampType(), False),
        StructField("end", TimestampType(), False),
        StructField("metricName", StringType(), False),
        StructField("value", DoubleType(), True),
        StructField("qualityFlag", IntegerType(), False),
    ]
)

# Per-partition lineage/rollup (graft analog of the psd/pdf aggregate tables,
# DDL pattern ispaq/utils.py:119-147; FIXTURES.md §3).
ROLLUP = StructType(
    [
        StructField("partition_id", StringType(), False),
        StructField("docs_in", LongType(), False),
        StructField("docs_kept", LongType(), False),
        StructField("docs_dropped", LongType(), False),
        StructField("docs_error", LongType(), False),
    ]
)

METRIC_HIST = StructType(
    [
        StructField("partition_id", StringType(), False),
        StructField("metricName", StringType(), False),
        StructField("hist_bin", DoubleType(), False),
        StructField("hits", LongType(), False),
    ]
)

# Multimodal side-band: opaque media blobs + typed metadata (mapInPandas
# decode stages operate on this; SURVEY round-prompt "multimodal columns").
MEDIA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("meta_width", IntegerType(), True),
        StructField("meta_height", IntegerType(), True),
        StructField("meta_duration_ms", LongType(), True),
    ]
)

EMBEDDING = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(DoubleType()), False),
        StructField("label", IntegerType(), True),
    ]
)
