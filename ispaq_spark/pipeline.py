"""The end-to-end quality pipeline: pages -> metric columns -> keep/drop ->
scrub -> (metrics table, lineage rollups).

Graft of ispaq's execute path (ispaq/ispaq.py:443-466 ->
simple_metrics.py:83-258: day loop -> per-target fetch -> per-function rpy2
calls -> concat -> sink) as ONE declarative DataFrame plan: Catalyst fuses
every SQL metric set into the same WholeStageCodegen pass over the scan, and
the two Arrow stages (extraction, perplexity) batch through the JVM<->Python
boundary. There is no day loop — `ds` is a partition column and Spark
parallelizes across all days and documents at once.

Scale posture (north rule): optional salting repartition for skewed domains
*before* the metric stages, AQE enabled in the session, model broadcast,
quarantine instead of failure, idempotent partition-overwrite sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import PipelineContext, resolve
from .schemas import DOC_METRICS


def salt_repartition(pages: DataFrame, buckets: int) -> DataFrame:
    """Salt-partition skewed domains: repartition on (ds, hash(url) % buckets)
    so one hot domain spreads over `buckets` tasks (SURVEY.md §4; the
    reference has no parallelism at all, ispaq/ispaq.py:443-705)."""
    return pages.repartition(
        buckets,
        F.date_format("warc_ts", "yyyy-MM-dd"),
        F.pmod(F.hash("url"), F.lit(buckets)),
    )


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    metric_sets: tuple[str, ...] | str = "default",
    model: dict | None = None,
    lid_model: dict | None = None,
    scrub_impl: str = "sql",
    salt_buckets: int | None = None,
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) -> DOC_METRICS-shaped DataFrame."""
    ctx = PipelineContext(
        spark=spark, model=model, lid_model=lid_model, scrub_impl=scrub_impl
    )

    df = pages.withColumn("ds", F.date_format("warc_ts", "yyyy-MM-dd"))
    if salt_buckets:
        df = salt_repartition(df, salt_buckets)

    sets = resolve(metric_sets)
    for ms in sets:
        df = ms.apply(df, ctx)

    produced = {c for ms in sets for c in ms.columns}
    # Quarantine: extraction failure carries qualityFlag=-9 and flows to the
    # sink (ispaq/simple_metrics.py:128-140 — never fail the job for one row).
    if "extracted_text" in produced:
        df = df.withColumn(
            "quality_flag",
            F.when(F.col("extracted_text").isNull(), F.lit(-9)).otherwise(
                F.lit(0)
            ),
        )
    else:
        df = df.withColumn("quality_flag", F.lit(0))

    out_cols = ["url", "ds"] + [
        f.name
        for f in DOC_METRICS.fields
        if f.name in produced and f.name not in ("url", "ds")
    ]
    out_cols.append("quality_flag")
    return df.select(*[F.col(c).cast(dict_field_type(c)) for c in out_cols])


_TYPES = {f.name: f.dataType.simpleString() for f in DOC_METRICS.fields}


def dict_field_type(name: str) -> str:
    return _TYPES[name]


def rollup_lineage(metrics: DataFrame) -> DataFrame:
    """Per-partition lineage counts (FIXTURES.md §3; graft of the reference's
    per-day PSD/PDF aggregate tables, ispaq/utils.py:119-147). Map-side
    partial aggregation; one small shuffle."""
    return (
        metrics.groupBy(F.col("ds").alias("partition_id"))
        .agg(
            F.count(F.lit(1)).alias("docs_in"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("docs_kept"),
            F.sum(
                F.when(~F.col("keep") & (F.col("quality_flag") == 0), 1)
                .otherwise(0)
            ).alias("docs_dropped"),
            F.sum(F.when(F.col("quality_flag") == -9, 1).otherwise(0)).alias(
                "docs_error"
            ),
        )
    )


HIST_METRICS = (
    ("stopword_ratio", 0.01),
    ("symbol_word_ratio", 0.01),
    ("dup_5gram_frac", 0.01),
    ("mean_word_len", 0.5),
    ("perplexity", 100.0),
)


def rollup_histograms(metrics: DataFrame) -> DataFrame:
    """2-D histogram rollup per metric: groupBy(metric, bin).count — the PDF
    aggregation pattern (ispaq/PDF_aggregator.py:73-108: value_counts of
    (freq, round(power)))."""
    stacks = []
    for name, width in HIST_METRICS:
        if name in metrics.columns:
            stacks.append(
                metrics.select(
                    F.col("ds").alias("partition_id"),
                    F.lit(name).alias("metricName"),
                    (F.floor(F.col(name) / width) * width).alias("hist_bin"),
                )
            )
    if not stacks:
        raise ValueError("no histogram metrics present")
    unioned = stacks[0]
    for s in stacks[1:]:
        unioned = unioned.unionByName(s)
    return (
        unioned.where(F.col("hist_bin").isNotNull())
        .groupBy("partition_id", "metricName", "hist_bin")
        .agg(F.count(F.lit(1)).alias("hits"))
    )


def metrics_eav(metrics: DataFrame) -> DataFrame:
    """Wide -> long EAV view (ispaq sink shape, metricList2DF
    Class-Metric.R:487-573) via the built-in unpivot."""
    value_cols = [
        c
        for c in (
            "word_count",
            "mean_word_len",
            "max_word_len",
            "stopword_ratio",
            "lang_conf",
            "symbol_word_ratio",
            "dup_5gram_frac",
            "perplexity",
            "num_pii",
            "num_tox",
        )
        if c in metrics.columns
    ]
    wide = metrics.select(
        F.col("url").alias("target"),
        F.to_timestamp("ds").alias("start"),
        (F.to_timestamp("ds") + F.expr("INTERVAL 1 DAY")).alias("end"),
        F.col("quality_flag").alias("qualityFlag"),
        *[F.col(c).cast("double") for c in value_cols],
    )
    return wide.unpivot(
        ["target", "start", "end", "qualityFlag"],
        value_cols,
        "metricName",
        "value",
    ).select("target", "start", "end", "metricName", "value", "qualityFlag")
