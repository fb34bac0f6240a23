"""Named metric-set registry — the declarative request surface.

Graft of ispaq's metric-alias machinery: preference-file aliases resolve to
concrete metric lists (ispaq/user_request.py:283-302), and the R catalog
``getMetricFunctionMetadata()`` maps business-logic groups -> functions ->
metrics (IRISMustangMetrics/R/ISPAQUtils.R:30-301, inverted to
``function_by_logic`` at user_request.py:470-488). Here each MetricSet
declares the columns it produces, its execution kind (pure Catalyst SQL vs
Arrow UDF), and its dependencies; the pipeline topologically folds the
requested sets, so unrequested metric columns are simply never computed
(the wide-layout version of ispaq's metricName filter,
ispaq/simple_metrics.py:247-256).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame

from pyspark.sql import functions as F


@dataclass(frozen=True)
class MetricSet:
    name: str
    kind: str  # 'sql' (WholeStageCodegen) | 'arrow' (pandas UDF batches)
    columns: tuple[str, ...]
    requires: tuple[str, ...] = ()
    # apply(df, ctx) -> df with `columns` appended. ctx: PipelineContext.
    apply: Callable[[DataFrame, "PipelineContext"], DataFrame] = field(
        default=None, repr=False
    )


@dataclass
class PipelineContext:
    spark: object
    model: dict | None = None
    scrub_impl: str = "sql"
    text_col: str = "extracted_text"


def _extraction(df: DataFrame, ctx: PipelineContext) -> DataFrame:
    from .functions.extraction import extracted_col

    return df.withColumn("extracted_text", extracted_col("html"))


def _heuristics(df: DataFrame, ctx: PipelineContext) -> DataFrame:
    from .functions.heuristics import with_heuristics

    return with_heuristics(df, ctx.text_col)


def _perplexity(df: DataFrame, ctx: PipelineContext) -> DataFrame:
    from .functions.perplexity import perplexity_udf

    if ctx.model is None:
        from .synthesize import default_model

        ctx.model = default_model()
    udf = perplexity_udf(ctx.spark, ctx.model)
    return df.withColumn("perplexity", udf(F.col(ctx.text_col)))


def _scrub(df: DataFrame, ctx: PipelineContext) -> DataFrame:
    from .functions.scrub import scrubbed_col

    return df.withColumn(
        "scrubbed_text", scrubbed_col(ctx.text_col, ctx.scrub_impl)
    )


def _decision(df: DataFrame, ctx: PipelineContext) -> DataFrame:
    from .functions.heuristics import keep_expr

    return df.withColumn("keep", keep_expr())


REGISTRY: dict[str, MetricSet] = {
    m.name: m
    for m in (
        MetricSet(
            "extraction", "arrow", ("extracted_text",), (), _extraction
        ),
        MetricSet(
            "heuristics",
            "sql",
            (
                "word_count",
                "mean_word_len",
                "max_word_len",
                "pred_lang",
                "stopword_ratio",
                "lang_conf",
                "symbol_word_ratio",
                "dup_5gram_frac",
                "num_pii",
                "num_tox",
            ),
            ("extraction",),
            _heuristics,
        ),
        MetricSet(
            "perplexity", "arrow", ("perplexity",), ("extraction",), _perplexity
        ),
        MetricSet("scrub", "sql", ("scrubbed_text",), ("extraction",), _scrub),
        MetricSet(
            "decision",
            "sql",
            ("keep",),
            ("heuristics", "perplexity"),
            _decision,
        ),
    )
}

# Preference-file-style aliases (ispaq/preference_files/default.txt Metrics
# section analog).
ALIASES: dict[str, tuple[str, ...]] = {
    "default": ("extraction", "heuristics", "perplexity", "scrub", "decision"),
    "heuristicsOnly": ("extraction", "heuristics"),
    "scrubOnly": ("extraction", "scrub"),
}


def resolve(names: tuple[str, ...] | str) -> list[MetricSet]:
    """Alias/name list -> dependency-ordered unique MetricSet list."""
    if isinstance(names, str):
        names = ALIASES.get(names, (names,))
    ordered: list[str] = []

    def visit(n: str) -> None:
        if n in ordered:
            return
        ms = REGISTRY[n]
        for dep in ms.requires:
            visit(dep)
        ordered.append(n)

    for n in names:
        visit(n)
    return [REGISTRY[n] for n in ordered]
