"""Gopher/C4-style heuristic metrics + stopword langid as pure Catalyst
column expressions — zero Python on this path.

Graft slot: ispaq's 'simple metrics' business logic (basicStats / gaps
dispatched per group, ispaq/simple_metrics.py:146-239; metric math
IRISMustangMetrics/R/basicStatsMetric.R:25-59). Where ispaq crosses into R
per target-day, we stay inside WholeStageCodegen for every document.

Formula contract (must match ispaq_spark.reference_impl exactly — integer
arithmetic + single IEEE-754 double divisions):
  word_count        = size(split(text, ' '))
  mean_word_len     = (length(text) - word_count + 1) / word_count
  stopword_ratio    = max_L |{t in tokens : t in STOPWORDS[L]}| / word_count
  symbol_word_ratio = regexp_count(text, SYMBOL) / word_count
  dup_5gram_frac    = 1 - distinct_5grams/total_5grams   (0.0 if < 5 words)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..contract import (
    LANGS,
    SCRUB_RULES,
    PII_RULE_NAMES,
    STOPWORDS,
    SYMBOL_PATTERN,
    THRESHOLDS,
    UNKNOWN_LANG,
)

TOKENS = "_tokens"  # internal working column, dropped by the pipeline


def tokens_col(text: Column) -> Column:
    return F.split(text, " ")


def stopword_hits(tokens: Column, lang: str) -> Column:
    """Count (with duplicates) of tokens in the language's stopword set."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens, lambda t: F.array_contains(sw, t)))


def fivegram_frac(tokens: Column, n: Column) -> Column:
    grams = F.transform(
        F.sequence(F.lit(1), n - F.lit(4)),
        lambda i: F.array_join(F.slice(tokens, i, 5), " "),
    )
    return F.when(
        n >= 5,
        F.lit(1.0) - F.size(F.array_distinct(grams)) / F.size(grams),
    ).otherwise(F.lit(0.0))


def pii_count(text: Column) -> Column:
    out = F.lit(0)
    for name, pat, _repl in SCRUB_RULES:
        if name in PII_RULE_NAMES:
            out = out + F.regexp_count(text, F.lit(pat))
    return out.cast("long")


def tox_count(text: Column) -> Column:
    (pat,) = [p for name, p, _r in SCRUB_RULES if name == "tox"]
    return F.regexp_count(text, F.lit(pat)).cast("long")


def with_heuristics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append all heuristic metric columns + stopword langid to ``df``.

    Null-safe: rows with NULL text get NULL metrics (quarantine rows flow
    through, the qualityFlag=-9 pattern of ispaq/simple_metrics.py:128-140).
    """
    text = F.col(text_col)
    df = df.withColumn(TOKENS, F.when(text.isNotNull(), tokens_col(text)))
    toks = F.col(TOKENS)
    n = F.size(toks)

    df = df.withColumn("word_count", F.when(text.isNotNull(), n.cast("long")))
    df = df.withColumn(
        "mean_word_len", (F.length(text) - n + F.lit(1)) / n
    ).withColumn(
        "max_word_len",
        F.array_max(F.transform(toks, F.length)).cast("long"),
    )

    # langid: per-language stopword hit counts -> argmax, ties broken by
    # language code ascending (LANGS is sorted), 'und' on zero hits.
    hit_cols = {lang: f"_sw_{lang}" for lang in LANGS}
    for lang, c in hit_cols.items():
        df = df.withColumn(c, stopword_hits(toks, lang))
    best = F.greatest(*[F.col(c) for c in hit_cols.values()])
    pred = F.lit(UNKNOWN_LANG)
    cascade = F.when(best <= 0, F.lit(UNKNOWN_LANG))
    for lang in LANGS:
        cascade = cascade.when(F.col(hit_cols[lang]) == best, F.lit(lang))
    pred = cascade.otherwise(F.lit(UNKNOWN_LANG))
    df = (
        df.withColumn("pred_lang", F.when(text.isNotNull(), pred))
        .withColumn("stopword_ratio", best / n)
        .withColumn(
            "lang_conf",
            F.when(
                F.col("pred_lang") == UNKNOWN_LANG, F.lit(0.0)
            ).otherwise(best / n),
        )
        .drop(*hit_cols.values())
    )

    df = df.withColumn(
        "symbol_word_ratio",
        F.regexp_count(text, F.lit(SYMBOL_PATTERN)) / n,
    )
    df = df.withColumn(
        "dup_5gram_frac", F.when(text.isNotNull(), fivegram_frac(toks, n))
    )
    df = df.withColumn("num_pii", F.when(text.isNotNull(), pii_count(text)))
    df = df.withColumn("num_tox", F.when(text.isNotNull(), tox_count(text)))
    return df.drop(TOKENS)


def keep_expr() -> Column:
    """The keep/drop decision over metric columns — graft analog of ispaq's
    boolean metrics (sampleRateChannelMetric.R:42-46, PSDMetric.R:214).
    NULL-metric (quarantined) rows yield false."""
    t = THRESHOLDS
    cond = (
        (F.col("word_count") >= t["min_word_count"])
        & (F.col("word_count") <= t["max_word_count"])
        & (F.col("mean_word_len") >= t["min_mean_word_len"])
        & (F.col("mean_word_len") <= t["max_mean_word_len"])
        & (F.col("max_word_len") <= t["max_word_len"])
        & (F.col("stopword_ratio") >= t["min_stopword_ratio"])
        & (F.col("symbol_word_ratio") <= t["max_symbol_word_ratio"])
        & (F.col("dup_5gram_frac") <= t["max_dup_5gram_frac"])
        & (F.col("lang_conf") >= t["min_lang_conf"])
        & (F.col("perplexity") <= t["max_perplexity"])
    )
    return F.coalesce(cond, F.lit(False))
