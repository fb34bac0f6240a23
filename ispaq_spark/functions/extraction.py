"""HTML -> text extraction stage (Arrow-batched pandas UDF).

Graft slot: mergeTraces gap-fill — the cleaning step that turns raw stored
bytes into the analyzable signal (IRISSeismic/R/Class-Stream.R:583-700,
driven from ispaq/irisseismic.py:292-378). The byte-identical-per-url
contract (BASELINE.json input_hint) is enforced by wrapping the *reference
implementation itself* (ispaq_spark.reference_impl.extract_text) instead of
re-implementing it: one code path, two callers.

This is inherently per-string work no Catalyst builtin expresses, so it is
the sanctioned pandas-UDF slow path — Arrow-batched, never row-at-a-time.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from ..reference_impl import extract_text


@F.pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    # html arrives as a Series of bytes/None (Arrow binary). map() keeps
    # None -> None; extract_text returns None for undecodable bytes.
    return html.map(extract_text)


def extracted_col(html_col: str = "html") -> Column:
    return extract_text_udf(F.col(html_col))


def fused_extract_ppl_udf(spark, model: dict[int, float]):
    """One-crossing fused stage: html -> (extracted_text, perplexity).

    The modular path round-trips the extracted text JVM->Python->JVM->Python;
    fusing halves the Arrow traffic and the Python batch count. Calls the
    same reference functions, so parity is unchanged.
    """
    from ..reference_impl import perplexity as _ppl

    bcast = spark.sparkContext.broadcast(model)

    @F.pandas_udf("extracted_text string, perplexity double")
    def fused(html: pd.Series) -> pd.DataFrame:
        m = bcast.value
        texts = html.map(extract_text)
        ppl = texts.map(lambda t: _ppl(t, m) if t is not None else None)
        return pd.DataFrame(
            {"extracted_text": texts, "perplexity": ppl}
        )

    return fused


def fused_extract_ppl_scrub_udf(spark, model: dict[int, float]):
    """html -> (extracted_text, perplexity, scrubbed_text), ONE crossing.

    Scrubbing here instead of the JVM regexp_replace chain removes five
    java.util.regex passes (Matcher + string copy per rule per row) from
    the shared-heap hot path — measured as the 32-thread scaling
    bottleneck (BENCH/BASELINE.md 600k analysis): python workers are
    separate processes with isolated heaps, so the regex allocation churn
    stops serializing on the driver JVM's young-gen GC. Same
    reference_impl.scrub_text chain, so bytes are identical."""
    from ..reference_impl import perplexity as _ppl, scrub_text as _scrub

    bcast = spark.sparkContext.broadcast(model)

    @F.pandas_udf(
        "extracted_text string, perplexity double, scrubbed_text string"
    )
    def fused(html: pd.Series) -> pd.DataFrame:
        m = bcast.value
        texts = html.map(extract_text)
        ppl = texts.map(lambda t: _ppl(t, m) if t is not None else None)
        scrubbed = texts.map(lambda t: _scrub(t) if t is not None else None)
        return pd.DataFrame(
            {
                "extracted_text": texts,
                "perplexity": ppl,
                "scrubbed_text": scrubbed,
            }
        )

    return fused
