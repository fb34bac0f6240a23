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


def _langid_cols(texts: pd.Series, lid: dict) -> tuple[list, list]:
    from ..reference_impl import score_langid as _lid_score

    preds, confs = [], []
    for t in texts:
        if t is None:
            preds.append(None)
            confs.append(None)
        else:
            p, c = _lid_score(t, lid)
            preds.append(p)
            confs.append(c)
    return preds, confs


def fused_extract_ppl_udf(spark, model: dict[int, float], lid_model: dict):
    """One-crossing fused stage:
    html -> (extracted_text, perplexity, pred_lang, lang_conf).

    The modular path round-trips the extracted text JVM->Python->JVM->Python
    once per Arrow stage; fusing extraction + both model scorers cuts the
    Arrow traffic and the Python batch count to one crossing. Calls the
    same reference functions, so parity is unchanged.
    """
    from ..reference_impl import perplexity as _ppl

    bcast = spark.sparkContext.broadcast(model)
    bcast_lid = spark.sparkContext.broadcast(lid_model)

    @F.pandas_udf(
        "extracted_text string, perplexity double, "
        "pred_lang string, lang_conf double"
    )
    def fused(html: pd.Series) -> pd.DataFrame:
        m = bcast.value
        lid = bcast_lid.value
        texts = html.map(extract_text)
        ppl = texts.map(lambda t: _ppl(t, m) if t is not None else None)
        preds, confs = _langid_cols(texts, lid)
        return pd.DataFrame(
            {
                "extracted_text": texts,
                "perplexity": ppl,
                "pred_lang": preds,
                "lang_conf": confs,
            }
        )

    return fused


def fused_extract_ppl_scrub_udf(
    spark, model: dict[int, float], lid_model: dict
):
    """html -> (extracted_text, perplexity, pred_lang, lang_conf,
    scrubbed_text), ONE crossing.

    Scrubbing here instead of the JVM regexp_replace chain removes five
    java.util.regex passes (Matcher + string copy per rule per row) from
    the shared-heap hot path — measured as the 32-thread scaling
    bottleneck (BENCH/BASELINE.md 600k analysis): python workers are
    separate processes with isolated heaps, so the regex allocation churn
    stops serializing on the driver JVM's young-gen GC. Same
    reference_impl.scrub_text chain, so bytes are identical."""
    from ..reference_impl import perplexity as _ppl, scrub_text as _scrub

    bcast = spark.sparkContext.broadcast(model)
    bcast_lid = spark.sparkContext.broadcast(lid_model)

    @F.pandas_udf(
        "extracted_text string, perplexity double, "
        "pred_lang string, lang_conf double, scrubbed_text string"
    )
    def fused(html: pd.Series) -> pd.DataFrame:
        m = bcast.value
        lid = bcast_lid.value
        texts = html.map(extract_text)
        ppl = texts.map(lambda t: _ppl(t, m) if t is not None else None)
        preds, confs = _langid_cols(texts, lid)
        scrubbed = texts.map(lambda t: _scrub(t) if t is not None else None)
        return pd.DataFrame(
            {
                "extracted_text": texts,
                "perplexity": ppl,
                "pred_lang": preds,
                "lang_conf": confs,
                "scrubbed_text": scrubbed,
            }
        )

    return fused
