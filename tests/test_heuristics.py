"""SQL heuristic expressions must equal the Python reference metric-for-
metric (exact doubles, not approximate) on the fixture corpus."""

from __future__ import annotations

import pytest

from ispaq_spark.functions.heuristics import with_heuristics
from ispaq_spark.reference_impl import compute_metrics


# pred_lang/lang_conf moved to the langid classifier stage
# (tests/test_langid.py); this file covers the pure-Catalyst heuristics.
METRIC_COLS = (
    "word_count",
    "mean_word_len",
    "max_word_len",
    "stopword_ratio",
    "symbol_word_ratio",
    "dup_5gram_frac",
    "num_pii",
    "num_tox",
)


@pytest.fixture(scope="module")
def joined(spark, fixture_pages, fixture_labels, model):
    texts = [
        (url, lab["text"])
        for url, lab in fixture_labels.items()
        if lab["text"] is not None
    ]
    df = spark.createDataFrame(texts, ["url", "text"])
    got = {r["url"]: r for r in with_heuristics(df, "text").collect()}
    want = {
        url: compute_metrics(text, model) for url, text in texts
    }
    return got, want


def test_exact_metric_parity(joined):
    got, want = joined
    assert len(got) == len(want) > 300
    for url, m in want.items():
        r = got[url]
        for c in METRIC_COLS:
            g, w = r[c], getattr(m, c)
            assert g == w, f"{url} {c}: spark={g!r} python={w!r}"


def test_null_text_rows_null_metrics(spark):
    df = spark.createDataFrame([("u1", None), ("u2", "a b")], ["url", "text"])
    rows = {r["url"]: r for r in with_heuristics(df, "text").collect()}
    assert rows["u1"]["word_count"] is None
    assert rows["u1"]["stopword_ratio"] is None
    assert rows["u2"]["word_count"] == 2
