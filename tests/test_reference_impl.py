"""Unit tests for the pure-Python reference labeler — hand-computed
expectations on tiny deterministic inputs (the SURVEY.md §5 plan: gaps
arithmetic-style hand checks)."""

from __future__ import annotations

import math

from ispaq_spark.reference_impl import (
    compute_metrics,
    count_pii,
    extract_text,
    perplexity,
    scrub_text,
    train_lm,
)


def test_extract_strips_boilerplate():
    html = (
        b"<html><head><title>T</title><style>b{}</style></head>"
        b"<body><nav>no</nav><p>hello world</p>"
        b"<script>var x=1;</script><footer>no</footer></body></html>"
    )
    assert extract_text(html) == "hello world"


def test_extract_malformed_and_entities():
    # unclosed tags + entity
    assert extract_text(b"<body><p>a &amp; b<p>c") == "a & b c"


def test_extract_quarantine():
    assert extract_text(None) is None
    assert extract_text(b"\xff\xfe broken") is None
    assert extract_text(b"<p></p>") is None  # empty after strip


def test_scrub_chain_order_and_bytes():
    s = "mail user1@example2.com ssn 123-45-6789 ip 10.0.0.1 frak ok"
    assert (
        scrub_text(s)
        == "mail <EMAIL> ssn <SSN> ip <IP> <TOX> ok"
    )
    assert count_pii(s) == 3


def test_scrub_phone_and_boundaries():
    assert scrub_text("call (415) 555-0123 now") == "call <PHONE> now"
    # digits glued on -> no match (lookarounds)
    assert scrub_text("x9123-45-67890") == "x9123-45-67890"


def test_metrics_hand_computed():
    model = train_lm(["a b c a b c"])
    m = compute_metrics("the cat and the dog sat", model)
    assert m.word_count == 6
    # text len 23, 5 separators -> 18 chars / 6 words = 3.0
    assert m.mean_word_len == 3.0
    assert m.max_word_len == 3
    # en stopwords: the, and, the -> 3/6
    assert m.pred_lang == "en"
    assert m.stopword_ratio == 0.5
    assert m.dup_5gram_frac == 0.0
    assert m.symbol_word_ratio == 0.0


def test_dup_5gram_repetition():
    model = train_lm(["x"])
    text = " ".join(["a b c d e"] * 10)  # 50 tokens, all 5-grams from 5 shapes
    m = compute_metrics(text, model)
    assert m.word_count == 50
    # 46 grams, 5 distinct
    assert abs(m.dup_5gram_frac - (1 - 5 / 46)) < 1e-12


def test_perplexity_seen_vs_unseen():
    model = train_lm(["a b c a b c a b c"])
    assert perplexity("a b c", model) < perplexity("zz qq ww", model)
    # fully unseen = floor
    assert math.isclose(perplexity("zz qq ww", model), math.exp(12.0))
