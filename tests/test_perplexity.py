"""Distributed LM trainer must produce the identical model table as the
pure-Python trainer (same FNV-hash keys, same counts), and scoring must be
deterministic across both."""

from __future__ import annotations

from ispaq_spark.functions.perplexity import train_lm_distributed
from ispaq_spark.reference_impl import perplexity, train_lm
from ispaq_spark.synthesize import lm_corpus


def test_distributed_trainer_matches_python(spark):
    corpus = list(lm_corpus(200))
    py_model = train_lm(corpus)
    cdf = spark.createDataFrame([(c,) for c in corpus], ["text"])
    sp_model = train_lm_distributed(cdf)
    assert sp_model == py_model


def test_score_with_distributed_model(spark):
    corpus = list(lm_corpus(200))
    cdf = spark.createDataFrame([(c,) for c in corpus], ["text"])
    sp_model = train_lm_distributed(cdf)
    # seen text scores far better than gibberish
    assert perplexity(corpus[0], sp_model) < 1000
    assert perplexity("zzqq wwrr ttyy", sp_model) > 100_000
