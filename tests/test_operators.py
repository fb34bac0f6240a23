"""Dedup + similarity operator tests on deterministic corpora with known
near-duplicates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ispaq_spark.operators.dedup import (
    exact_dedup,
    jaccard_verify,
    lsh_candidate_pairs,
    minhash_dedup,
    minhash_signatures,
    simhash,
)
from ispaq_spark.operators.similarity import (
    ann_lsh_topk,
    cosine_topk,
    make_planes,
)


@pytest.fixture(scope="module")
def corpus(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base + " extra tail words here"),  # near dup of 0
        (3, "completely different text about spark and parquet files"),
        (4, "another unrelated document mentioning engines and queries"),
        (5, base.replace("quick", "rapid")),  # near dup of 0
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup(corpus):
    out = exact_dedup(corpus, "text")
    assert out.count() == 5  # 0/1 collapse
    kept = {r["doc_id"] for r in out.collect()}
    assert 0 in kept and 1 not in kept  # deterministic winner = min id


def test_minhash_lsh_finds_near_dups(corpus):
    sigs = minhash_signatures(corpus, "doc_id", "text")
    pairs = lsh_candidate_pairs(sigs, "doc_id")
    cand = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 1) in cand  # exact dup always a candidate
    confirmed = jaccard_verify(corpus, pairs, "doc_id", "text", 0.8)
    conf = {(r["id_a"], r["id_b"]) for r in confirmed.collect()}
    assert (0, 1) in conf
    # unrelated docs never confirmed
    assert not any(3 in p or 4 in p for p in conf)


def test_minhash_dedup_end_to_end(corpus):
    out = minhash_dedup(corpus, "doc_id", "text", threshold=0.8)
    ids = {r["doc_id"] for r in out.collect()}
    assert 0 in ids and 1 not in ids
    assert 3 in ids and 4 in ids


def test_simhash_near_dups_close(corpus):
    sh = {r["doc_id"]: r["simhash"] for r in simhash(corpus).collect()}
    def hamming(a, b):
        return bin(a ^ b).count("1")
    assert hamming(sh[0], sh[1]) == 0
    assert hamming(sh[0], sh[2]) <= hamming(sh[0], sh[3])


@pytest.fixture(scope="module")
def emb(spark):
    import math

    rows = []
    for i in range(50):
        angle = i * math.pi / 100
        v = [math.cos(angle), math.sin(angle)] + [0.0] * 6
        rows.append((i, v))
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_cosine_topk_exact(emb):
    q = [1.0, 0.0] + [0.0] * 6
    top = cosine_topk(emb, q, k=5)
    ids = [r["vec_id"] for r in top.collect()]
    assert ids == [0, 1, 2, 3, 4]  # closest angles first


def test_ann_lsh_subset_of_bruteforce(emb):
    q = [1.0, 0.0] + [0.0] * 6
    planes = make_planes(4, 8)
    approx = ann_lsh_topk(emb, q, k=5, planes=planes)
    brute = cosine_topk(emb, q, k=50)
    approx_ids = {r["vec_id"] for r in approx.collect()}
    brute_order = [r["vec_id"] for r in brute.collect()]
    # every ANN hit is a real vector, scored identically to brute force
    assert approx_ids <= set(brute_order)
    assert len(approx_ids) > 0
