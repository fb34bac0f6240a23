"""Round-2 operators: as-of join, C4-style span dedup, near-dup connected
components, skew-salted aggregation, int8-quantized cosine — edge cases the
sf fixtures don't exercise (equal timestamps, multi-hop chains, fully
duplicated documents)."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from ispaq_spark.driver_queries import (
    q_asof_join,
    q_chunk_dedup,
    q_int8_topk,
    q_neardup_components,
    q_salted_skew_agg,
)


def _write(df, sf_dir: str, name: str) -> None:
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/{name}.parquet")


TS = dt.datetime(2024, 1, 1)


def _t(sec: int) -> dt.datetime:
    return TS + dt.timedelta(seconds=sec)


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ev"))
    rows = [
        # user 1: click@10 (v=10), error@20 -> matches 10; error@5 -> no click
        (0, _t(5), 1, "error", 1.0, None),
        (1, _t(10), 1, "click", 10.0, None),
        (2, _t(20), 1, "error", 2.0, None),
        # user 2: click and error at the SAME ts -> inclusive match
        (3, _t(30), 2, "click", 30.0, None),
        (4, _t(30), 2, "error", 3.0, None),
        # user 3: later click must not leak backwards; 'view' rows ignored
        (5, _t(40), 3, "view", 99.0, None),
        (6, _t(50), 3, "error", 4.0, None),
        (7, _t(60), 3, "click", 60.0, None),
    ]
    _write(
        spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        ),
        d,
        "events",
    )
    return d


def test_asof_inclusive_and_isolated(spark, events_dir):
    out = {
        r["event_id"]: r
        for r in q_asof_join(spark, events_dir).collect()
    }
    assert set(out) == {0, 2, 4, 6}
    assert out[0]["last_click_value"] is None  # error before any click
    assert out[2]["last_click_value"] == 10.0
    assert out[4]["last_click_value"] == 30.0  # equal-ts click counts (>=)
    assert out[6]["last_click_value"] is None  # later click doesn't leak back


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("docs"))
    span = "a b c d e f g h"  # exactly one 8-word chunk
    tailed = span + " tail one two three"
    rows = [
        (0, span, "en", "s0", len(span)),
        (1, tailed, "en", "s0", len(tailed)),  # first chunk dups doc 0's
        (2, span, "en", "s0", len(span)),  # fully duplicated doc
        (3, "unique words only in here now", "en", "s0", 29),
    ]
    _write(
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, "
            "source string, n_chars long"
        ),
        d,
        "docs_chunk",
    )
    # chunk_dedup reads `documents`
    spark.read.parquet(f"{d}/docs_chunk.parquet").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{d}/documents.parquet")
    return d


def test_chunk_dedup_first_occurrence_wins(spark, docs_dir):
    out = {r["doc_id"]: r for r in q_chunk_dedup(spark, docs_dir).collect()}
    assert out[0]["clean_text"] == "a b c d e f g h"
    assert out[0]["removed_chunks"] == 0
    # doc 1 loses its first chunk (doc 0 owns it) but keeps its tail chunk
    assert out[1]["clean_text"] == "tail one two three"
    assert out[1]["removed_chunks"] == 1
    # doc 2 is entirely duplicate spans -> empty text, still emits a row
    assert out[2]["clean_text"] == ""
    assert out[2]["removed_chunks"] == 1
    assert out[3]["removed_chunks"] == 0


@pytest.fixture(scope="module")
def chain_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("chain"))
    w = [f"w{i}" for i in range(10)]
    a = " ".join(w)  # {w0..w9}
    b = " ".join(w[:9] + ["x"])  # J(a,b)=9/11=.818
    c = " ".join(w[:8] + ["x", "y"])  # J(b,c)=9/11=.818, J(a,c)=8/12=.667
    iso1 = "p q r s t u v"  # isolated pair, own component
    iso2 = "p q r s t u v"
    lone = "totally separate vocabulary entirely"
    rows = [
        (10, a, "en", "s0", len(a)),
        (11, b, "en", "s0", len(b)),
        (12, c, "en", "s0", len(c)),
        (20, iso1, "en", "s0", len(iso1)),
        (21, iso2, "en", "s0", len(iso2)),
        (30, lone, "en", "s0", len(lone)),
    ]
    _write(
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, "
            "source string, n_chars long"
        ),
        d,
        "documents",
    )
    return d


def test_components_transitive_chain(spark, chain_dir):
    out = {r["doc_id"]: r["comp"] for r in
           q_neardup_components(spark, chain_dir).collect()}
    # A~B and B~C but NOT A~C: transitivity must still cluster all three
    assert out[10] == out[11] == out[12] == 10
    assert out[20] == out[21] == 20
    assert 30 not in out  # no edges -> not a component member


def test_salted_agg_matches_plain(spark, chain_dir):
    salted = {r["source"]: r for r in
              q_salted_skew_agg(spark, chain_dir).collect()}
    plain = {
        r["source"]: r
        for r in spark.read.parquet(f"{chain_dir}/documents.parquet")
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_chars").alias("total_chars"))
        .collect()
    }
    assert set(salted) == set(plain)
    for s in plain:
        assert salted[s]["n_docs"] == plain[s]["n_docs"]
        assert salted[s]["total_chars"] == plain[s]["total_chars"]


@pytest.fixture(scope="module")
def emb_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("emb"))
    rows = [
        (0, [1.0, 0.0, 0.0, 0.5], 0),  # query
        (1, [0.9, 0.1, 0.0, 0.45], 0),  # near-parallel -> top-1
        (2, [0.0, 1.0, 0.0, 0.0], 1),  # orthogonal-ish
        (3, [-1.0, 0.0, 0.0, -0.5], 1),  # antipodal
        (4, [0.8, 0.0, 0.3, 0.4], 0),
    ]
    _write(
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ),
        d,
        "embeddings",
    )
    return d


def test_int8_cosine_close_to_exact(spark, emb_dir):
    out = q_int8_topk(spark, emb_dir).collect()
    assert [r["vec_id"] for r in out][:2] == [1, 4]  # ranking preserved
    # quantized cosine within int8 tolerance of the exact value
    import numpy as np

    vecs = {1: [0.9, 0.1, 0.0, 0.45], 4: [0.8, 0.0, 0.3, 0.4]}
    q = np.array([1.0, 0.0, 0.0, 0.5])
    for r in out:
        if r["vec_id"] in vecs:
            v = np.array(vecs[r["vec_id"]])
            exact = float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
            assert math.isclose(r["cos"], exact, abs_tol=0.02)
