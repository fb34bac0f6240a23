"""Semantic checks for A-ES weighted sampling beyond the value oracle:
the priority form u^(1/w) must actually BIAS selection toward heavy
documents, and the sample must be a pure function of the input."""

from __future__ import annotations

import pandas as pd


def _run(spark, sf_dir):
    from ispaq_spark import driver_queries as dq

    return dq.queries()["weighted_sample"](spark, sf_dir).collect()


def test_weighted_sample_biases_toward_heavy_docs(spark, tmp_path):
    # two weight classes, 200 docs each: w=40 vs w=4000. A-ES inclusion
    # probability is ~proportional to weight, so the 50-doc sample should
    # be dominated by the heavy class (expected ~99%; assert a loose 80%).
    rows = []
    for i in range(400):
        heavy = i % 2 == 0
        rows.append(
            {
                "doc_id": i,
                "text": "x " * 5,
                "lang": "en",
                "source": "heavy" if heavy else "light",
                "n_chars": 4000 if heavy else 40,
            }
        )
    sf_dir = str(tmp_path)
    spark.createDataFrame(pd.DataFrame(rows)).write.mode("overwrite").parquet(
        f"{sf_dir}/documents.parquet"
    )
    got = _run(spark, sf_dir)
    assert len(got) == 50
    n_heavy = sum(1 for r in got if r["source"] == "heavy")
    assert n_heavy >= 40, n_heavy
    # deterministic: same input -> identical sample, same order
    again = _run(spark, sf_dir)
    assert [r["doc_id"] for r in again] == [r["doc_id"] for r in got]
