"""Distributed logistic regression: parity vs the numpy twin, broadcast
scoring, and separable-data accuracy."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from ispaq_spark.operators.logreg import (
    score_udf,
    train_logreg,
    train_logreg_local,
)


def _data(n=400, d=4, seed=7):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d))
    true_w = np.array([2.0, -1.5, 0.5, 0.0])
    y = (x @ true_w + 0.3 * rng.normal(size=n) > 0).astype(np.float64)
    return x, y


def _df(spark, x, y, partitions=8):
    rows = [(x[i].tolist(), float(y[i])) for i in range(len(x))]
    return spark.createDataFrame(
        rows, "features array<double>, label double"
    ).repartition(partitions)


def test_matches_numpy_twin(spark):
    x, y = _data()
    w_ref = train_logreg_local(x, y, num_iters=40, lr=0.5)
    w = train_logreg(_df(spark, x, y), num_iters=40, lr=0.5)
    # only float summation order across partitions separates the two
    assert np.allclose(w, w_ref, atol=1e-6)


def test_accuracy_on_separable_data(spark):
    x, y = _data()
    df = _df(spark, x, y)
    w = train_logreg(df, num_iters=60, lr=0.5)
    scored = df.withColumn("p", score_udf(spark, w)(F.col("features")))
    acc = (
        scored.select(
            ((F.col("p") > 0.5).cast("int") == F.col("label").cast("int"))
            .cast("int")
            .alias("ok")
        )
        .agg(F.avg("ok"))
        .first()[0]
    )
    assert acc >= 0.9


def test_l2_shrinks_weights(spark):
    x, y = _data()
    w0 = train_logreg(_df(spark, x, y), num_iters=30, lr=0.5, l2=0.0)
    w1 = train_logreg(_df(spark, x, y), num_iters=30, lr=0.5, l2=0.5)
    assert np.linalg.norm(w1) < np.linalg.norm(w0)
