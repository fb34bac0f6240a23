"""Distributed logistic-regression trainer — the model-based quality
classifier of a curation pipeline (a fastText/DCLM-style keep/drop scorer
trained ON the cluster, then broadcast back for map-only scoring, exactly
like `functions/langid.py`'s NB weights).

Scale shape per iteration: the current weight vector rides ONE broadcast
(d+1 doubles); each Arrow batch reduces to a (d+1)-float partial gradient
inside mapInPandas (numpy matmul — no per-row Python), so the per-round
collect is O(partitions × d), never corpus-sized. Rounds are driver
control flow; each round's broadcast is unpersisted once its partials are
in (the kmeans broadcast-leak lesson, operators/kmeans.py). The input
DataFrame is re-evaluated every round — cache()/checkpoint the feature
frame before calling when the features are expensive to recompute.

Determinism: full-batch gradient descent; the only run-to-run variance is
float summation order across partitions (~1e-12 per round), bounded by the
parity test's tolerance against the single-machine numpy twin.

Graft slot: the reference's fitted-artifact workflow (evalresp response
models fitted then applied, ispaq/simple_metrics.py usage) — here the
artifact is a trained classifier weight vector.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf


def _sigmoid(z: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-z))


def train_logreg(
    df: DataFrame,
    features_col: str = "features",
    label_col: str = "label",
    num_iters: int = 50,
    lr: float = 0.5,
    l2: float = 0.0,
) -> np.ndarray:
    """Full-batch gradient descent. Returns weights of shape (d+1,) with
    the bias last."""
    first = df.select(features_col).head(1)
    if not first:
        raise ValueError("empty training frame")
    d = len(first[0][0])
    w = np.zeros(d + 1)
    sc = df.sparkSession.sparkContext

    for _ in range(num_iters):
        bc = sc.broadcast(w)

        def partials(batches, fc=features_col, lc=label_col, dim=d):
            wk = bc.value
            g = np.zeros(dim + 1)
            n = 0
            for pdf in batches:
                x = np.asarray(pdf[fc].tolist(), dtype=np.float64)
                x1 = np.hstack([x, np.ones((len(x), 1))])
                y = pdf[lc].to_numpy(dtype=np.float64)
                g += x1.T @ (_sigmoid(x1 @ wk) - y)
                n += len(x)
            yield pd.DataFrame({"g": [g.tolist()], "n": [n]})

        agg = df.mapInPandas(partials, "g array<double>, n bigint").toPandas()
        n_total = int(agg["n"].sum())
        grad = np.sum(np.array(agg["g"].tolist()), axis=0) / max(n_total, 1)
        bc.unpersist()
        w = w - lr * (grad + l2 * w)
    return w


def train_logreg_local(
    x: np.ndarray,
    y: np.ndarray,
    num_iters: int = 50,
    lr: float = 0.5,
    l2: float = 0.0,
) -> np.ndarray:
    """Single-machine numpy twin (parity oracle for train_logreg)."""
    x1 = np.hstack([x, np.ones((len(x), 1))])
    w = np.zeros(x1.shape[1])
    for _ in range(num_iters):
        grad = x1.T @ (_sigmoid(x1 @ w) - y) / len(x1)
        w = w - lr * (grad + l2 * w)
    return w


def score_udf(spark, weights: np.ndarray):
    """Broadcast-weights Arrow scorer: features array<double> -> keep
    probability. Map-only; the serving path of the trained classifier."""
    bc = spark.sparkContext.broadcast(np.asarray(weights, dtype=np.float64))

    @pandas_udf("double")
    def score(features: pd.Series) -> pd.Series:
        wk = bc.value
        x = np.asarray(features.tolist(), dtype=np.float64)
        x1 = np.hstack([x, np.ones((len(x), 1))])
        return pd.Series(_sigmoid(x1 @ wk))

    return score
