"""Distributed Lloyd's k-means over an embedding column — the trainer for
`ivf_topk`-style IVF centroids (operators/similarity.py) and cluster-based
corpus curation (topic balancing, diversity sampling).

Scale shape per round: centroids ride ONE broadcast (k x dim floats) into a
vectorized Arrow assignment stage (numpy matmul per batch — no per-row
Python); the update step shuffles (cluster, dim, partial_sum) — k x dim
sized, not corpus-sized — and the new centroids collect k x dim scalars to
the driver. Rounds are driver control flow only; assignment output each
round cuts lineage with localCheckpoint (unpersist cascades — see
operators/components.py).

Determinism: init is the first k vectors in id order, ties in assignment
break toward the lower cluster id, so every run (and every retry of any
task) produces identical clusters — the property resumable pipelines need.

Graft slot: the reference's noise-model fitting against aggregated PSDs
(IRISMustangMetrics/R/PSDMetrics.R via ispaq/PDF_aggregator.py) — an
auxiliary model iteratively fitted from the data, then broadcast to score.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _assign_udf(spark: SparkSession, centroids: np.ndarray):
    """Returns (udf, broadcast handle). The caller owns the broadcast and
    must unpersist() it once the assignment output is materialized — a new
    broadcast per Lloyd round otherwise accumulates blocks on driver and
    executors for the life of the job."""
    bc = spark.sparkContext.broadcast(centroids)

    @pandas_udf("int")
    def assign(vecs: pd.Series) -> pd.Series:
        c = bc.value  # (k, dim)
        m = np.array(vecs.tolist(), dtype=np.float64)  # (n, dim)
        # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; argmin over c
        d = -2.0 * (m @ c.T) + (c * c).sum(axis=1)[None, :]
        return pd.Series(np.argmin(d, axis=1).astype(np.int32))

    return assign, bc


def kmeans(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    max_iter: int = 10,
    tol: float = 1e-6,
) -> tuple[DataFrame, np.ndarray]:
    """Returns (assignments(id, cluster), centroids (k, dim) ndarray)."""
    spark = embeddings.sparkSession
    data = embeddings.select(
        F.col(id_col).alias("id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("v"),
    ).localCheckpoint(eager=True)

    init_rows = data.orderBy("id").limit(k).collect()
    centroids = np.array([r["v"] for r in init_rows], dtype=np.float64)

    assigned = None
    for _ in range(max_iter):
        assign, bc = _assign_udf(spark, centroids)
        assigned = data.withColumn(
            "cluster", assign(F.col("v"))
        ).localCheckpoint(eager=True)
        # checkpoint materialized the assignment; this round's centroid
        # broadcast is dead weight from here on
        bc.unpersist()
        # update: shuffle carries (cluster, dim, partial sum/count) only
        sums = (
            assigned.select("cluster", F.posexplode("v").alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new_centroids = centroids.copy()  # empty cluster keeps its centroid
        acc: dict[int, np.ndarray] = {}
        cnt: dict[int, int] = {}
        for r in sums:
            acc.setdefault(r["cluster"], np.zeros(centroids.shape[1]))[
                r["dim"]
            ] = r["s"]
            cnt[r["cluster"]] = r["n"]
        for c, vec in acc.items():
            new_centroids[c] = vec / cnt[c]
        shift = float(np.abs(new_centroids - centroids).max())
        centroids = new_centroids
        if shift <= tol:
            break
    return assigned.select("id", "cluster"), centroids


def kmeans_reference(
    vectors: np.ndarray, k: int, max_iter: int = 10, tol: float = 1e-6
) -> tuple[np.ndarray, np.ndarray]:
    """Single-node numpy twin of `kmeans` (same init, same tie-break) for
    parity tests."""
    centroids = vectors[:k].astype(np.float64).copy()
    labels = None
    for _ in range(max_iter):
        d = -2.0 * (vectors @ centroids.T) + (centroids * centroids).sum(
            axis=1
        )[None, :]
        labels = np.argmin(d, axis=1)
        new_centroids = centroids.copy()
        for c in range(k):
            members = vectors[labels == c]
            if len(members):
                new_centroids[c] = members.mean(axis=0)
        shift = float(np.abs(new_centroids - centroids).max())
        centroids = new_centroids
        if shift <= tol:
            break
    return labels, centroids
