"""Distributed k-means vs its single-node numpy twin, plus the properties
that make it usable as the IVF-centroid trainer (determinism, inertia
descent, empty-cluster survival)."""

from __future__ import annotations

import numpy as np
import pytest

from ispaq_spark.operators.kmeans import kmeans, kmeans_reference


@pytest.fixture(scope="module")
def blobs():
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(4, 16)) * 5
    vecs = np.vstack(
        [c + rng.normal(size=(30, 16)) for c in centers]
    ).astype(np.float64)
    return vecs


@pytest.fixture(scope="module")
def emb_df(spark, blobs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(blobs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_matches_numpy_reference(spark, emb_df, blobs):
    assigned, centroids = kmeans(emb_df, k=4, max_iter=8)
    ref_labels, ref_centroids = kmeans_reference(blobs, k=4, max_iter=8)
    got = {r["id"]: r["cluster"] for r in assigned.collect()}
    assert [got[i] for i in range(len(blobs))] == ref_labels.tolist()
    assert np.allclose(centroids, ref_centroids, atol=1e-9)


def test_deterministic_across_runs(spark, emb_df):
    a1, c1 = kmeans(emb_df, k=4, max_iter=4)
    a2, c2 = kmeans(emb_df, k=4, max_iter=4)
    assert np.allclose(c1, c2)
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))


def test_inertia_non_increasing(spark, emb_df, blobs):
    prev = None
    for iters in (1, 2, 4, 8):
        _, centroids = kmeans(emb_df, k=4, max_iter=iters)
        d = -2.0 * (blobs @ centroids.T) + (centroids**2).sum(axis=1)[None, :]
        inertia = float((d.min(axis=1) + (blobs**2).sum(axis=1)).sum())
        if prev is not None:
            assert inertia <= prev + 1e-6
        prev = inertia


def test_empty_cluster_keeps_centroid(spark):
    # two tight far-apart groups, k=3: one centroid never wins a point and
    # must survive (not NaN) so IVF probing stays well-defined
    rows = [(i, [0.0, 0.0]) for i in range(3)] + [
        (10 + i, [100.0, 100.0]) for i in range(3)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assigned, centroids = kmeans(df, k=3, max_iter=5)
    assert not np.isnan(centroids).any()
    assert len({r["cluster"] for r in assigned.collect()}) == 2
