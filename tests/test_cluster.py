"""Distributed k-means + SemDeDup semantic dedup (functions/cluster.py).

Oracles: blob-label purity, nearest-centroid invariant checked against a
driver-side numpy brute force, pair subset-of-exact vs cosine_pairs_exact.
"""

import numpy as np
import pyarrow as pa
import pytest

from balrog_ray.functions.cluster import (_pair_cost, kmeans_assign,
                                          kmeans_fit, semantic_dedup_pairs)
from balrog_ray.functions.ann import _unit


def _blob_table(n_per=80, d=8, n_blobs=3, seed=7, dup_pairs=0):
    """Well-separated unit-ish blobs; optionally plant exact duplicates."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_blobs, d)) * 6.0
    rows, labels = [], []
    for b in range(n_blobs):
        rows.append(centers[b] + 0.1 * rng.standard_normal((n_per, d)))
        labels.extend([b] * n_per)
    mat = np.vstack(rows)
    for i in range(dup_pairs):          # row 2i+1 := exact copy of row 2i
        mat[2 * i + 1] = mat[2 * i]
    return pa.table({
        "vec_id": pa.array(np.arange(len(mat)), pa.int64()),
        "embedding": pa.array([r.tolist() for r in mat],
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32())}), mat, np.asarray(labels)


@pytest.fixture(scope="module")
def blob_ds(ray_session):
    import ray.data

    tab, mat, labels = _blob_table()
    return ray.data.from_arrow(tab), mat, labels


def test_kmeans_recovers_blobs(blob_ds):
    ds, mat, labels = blob_ds
    cents = kmeans_fit(ds, 3, iters=10, sample_size=64, metric="cosine")
    assert cents.shape == (3, mat.shape[1])
    out = kmeans_assign(ds, cents).select_columns(
        ["vec_id", "cluster_id", "label"]).take_all()
    # purity: every recovered cluster maps to exactly one blob label
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["label"])
    assert len(by_cluster) == 3
    assert all(len(v) == 1 for v in by_cluster.values())


def test_assign_matches_numpy_nearest(blob_ds):
    ds, mat, _ = blob_ds
    cents = kmeans_fit(ds, 3, iters=4, sample_size=64, metric="cosine")
    rows = sorted(kmeans_assign(ds, cents).select_columns(
        ["vec_id", "cluster_id", "score"]).take_all(),
        key=lambda r: r["vec_id"])
    unit = _unit(mat.astype(np.float64))
    want = _pair_cost(unit, _unit(cents), "cosine").argmin(axis=1)
    got = np.array([r["cluster_id"] for r in rows])
    np.testing.assert_array_equal(got, want)
    # score is the cosine to the assigned centroid
    sims = (unit @ _unit(cents).T)[np.arange(len(want)), want]
    np.testing.assert_allclose([r["score"] for r in rows], sims, atol=1e-9)


def test_kmeans_l2_metric_and_determinism(blob_ds):
    ds, mat, _ = blob_ds
    a = kmeans_fit(ds, 3, iters=6, sample_size=64, metric="l2")
    b = kmeans_fit(ds, 3, iters=6, sample_size=64, metric="l2")
    np.testing.assert_array_equal(a, b)     # fully deterministic refit
    # each L2 centroid sits inside the data's bounding box
    assert (a >= mat.min(axis=0) - 1e-9).all()
    assert (a <= mat.max(axis=0) + 1e-9).all()


def test_kmeans_bad_metric():
    with pytest.raises(ValueError):
        kmeans_fit(None, 3, metric="manhattan")


def test_semantic_dedup_subset_of_exact(ray_session):
    import ray.data

    from balrog_ray.functions.dedup import cosine_pairs_exact

    tab, _, _ = _blob_table(n_per=40, dup_pairs=6, seed=11)
    ds = ray.data.from_arrow(tab)
    got = {(r["id_a"], r["id_b"])
           for r in semantic_dedup_pairs(ds, k=3, threshold=0.999,
                                         sample_size=64).take_all()}
    exact = {(r["id_a"], r["id_b"])
             for r in cosine_pairs_exact(
                 ray.data.from_arrow(tab), threshold=0.999).take_all()}
    assert got <= exact
    # planted exact duplicates are identical vectors -> same cluster ->
    # never missed
    planted = {(2 * i, 2 * i + 1) for i in range(6)}
    assert planted <= got
