"""Distributed PCA over an embedding column: an exact integer Gram-matrix
fold plus a broadcast projection stage.

The reference has nothing like this (SURVEY.md §2.3 beyond-reference
family); at training-data scale PCA is the workhorse behind embedding
whitening, SemDeDup-style preprocessing, and index building (OPQ/PCA
rotation before PQ).  The scale shape is the point: the ONLY thing that
crosses the cluster is a fixed ``d*(d+1)/2``-row partial Gram table per
block -- never the vectors themselves -- so the fold moves kilobytes
per block at any corpus size, and the projection is a stateless
broadcast ``map_batches`` matmul.

Determinism: vectors are quantized to integer ten-thousandths with
``floor(v * 10^4 + 0.5)`` (float64 ops, bit-identical in numpy and
DuckDB), so the Gram fold is exact int64 arithmetic -- order-independent
and SQL-checkable.  The eigendecomposition runs once on the driver over
the tiny d x d covariance (d <= a few hundred); eigenvector sign is
fixed by making each component's largest-magnitude coordinate positive.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SCALE = 10_000


def _quantize(batch: pa.Table, col: str) -> np.ndarray:
    """(rows, d) int64 matrix of floor(v * SCALE + 0.5) -- float64 math
    so the oracle's double-precision replay rounds identically."""
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    mat = flat.astype(np.float64).reshape(len(arr), -1)
    return np.floor(mat * float(SCALE) + 0.5).astype(np.int64)


def gram_fold(ds, col: str = "embedding", dim: int | None = None):
    """Upper-triangle exact Gram table of the quantized vectors:
    rows ``(i, j, n, sxy)`` with 1-based ``i <= j``,
    ``sxy = sum_rows q_i * q_j`` (int64-exact), ``n`` the row count.

    Per-block partial: one ``Q.T @ Q`` int64 matmul emits d*(d+1)/2
    partial rows; a single tiny ``groupby((i, j)).sum`` folds them.
    Nothing vector-cardinality-sized ever moves or hits the driver.
    """
    import ray.data.aggregate as agg

    def partial(b: pa.Table) -> pa.Table:
        q = _quantize(b, col)
        d = q.shape[1]
        if dim is not None and d != dim:
            raise ValueError(f"embedding dim {d} != declared {dim}")
        g = q.T @ q                      # int64-exact
        iu, ju = np.triu_indices(d)
        return pa.table({
            "i": pa.array(iu + 1, pa.int64()),
            "j": pa.array(ju + 1, pa.int64()),
            "n": pa.array(np.full(len(iu), q.shape[0]), pa.int64()),
            "sxy": pa.array(g[iu, ju], pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["i", "j"])
            .aggregate(agg.Sum("n", alias_name="n"),
                       agg.Sum("sxy", alias_name="sxy")))


def _moments(ds, col: str):
    """Exact (n, sum-vector, Gram matrix) of the quantized vectors via
    one fixed-size fold (d + d^2 int64 cells per block partial)."""
    def partial(b: pa.Table) -> pa.Table:
        q = _quantize(b, col)
        d = q.shape[1]
        return pa.table({
            "n": pa.array([q.shape[0]], pa.int64()),
            "s": pa.array([q.sum(axis=0)], pa.list_(pa.int64())),
            "g": pa.array([(q.T @ q).reshape(-1)], pa.list_(pa.int64())),
            "d": pa.array([d], pa.int64())})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    if not rows:
        raise ValueError("empty dataset")
    d = int(rows[0]["d"])
    n = sum(int(r["n"]) for r in rows)
    s = np.zeros(d, np.int64)
    g = np.zeros(d * d, np.int64)
    for r in rows:                        # O(#blocks) tiny partials
        s += np.asarray(r["s"], np.int64)
        g += np.asarray(r["g"], np.int64)
    return n, s, g.reshape(d, d)


def fit_pca(ds, col: str = "embedding", k: int = 2):
    """Covariance eigendecomposition from the exact integer moments.
    Returns ``(mean, components)`` in ORIGINAL (unquantized) units:
    mean ``(d,)`` float64, components ``(k, d)`` rows = top-k principal
    axes ordered by descending eigenvalue, sign-fixed."""
    n, s, g = _moments(ds, col)
    mu = s.astype(np.float64) / n
    cov = (g.astype(np.float64) - np.outer(mu, mu) * n) / n
    w, v = np.linalg.eigh(cov)            # ascending eigenvalues
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T                 # (k, d)
    # deterministic sign: largest |coordinate| of each axis positive
    amax = np.argmax(np.abs(comps), axis=1)
    sign = np.sign(comps[np.arange(len(comps)), amax])
    sign[sign == 0] = 1.0
    comps = comps * sign[:, None]
    return mu / SCALE, comps


def pca_project(ds, col: str = "embedding", k: int = 2,
                id_col: str = "vec_id"):
    """Project every vector onto the top-k principal axes: fit on the
    exact moments, broadcast ``(mean, components)`` once via the object
    store, then a stateless float64 matmul per batch.  Output rows
    ``(id_col, pc1 .. pck)``."""
    import ray

    mu, comps = fit_pca(ds, col, k)
    ref = ray.put((mu, comps))

    def project(b: pa.Table) -> pa.Table:
        m, c = ray.get(ref)
        q = _quantize(b, col).astype(np.float64) / SCALE
        y = (q - m) @ c.T
        cols = {id_col: b.column(id_col)}
        for ki in range(c.shape[0]):
            cols[f"pc{ki + 1}"] = pa.array(y[:, ki], pa.float64())
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow")
