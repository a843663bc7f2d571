"""Distributed embedding clustering (Lloyd k-means) and SemDeDup-style
semantic near-dedup.

* :func:`kmeans_fit` -- deterministic hash-bottom-k sample -> k-means++
  seeding (driver-side, tiny) -> distributed Lloyd iterations.  Each
  iteration broadcasts the centroid matrix once (``ray.put``) and every
  batch emits ONE fixed-size partial row (per-centroid counts + vector
  sums, O(k*d) regardless of batch rows); the driver combines partials in
  block order, so the whole update is a map + a bounded gather -- the same
  partial/final aggregate shape the reference uses for its chunked union
  (``/root/reference/data_prep/vegetation/04_merge_geometries.py:129-205``).
  At very large k*d, swap the driver combine for a tree reduce over the
  identical partial rows; the per-batch shape is unchanged.
* :func:`kmeans_assign` -- stateless ``map_batches`` labelling every row
  with its nearest centroid (broadcast once, matmul per batch).
* :func:`semantic_dedup_pairs` -- SemDeDup-style near-dup discovery:
  cluster, then exact within-cluster pairwise cosine via one
  ``groupby(cluster_id)`` shuffle.  The O(g^2) verify is bounded by the
  largest cluster; pick ``k ~ n / target_cluster_size``.  Recall is a
  subset of the exact all-pairs oracle (``dedup.cosine_pairs_exact``),
  asserted in tests.

No clustering exists in the reference (its only "cluster" is the Postgres
storage sort ``CLUSTER ON``, `03_explode_multipolygons_and_classify.sql:79-80`);
this completes the embedding near-dup / similarity-search family that
SURVEY.md §2.3 requires beyond the reference.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .ann import _unit


def _matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    return np.array(batch.column(vec_col).to_pylist(),
                    dtype=np.float64).reshape(batch.num_rows, -1)


def _hash_sample_matrix(emb_ds, id_col: str, vec_col: str,
                        sample_size: int) -> np.ndarray:
    """Deterministic uniform sample: bottom-``sample_size`` rows by id
    hash -- per-block partial bottom-k, tiny driver merge (order-free,
    unlike ``limit(n)``'s first-N)."""
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"h": pa.array([], pa.int64()),
                             vec_col: batch.column(vec_col)})
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        h = ids.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        order = np.argsort(h, kind="stable")[:sample_size]
        return pa.table({"h": pa.array(h[order].view(np.int64), pa.int64()),
                         vec_col: batch.column(vec_col).take(pa.array(order))})

    tabs = [t for t in ray.get(
        emb_ds.select_columns([id_col, vec_col])
        .map_batches(partial, batch_format="pyarrow")
        .materialize().to_arrow_refs()) if t.num_rows]
    tab = pa.concat_tables(tabs)
    pick = np.argsort(tab.column("h").to_numpy(), kind="stable")[:sample_size]
    return np.array(tab.column(vec_col).take(pa.array(pick)).to_pylist(),
                    dtype=np.float64)


def _kmeanspp_seed(sample: np.ndarray, k: int, seed: int,
                   metric: str) -> np.ndarray:
    """k-means++ on the driver-side sample (k x sample distance matrix)."""
    rng = np.random.default_rng(seed)
    data = _unit(sample) if metric == "cosine" else sample
    cents = [data[int(rng.integers(len(data)))]]
    for _ in range(1, min(k, len(data))):
        d2 = _pair_cost(data, np.asarray(cents), metric).min(axis=1)
        total = d2.sum()
        if total <= 0:          # all points already coincide with a seed
            cents.append(data[int(rng.integers(len(data)))])
            continue
        cents.append(data[int(rng.choice(len(data), p=d2 / total))])
    return np.asarray(cents, dtype=np.float64)


def _pair_cost(data: np.ndarray, cents: np.ndarray,
               metric: str) -> np.ndarray:
    """(n, k) assignment cost -- squared L2, or (1 - cosine) for unit rows."""
    if metric == "cosine":
        # clamp: dot of identical unit rows can exceed 1 by float error
        return np.maximum(1.0 - data @ cents.T, 0.0)
    d2 = (np.einsum("ij,ij->i", data, data)[:, None]
          - 2.0 * (data @ cents.T)
          + np.einsum("ij,ij->i", cents, cents)[None, :])
    return np.maximum(d2, 0.0)


def kmeans_fit(emb_ds, k: int, *, id_col: str = "vec_id",
               vec_col: str = "embedding", iters: int = 10,
               tol: float = 1e-6, metric: str = "cosine",
               sample_size: int = 2048, seed: int = 29,
               batch_size: int = 4096) -> np.ndarray:
    """Fit ``k`` centroids over ``emb_ds[vec_col]``; returns (k, d) float64.

    Deterministic for a fixed input: seeded k-means++ on a hash sample,
    fixed-order partial combine, early stop on centroid shift < ``tol``.
    """
    if metric not in ("cosine", "l2"):
        raise ValueError(f"metric must be 'cosine' or 'l2', got {metric!r}")
    import ray

    # the Lloyd loop re-scans the vectors each iteration: materialize the
    # two needed columns once (bounded: the projection, not the full table)
    ds = emb_ds.select_columns([id_col, vec_col]).materialize()
    sample = _hash_sample_matrix(ds, id_col, vec_col, sample_size)
    cents = _kmeanspp_seed(sample, k, seed, metric)
    k_eff, d = cents.shape

    def partial_fn(cents_ref):
        def fn(batch: pa.Table) -> pa.Table:
            empty = pa.table({
                "counts": pa.array([], pa.list_(pa.int64())),
                "sums": pa.array([], pa.list_(pa.float64()))})
            if batch.num_rows == 0:
                return empty
            c = cents_ref if isinstance(cents_ref, np.ndarray) \
                else ray.get(cents_ref)
            vecs = _matrix(batch, vec_col)
            if metric == "cosine":
                vecs = _unit(vecs)
            assign = _pair_cost(vecs, c, metric).argmin(axis=1)
            counts = np.bincount(assign, minlength=len(c)).astype(np.int64)
            sums = np.zeros((len(c), vecs.shape[1]), dtype=np.float64)
            np.add.at(sums, assign, vecs)
            return pa.table({
                "counts": pa.array([counts.tolist()],
                                   pa.list_(pa.int64())),
                "sums": pa.array([sums.ravel().tolist()],
                                 pa.list_(pa.float64()))})
        return fn

    for _ in range(iters):
        ref = ray.put(cents)
        parts = [t for t in ray.get(
            ds.map_batches(partial_fn(ref), batch_format="pyarrow",
                           batch_size=batch_size).materialize().to_arrow_refs())
            if t.num_rows]
        counts = np.zeros(k_eff, dtype=np.int64)
        sums = np.zeros((k_eff, d), dtype=np.float64)
        for t in parts:                      # block order: deterministic
            for row in range(t.num_rows):
                counts += np.asarray(t.column("counts")[row].as_py(),
                                     dtype=np.int64)
                sums += np.asarray(t.column("sums")[row].as_py(),
                                   dtype=np.float64).reshape(k_eff, d)
        new = cents.copy()                   # empty cluster: keep centroid
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz, None]
        if metric == "cosine":
            new = _unit(new)
        shift = float(np.abs(new - cents).max())
        cents = new
        if shift < tol:
            break
    return cents


def kmeans_assign(emb_ds, centroids: np.ndarray, *,
                  vec_col: str = "embedding", metric: str = "cosine",
                  out_col: str = "cluster_id", batch_size: int = 4096):
    """Append ``cluster_id`` (int32) + ``score`` (float64: cosine to the
    centroid, or -sqrt(L2 cost)) to every row; centroids broadcast once."""
    import ray

    cents = np.asarray(centroids, dtype=np.float64)
    if metric == "cosine":
        cents = _unit(cents)
    ref = ray.put(cents)

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return (batch.append_column(out_col,
                                        pa.array([], pa.int32()))
                    .append_column("score", pa.array([], pa.float64())))
        c = ray.get(ref)
        vecs = _matrix(batch, vec_col)
        if metric == "cosine":
            vecs = _unit(vecs)
        cost = _pair_cost(vecs, c, metric)
        assign = cost.argmin(axis=1)
        best = cost[np.arange(len(assign)), assign]
        score = 1.0 - best if metric == "cosine" else -np.sqrt(best)
        return (batch.append_column(out_col,
                                    pa.array(assign.astype(np.int32)))
                .append_column("score", pa.array(score, pa.float64())))

    return emb_ds.map_batches(fn, batch_format="pyarrow",
                              batch_size=batch_size)


def semantic_dedup_pairs(emb_ds, *, k: int = 64,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         threshold: float = 0.95, iters: int = 8,
                         sample_size: int = 2048, seed: int = 29):
    """SemDeDup: k-means the embeddings, then exact pairwise cosine WITHIN
    each cluster (one ``groupby(cluster_id)`` shuffle).  Emits
    ``(id_a < id_b, cosine >= threshold)`` pairs; precision 1 (every pair
    cosine-verified), recall limited to same-cluster pairs -- identical
    vectors always land in one cluster, so exact duplicates are never
    missed."""
    schema = emb_ds.schema()
    id_type = schema.types[schema.names.index(id_col)]
    cents = kmeans_fit(emb_ds, k, id_col=id_col, vec_col=vec_col,
                       iters=iters, metric="cosine",
                       sample_size=sample_size, seed=seed)
    assigned = kmeans_assign(
        emb_ds.select_columns([id_col, vec_col]), cents, vec_col=vec_col)

    def verify_group(group: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], id_type),
                          "id_b": pa.array([], id_type),
                          "cosine": pa.array([], pa.float64())})
        if group.num_rows < 2:
            return empty
        ids = np.asarray(group.column(id_col).to_pylist())
        unit = _unit(_matrix(group, vec_col))
        sims = unit @ unit.T
        ia, ib = np.nonzero(np.triu(sims >= threshold, k=1))
        if not len(ia):
            return empty
        lo = np.minimum(ids[ia], ids[ib])
        hi = np.maximum(ids[ia], ids[ib])
        return pa.table({"id_a": pa.array(lo.tolist(), id_type),
                         "id_b": pa.array(hi.tolist(), id_type),
                         "cosine": pa.array(sims[ia, ib], pa.float64())})

    return (assigned.groupby("cluster_id")
            .map_groups(verify_group, batch_format="pyarrow"))
