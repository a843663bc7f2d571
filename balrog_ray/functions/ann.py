"""Approximate-nearest-neighbour search over an embedding column.

* :func:`brute_force_topk` -- exact cosine top-k: the query matrix is
  broadcast once (``ray.put``), each batch computes a vectorized partial
  top-k (numpy matmul in float64), and one small ``groupby(query_id)``
  merges partials.  This is the correctness baseline and is itself
  scalable: per-batch work is O(batch x q), the shuffle carries only
  q x k x #blocks candidate rows.
* :func:`ivf_topk` -- the scale path: a deterministic k-means-lite
  codebook (fit on a sample, driver-side), vectors assigned to their
  nearest centroid ("inverted list"); queries probe the ``n_probe``
  closest lists only.  Approximate: recall measured against the brute
  baseline in tests.
* :func:`pq_train` / :func:`pq_encode` / :func:`pq_topk` -- product
  quantization (Jegou/Douze/Schmid, "Product Quantization for Nearest
  Neighbor Search", TPAMI 2011): the memory path.  Vectors compress to
  ``n_sub`` uint8 codes; search scores codes against a per-query ADC
  lookup table and re-ranks a per-block shortlist exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _unit(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return mat / norms[:, None]


def _vec_matrix(col, dtype=np.float64) -> np.ndarray:
    """``list<float>`` column -> (n, dim) matrix via the flattened
    Arrow value buffer -- the zero-copy read of the hot path (a
    ``to_pylist`` here boxes every float through Python objects).
    Raises on ragged rows rather than silently misaligning."""
    import pyarrow.compute as pc

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
        else col
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype)
    flat = pc.list_flatten(arr).to_numpy(zero_copy_only=False)
    if flat.size % n:
        raise ValueError("ragged embedding column")
    dim = flat.size // n
    if not pa.types.is_fixed_size_list(arr.type):
        widths = pc.list_value_length(arr).to_numpy(
            zero_copy_only=False)
        if (widths != dim).any():
            raise ValueError("ragged embedding column")
    return flat.reshape(n, dim).astype(dtype, copy=False)


def _ids_i64(col) -> np.ndarray:
    return col.to_numpy(zero_copy_only=False).astype(np.int64,
                                                     copy=False)


PAIRS_SCHEMA = pa.schema([
    ("query_id", pa.int64()),
    ("vec_id", pa.int64()),
    ("cosine", pa.float64()),
])


def _topk_rows(col: np.ndarray, ids: np.ndarray, kth_row: int,
               kk: int) -> np.ndarray:
    """Exact per-block top-kk rows of ``col`` with (cosine desc, id asc)
    tie-break.  Raw argpartition drops arbitrary members of a tie straddling
    the k boundary, which can disagree with the oracle's deterministic
    ordering; expanding to every row >= the kth value and lexsorting makes
    the partial exact for any tie pattern."""
    thresh = col[kth_row]
    cand = np.nonzero(col >= thresh)[0]
    return cand[np.lexsort((ids[cand], -col[cand]))[:kk]]


def _partial_topk_fn(queries_ref, id_col, vec_col, k):
    def fn(batch: pa.Table) -> pa.Table:
        import ray

        if batch.num_rows == 0:
            return pa.table({n: [] for n in PAIRS_SCHEMA.names},
                            schema=PAIRS_SCHEMA)
        # resolve the broadcast INSIDE the worker: the closure ships only
        # the ObjectRef, the matrix travels via the object store
        q = queries_ref if isinstance(queries_ref, np.ndarray) \
            else ray.get(queries_ref)
        qunit = _unit(np.asarray(q, dtype=np.float64))
        ids = _ids_i64(batch.column(id_col))
        vecs = _vec_matrix(batch.column(vec_col))
        sims = _unit(vecs) @ qunit.T                      # (n, q)
        kk = min(k, len(ids))
        part = np.argpartition(-sims, kk - 1, axis=0)      # (n, q)
        out = {"query_id": [], "vec_id": [], "cosine": []}
        for qi in range(qunit.shape[0]):
            rows = _topk_rows(sims[:, qi], ids, part[kk - 1, qi], kk)
            out["query_id"].extend([qi] * len(rows))
            out["vec_id"].extend(ids[rows].tolist())
            out["cosine"].extend(sims[rows, qi].tolist())
        return pa.table(out, schema=PAIRS_SCHEMA)

    return fn


def _merge_topk_fn(k):
    def fn(group: pa.Table) -> pa.Table:
        sims = group.column("cosine").to_numpy()
        ids = group.column("vec_id").to_numpy()
        qid = group.column("query_id")[0].as_py()
        # deterministic: sort by (-cosine, vec_id)
        order = np.lexsort((ids, -sims))[:k]
        return pa.table({"query_id": pa.array([qid] * len(order), pa.int64()),
                         "vec_id": pa.array(ids[order], pa.int64()),
                         "cosine": pa.array(sims[order], pa.float64())},
                        schema=PAIRS_SCHEMA)
    return fn


def brute_force_topk(emb_ds, queries: np.ndarray, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     batch_size: int = 4096):
    """Exact cosine top-k of every query against the full dataset."""
    import ray

    ref = ray.put(np.asarray(queries, dtype=np.float64))
    partial = emb_ds.map_batches(
        _partial_topk_fn(ref, id_col, vec_col, k),
        batch_format="pyarrow", batch_size=batch_size)
    return partial.groupby("query_id").map_groups(
        _merge_topk_fn(k), batch_format="pyarrow")


def kmeans_lite(sample: np.ndarray, n_centroids: int, iters: int = 8,
                seed: int = 5) -> np.ndarray:
    """Deterministic spherical k-means on a driver-side sample."""
    rng = np.random.default_rng(seed)
    data = _unit(np.asarray(sample, dtype=np.float64))
    idx = rng.choice(len(data), size=min(n_centroids, len(data)),
                     replace=False)
    cents = data[np.sort(idx)].copy()
    for _ in range(iters):
        assign = (data @ cents.T).argmax(axis=1)
        for c in range(len(cents)):
            members = data[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = _unit(cents)
    return cents


def ivf_topk(emb_ds, queries: np.ndarray, k: int = 10,
             n_centroids: int = 16, n_probe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             sample_size: int = 2048):
    """IVF: assign vectors to centroid lists, probe n_probe lists/query.

    The codebook is fit on a deterministic hash-bottom-k sample -- the
    ``sample_size`` rows with the smallest id hashes, gathered as a
    per-block partial bottom-k plus a tiny driver merge.  Unlike a
    ``limit(n)`` first-N pass, this is uniform over the whole dataset
    regardless of row order/clustering, at the same one-pass cost.  The
    assignment is a stateless map keyed by centroid; the search probes
    selected lists only -- at scale each list is its own partition.
    """
    import ray

    from .cluster import _hash_sample_matrix

    sample = _hash_sample_matrix(emb_ds, id_col, vec_col, sample_size)
    cents = kmeans_lite(sample, n_centroids)
    qunit = _unit(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(qunit @ cents.T), axis=1)[:, :n_probe]  # (q, p)
    cents_ref = ray.put(cents)
    # queries that probe each list
    list_to_queries = {}
    for qi in range(len(qunit)):
        for c in probe[qi]:
            list_to_queries.setdefault(int(c), []).append(qi)
    l2q_ref = ray.put({c: np.array(v) for c, v in list_to_queries.items()})
    q_ref = ray.put(qunit)

    def assign_and_search(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({n: [] for n in PAIRS_SCHEMA.names},
                            schema=PAIRS_SCHEMA)
        cents_l = ray.get(cents_ref)
        l2q = ray.get(l2q_ref)
        qmat = ray.get(q_ref)
        ids = _ids_i64(batch.column(id_col))
        vecs = _unit(_vec_matrix(batch.column(vec_col)))
        assign = (vecs @ cents_l.T).argmax(axis=1)
        out = {"query_id": [], "vec_id": [], "cosine": []}
        for c in np.unique(assign):
            qids = l2q.get(int(c))
            if qids is None:
                continue
            members = assign == c
            sims = vecs[members] @ qmat[qids].T       # (m, |qids|)
            mids = ids[members]
            kk = min(k, len(mids))
            part = np.argpartition(-sims, kk - 1, axis=0)
            for col, qi in enumerate(qids):
                rows = _topk_rows(sims[:, col], mids, part[kk - 1, col], kk)
                out["query_id"].extend([int(qi)] * len(rows))
                out["vec_id"].extend(mids[rows].tolist())
                out["cosine"].extend(sims[rows, col].tolist())
        return pa.table(out, schema=PAIRS_SCHEMA)

    partial = emb_ds.map_batches(assign_and_search, batch_format="pyarrow")
    return partial.groupby("query_id").map_groups(
        _merge_topk_fn(k), batch_format="pyarrow")


def _kmeans_plain(sample: np.ndarray, n_codes: int, iters: int = 10,
                  seed: int = 9) -> np.ndarray:
    """Deterministic plain (Euclidean) Lloyd k-means for PQ sub-codebooks
    -- subvectors are NOT unit vectors, so spherical kmeans_lite does not
    apply.  Empty clusters keep their previous centroid."""
    rng = np.random.default_rng(seed)
    data = np.asarray(sample, dtype=np.float64)
    idx = rng.choice(len(data), size=min(n_codes, len(data)),
                     replace=False)
    cents = data[np.sort(idx)].copy()
    for _ in range(iters):
        d2 = ((data[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(len(cents)):
            members = data[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def pq_train(emb_ds, *, n_sub: int = 4, n_codes: int = 32,
             id_col: str = "vec_id", vec_col: str = "embedding",
             sample_size: int = 2048) -> np.ndarray:
    """Train product-quantization codebooks (Jegou/Douze/Schmid, TPAMI
    2011): unit-normalized vectors split into ``n_sub`` subspaces, one
    plain-kmeans codebook per subspace, fit on the deterministic
    hash-bottom-k sample.  Returns ``(n_sub, n_codes, dim // n_sub)``
    float64 codebooks.  Compression: dim x 4 bytes -> n_sub bytes per
    vector (n_codes <= 256), the representation that lets a 10^12-vector
    table's scan state fit in worker memory."""
    from .cluster import _hash_sample_matrix

    sample = _unit(np.asarray(
        _hash_sample_matrix(emb_ds, id_col, vec_col, sample_size),
        dtype=np.float64))
    dim = sample.shape[1]
    if dim % n_sub:
        raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
    if n_codes > 256:
        raise ValueError("n_codes > 256 does not fit uint8 codes")
    d_sub = dim // n_sub
    return np.stack([
        _kmeans_plain(sample[:, s * d_sub:(s + 1) * d_sub], n_codes,
                      seed=9 + s)
        for s in range(n_sub)])


def pq_encode(emb_ds, codebooks: np.ndarray, *, id_col: str = "vec_id",
              vec_col: str = "embedding"):
    """Vectors -> uint8 PQ codes: ``(id_col, codes: binary[n_sub])``.
    The persisted compressed table an at-scale deployment scans instead
    of raw embeddings."""
    import ray

    cb_ref = ray.put(codebooks)
    n_sub, _, d_sub = codebooks.shape

    def encode(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({id_col: batch.column(id_col),
                             "codes": pa.array([], pa.binary())})
        cb = ray.get(cb_ref)
        vecs = _unit(_vec_matrix(batch.column(vec_col)))
        codes = np.empty((len(vecs), n_sub), dtype=np.uint8)
        for s in range(n_sub):
            sub = vecs[:, s * d_sub:(s + 1) * d_sub]
            d2 = ((sub[:, None, :] - cb[s][None, :, :]) ** 2).sum(axis=2)
            codes[:, s] = d2.argmin(axis=1)
        return pa.table({
            id_col: batch.column(id_col),
            "codes": pa.array([c.tobytes() for c in codes], pa.binary())})

    return emb_ds.map_batches(encode, batch_format="pyarrow")


def pq_topk(emb_ds, queries: np.ndarray, k: int = 10, *, n_sub: int = 4,
            n_codes: int = 32, shortlist: int | None = None,
            id_col: str = "vec_id", vec_col: str = "embedding",
            sample_size: int = 2048):
    """PQ asymmetric-distance ANN: encode each block's vectors to uint8
    codes, score every query against the codes via an ADC lookup table
    (approx inner product = sum of per-subspace LUT entries -- O(n_sub)
    adds per vector instead of O(dim) multiplies), take the per-block
    approx shortlist, then re-rank the shortlist EXACTLY on the raw
    vectors already in the block.  The merge shuffle carries exact
    cosines, so the output ordering is deterministic and only shortlist
    misses cost recall (measured vs the brute baseline in tests)."""
    import ray

    codebooks = pq_train(emb_ds, n_sub=n_sub, n_codes=n_codes,
                         id_col=id_col, vec_col=vec_col,
                         sample_size=sample_size)
    n_sub_, _, d_sub = codebooks.shape
    qunit = _unit(np.asarray(queries, dtype=np.float64))
    # ADC lookup table: lut[q, s, c] = <q_s, codebook[s][c]>
    lut = np.einsum("qsd,scd->qsc",
                    qunit.reshape(len(qunit), n_sub_, d_sub), codebooks)
    short = shortlist if shortlist is not None else max(4 * k, 32)
    cb_ref = ray.put(codebooks)
    lut_ref = ray.put(lut)
    q_ref = ray.put(qunit)

    def scan(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({n: [] for n in PAIRS_SCHEMA.names},
                            schema=PAIRS_SCHEMA)
        cb = ray.get(cb_ref)
        lut_l = ray.get(lut_ref)
        qmat = ray.get(q_ref)
        ids = _ids_i64(batch.column(id_col))
        vecs = _unit(_vec_matrix(batch.column(vec_col)))
        codes = np.empty((len(vecs), n_sub_), dtype=np.int64)
        for s in range(n_sub_):
            sub = vecs[:, s * d_sub:(s + 1) * d_sub]
            d2 = ((sub[:, None, :] - cb[s][None, :, :]) ** 2).sum(axis=2)
            codes[:, s] = d2.argmin(axis=1)
        # approx[n, q] = sum_s lut[q, s, codes[n, s]]
        approx = np.zeros((len(vecs), len(qmat)))
        for s in range(n_sub_):
            approx += lut_l[:, s, codes[:, s]].T
        out = {"query_id": [], "vec_id": [], "cosine": []}
        ss = min(short, len(ids))
        cand = np.argpartition(-approx, ss - 1, axis=0)[:ss]  # (ss, q)
        for qi in range(len(qmat)):
            rows = cand[:, qi]
            exact = vecs[rows] @ qmat[qi]                  # re-rank
            kk = min(k, len(rows))
            keep = _topk_rows(exact, ids[rows],
                              np.argpartition(-exact, kk - 1)[kk - 1], kk)
            out["query_id"].extend([qi] * len(keep))
            out["vec_id"].extend(ids[rows][keep].tolist())
            out["cosine"].extend(exact[keep].tolist())
        return pa.table(out, schema=PAIRS_SCHEMA)

    partial = emb_ds.map_batches(scan, batch_format="pyarrow")
    return partial.groupby("query_id").map_groups(
        _merge_topk_fn(k), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# scalar (int8) quantization: the simplest memory-compression path for
# embedding search -- 4x smaller than float32 (vs PQ's lossier 16-32x),
# one uint8 code per DIMENSION with per-dimension global [lo, hi) ranges

def sq_train(emb_ds, vec_col: str = "embedding") -> np.ndarray:
    """Per-dimension global (lo, hi) ranges: per-block partial min/max
    rows (one pair of dim-length vectors each), tiny final reduce.
    Returns a (2, dim) float32 array."""
    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"lo": pa.array([], pa.binary()),
                             "hi": pa.array([], pa.binary())})
        vecs = _vec_matrix(batch.column(vec_col), np.float32)
        return pa.table({
            "lo": pa.array([vecs.min(axis=0).tobytes()], pa.binary()),
            "hi": pa.array([vecs.max(axis=0).tobytes()], pa.binary())})

    rows = emb_ds.map_batches(partial, batch_format="pyarrow").take_all()
    lo = np.min([np.frombuffer(r["lo"], np.float32) for r in rows], axis=0)
    hi = np.max([np.frombuffer(r["hi"], np.float32) for r in rows], axis=0)
    hi = np.where(hi > lo, hi, np.nextafter(lo, np.inf, dtype=np.float32))
    return np.stack([lo, hi])


def sq_encode(emb_ds, ranges: np.ndarray, *, id_col: str = "vec_id",
              vec_col: str = "embedding"):
    """float32 vectors -> uint8 codes (one byte per dimension):
    ``code = round((v - lo) / (hi - lo) * 255)`` clipped to [0, 255]."""
    lo, hi = np.asarray(ranges, np.float32)

    def encode(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "code": pa.array([], pa.binary())})
        vecs = _vec_matrix(batch.column(vec_col), np.float32)
        q = np.clip(np.rint((vecs - lo) / (hi - lo) * 255.0),
                    0, 255).astype(np.uint8)
        return pa.table({
            id_col: batch.column(id_col),
            "code": pa.array([q[i].tobytes() for i in range(len(q))],
                             pa.binary())})

    return emb_ds.map_batches(encode, batch_format="pyarrow")


def sq_topk(code_ds, queries: np.ndarray, ranges: np.ndarray,
            k: int = 10, *, id_col: str = "vec_id",
            batch_size: int = 4096):
    """Approximate cosine top-k over int8 codes: per block, dequantize
    (vectorized: one fused multiply-add over the uint8 view), cosine
    against the broadcast query matrix, exact per-block partial top-k,
    tiny merge -- the brute-force scan's shape at a quarter of the
    bytes.  Recall vs exact search is measured in tests."""
    import ray

    lo, hi = np.asarray(ranges, np.float64)
    scale = (hi - lo) / 255.0
    qref = ray.put(np.asarray(queries, np.float64))

    def scan(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({n: [] for n in PAIRS_SCHEMA.names},
                            schema=PAIRS_SCHEMA)
        q = ray.get(qref) if not isinstance(qref, np.ndarray) else qref
        qunit = _unit(np.asarray(q, np.float64))
        ids = _ids_i64(batch.column(id_col))
        codes = np.frombuffer(
            b"".join(batch.column("code").to_pylist()),
            np.uint8).reshape(batch.num_rows, -1)
        vecs = codes.astype(np.float64) * scale + lo
        sims = _unit(vecs) @ qunit.T
        kk = min(k, len(ids))
        part = np.argpartition(-sims, kk - 1, axis=0)
        out = {"query_id": [], "vec_id": [], "cosine": []}
        for qi in range(qunit.shape[0]):
            rows = _topk_rows(sims[:, qi], ids, part[kk - 1, qi], kk)
            out["query_id"].extend([qi] * len(rows))
            out["vec_id"].extend(ids[rows].tolist())
            out["cosine"].extend(sims[rows, qi].tolist())
        return pa.table(out, schema=PAIRS_SCHEMA)

    partial = code_ds.map_batches(scan, batch_format="pyarrow",
                                  batch_size=batch_size)
    return partial.groupby("query_id").map_groups(
        _merge_topk_fn(k), batch_format="pyarrow")


def mmr_topk(emb_ds, queries: np.ndarray, k: int = 10, *,
             lam: float = 0.7, pool: int = 40,
             id_col: str = "vec_id", vec_col: str = "embedding",
             batch_size: int = 4096):
    """Maximal Marginal Relevance diversified retrieval (Carbonell &
    Goldstein 1998): per query, greedily select k results maximizing
    ``lam * cos(q, d) - (1 - lam) * max_{s in selected} cos(d, s)`` --
    the relevance/diversity trade-off reranker search stacks put after
    ANN.

    Two stages: (1) the distributed exact top-``pool`` candidate pass
    (same per-block partial top-k + tiny merge as
    :func:`brute_force_topk`, but carrying each candidate's unit
    vector -- pool * dim floats per query, still KB-sized); (2) a
    per-query greedy MMR over the pool (k * pool dot products,
    driver-free, inside ``map_groups``).  The greedy is EXACT over the
    pool; pool membership is the standard rerank approximation
    (pool >= k enforced).  Ties break (score desc, vec_id asc) after
    an 1e-12 round, so block order cannot flip a selection.

    Returns (query_id, rank, vec_id, cosine, mmr_score).
    """
    import ray

    if not 0.0 <= lam <= 1.0:
        raise ValueError("lam must be in [0, 1]")
    if pool < k:
        raise ValueError("pool must be >= k")
    qunit = _unit(np.asarray(queries, np.float64))
    ref = ray.put(qunit)

    pool_schema = pa.schema([
        ("query_id", pa.int64()), ("vec_id", pa.int64()),
        ("cosine", pa.float64()),
        ("unit", pa.list_(pa.float64())),
    ])

    def scan(batch: pa.Table) -> pa.Table:
        q = ray.get(ref)
        ids = _ids_i64(batch.column(id_col))
        vecs = _unit(_vec_matrix(batch.column(vec_col)))
        sims = vecs @ q.T
        kk = min(pool, len(ids))
        part = np.argpartition(-sims, kk - 1, axis=0)
        out = {"query_id": [], "vec_id": [], "cosine": [], "unit": []}
        for qi in range(q.shape[0]):
            rows = _topk_rows(sims[:, qi], ids, part[kk - 1, qi], kk)
            out["query_id"].extend([qi] * len(rows))
            out["vec_id"].extend(ids[rows].tolist())
            out["cosine"].extend(sims[rows, qi].tolist())
            out["unit"].extend(vecs[rows].tolist())
        return pa.table(out, schema=pool_schema)

    def mmr(group: pa.Table) -> pa.Table:
        g = group.to_pydict()
        qid = int(g["query_id"][0])
        ids = np.asarray(g["vec_id"], np.int64)
        cos = np.asarray(g["cosine"], np.float64)
        units = np.array(g["unit"], np.float64)
        # deterministic pool: best `pool` by (cosine desc, id asc)
        order = np.lexsort((ids, -cos))[:pool]
        ids, cos, units = ids[order], cos[order], units[order]
        sel, scores = greedy_mmr(cos, units, ids, k=k, lam=lam,
                                 return_scores=True)
        return pa.table({
            "query_id": pa.array([qid] * len(sel), pa.int64()),
            "rank": pa.array(np.arange(len(sel)), pa.int64()),
            "vec_id": pa.array(ids[sel], pa.int64()),
            "cosine": pa.array(cos[sel], pa.float64()),
            "mmr_score": pa.array(np.asarray(scores), pa.float64()),
        })

    partial = emb_ds.map_batches(scan, batch_format="pyarrow",
                                 batch_size=batch_size)
    return (partial.groupby("query_id")
            .map_groups(mmr, batch_format="pyarrow"))


def greedy_mmr(cos: np.ndarray, units: np.ndarray, ids: np.ndarray,
               *, k: int, lam: float, return_scores: bool = False):
    """Exact greedy MMR over a candidate pool; deterministic tie-break
    (rounded score desc, vec_id asc).  Shared by the distributed path
    and the single-process oracle."""
    n = len(ids)
    chosen: list[int] = []
    scores: list[float] = []
    max_sim = np.full(n, -np.inf)
    taken = np.zeros(n, bool)
    for _ in range(min(k, n)):
        if chosen:
            mmr_s = lam * cos - (1.0 - lam) * max_sim
        else:
            mmr_s = lam * cos
        mmr_r = np.round(mmr_s, 12)
        mmr_r[taken] = -np.inf
        best = mmr_r.max()
        cand = np.flatnonzero(mmr_r == best)
        pick = cand[np.argmin(ids[cand])]
        chosen.append(int(pick))
        scores.append(float(mmr_s[pick]))
        taken[pick] = True
        max_sim = np.maximum(max_sim, units @ units[pick])
    if return_scores:
        return chosen, scores
    return chosen


# ------------------------------------------------------------ kNN graph

def knn_graph(emb_ds, k: int = 10, *, n_centroids: int = 16,
              n_probe: int = 4, id_col: str = "vec_id",
              vec_col: str = "embedding", sample_size: int = 2048,
              num_partitions: int = 8):
    """Approximate kNN GRAPH: every vector's top-k cosine neighbors
    (self excluded) -- the all-pairs building block under SemDeDup-style
    semantic dedup, graph-based label propagation and kNN-classifier
    curation, where ``*_topk`` answers a fixed external query set
    instead.

    IVF-bucketed construction, nothing quadratic anywhere:

    * centroids fit on the deterministic hash-bottom-k sample (same rule
      as ivf_topk);
    * ONE pass tags each vector as a MEMBER of its home list and as a
      QUERY in its ``n_probe`` nearest lists, so the single keyed
      exchange ships each vector ``1 + n_probe`` times (unit-normalized,
      float32) -- data motion O(n * n_probe), never O(n^2);
    * the per-list fold multiplies the list's queries against its
      members (one matmul per list, many complete lists per hash
      partition) and emits exact per-list top-k partials with the
      (cosine desc, id asc) tie-break;
    * a second keyed fold merges each vector's partials from its
      ``n_probe`` lists into the final top-k -- vectorized sorted-run
      ranking, no per-group Python.

    Returns a Dataset ``(query_id, vec_id, cosine)``, <= k rows per
    vector.  Recall vs brute force is the usual IVF trade
    (``n_probe``/``n_centroids``); tests/test_functions.py measures it
    on planted clusters."""
    import ray

    from ..partitions import keyed_fold
    from .cluster import _hash_sample_matrix

    sample = _hash_sample_matrix(emb_ds, id_col, vec_col, sample_size)
    cents = kmeans_lite(sample, n_centroids)
    # kmeans_lite can return fewer centroids than requested (tiny
    # sample); an unclamped n_probe would make argsort[:, :n_probe]
    # emit fewer query rows than role/vid expect and break pa.table.
    n_probe = min(n_probe, cents.shape[0])
    cents_ref = ray.put(cents)
    dim = cents.shape[1]

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "list_id": pa.array([], pa.int64()),
                "role": pa.array([], pa.int64()),
                "vid": pa.array([], pa.int64()),
                "vec": pa.array([], pa.list_(pa.float32(), dim))})
        c = ray.get(cents_ref)
        ids = _ids_i64(batch.column(id_col))
        vecs = _unit(_vec_matrix(batch.column(vec_col)))
        sims = vecs @ c.T
        order = np.argsort(-sims, axis=1)[:, :n_probe]   # (n, n_probe)
        home = order[:, 0] if n_probe else sims.argmax(axis=1)
        # member rows (home list) + query rows (n_probe lists)
        lid = np.concatenate([home, order.reshape(-1)])
        role = np.concatenate([np.zeros(len(ids), np.int64),
                               np.ones(len(ids) * n_probe, np.int64)])
        vid = np.concatenate([ids, np.repeat(ids, n_probe)])
        vmat = np.concatenate([vecs, np.repeat(vecs, n_probe, axis=0)])
        return pa.table({
            "list_id": pa.array(lid.astype(np.int64), pa.int64()),
            "role": pa.array(role, pa.int64()),
            "vid": pa.array(vid, pa.int64()),
            "vec": pa.array(vmat.astype(np.float32).tolist(),
                            pa.list_(pa.float32(), dim))})

    def list_fold(b: pa.Table) -> pa.Table:
        out = {"query_id": [], "vec_id": [], "cosine": []}
        if b.num_rows == 0:
            return pa.table(out, schema=PAIRS_SCHEMA)
        lid = b.column("list_id").to_numpy()
        role = b.column("role").to_numpy()
        vid = b.column("vid").to_numpy()
        vmat = _vec_matrix(b.column("vec"))
        order = np.argsort(lid, kind="stable")
        lid_s = lid[order]
        starts = np.flatnonzero(np.concatenate(
            [[True], lid_s[1:] != lid_s[:-1]]))
        bounds = np.append(starts, len(lid_s))
        for s, e in zip(bounds[:-1], bounds[1:]):
            seg = order[s:e]
            mem = seg[role[seg] == 0]
            qry = seg[role[seg] == 1]
            if len(mem) == 0 or len(qry) == 0:
                continue
            sims = vmat[qry] @ vmat[mem].T           # (q, m)
            mids = vid[mem]
            qids = vid[qry]
            sims[mids[None, :] == qids[:, None]] = -np.inf  # no self
            kk = min(k, sims.shape[1])
            part = np.argpartition(-sims, kk - 1, axis=1)
            for row in range(sims.shape[0]):
                rows = _topk_rows(sims[row], mids,
                                  part[row, kk - 1], kk)
                keep = sims[row][rows] > -np.inf
                rows = rows[keep]
                out["query_id"].extend([int(qids[row])] * len(rows))
                out["vec_id"].extend(mids[rows].tolist())
                out["cosine"].extend(sims[row][rows].tolist())
        return pa.table(out, schema=PAIRS_SCHEMA)

    def merge_fold(b: pa.Table) -> pa.Table:
        # complete query groups per partition: global (query, -cos, id)
        # sort, rank-within-group via cumcount, keep rank < k, then drop
        # duplicate (query, neighbor) rows (same pair can arrive from
        # several probed lists)
        if b.num_rows == 0:
            return pa.table({n: [] for n in PAIRS_SCHEMA.names},
                            schema=PAIRS_SCHEMA)
        q = b.column("query_id").to_numpy()
        v = b.column("vec_id").to_numpy()
        c = b.column("cosine").to_numpy()
        order = np.lexsort((v, -c, q))
        qs, vs, cs = q[order], v[order], c[order]
        pair_first = np.concatenate(
            [[True], (qs[1:] != qs[:-1]) | (vs[1:] != vs[:-1])])
        qs, vs, cs = qs[pair_first], vs[pair_first], cs[pair_first]
        first = np.concatenate([[True], qs[1:] != qs[:-1]])
        starts = np.flatnonzero(first)
        grp = np.cumsum(first) - 1
        rank = np.arange(len(qs)) - starts[grp]
        keep = rank < k
        return pa.table({"query_id": pa.array(qs[keep], pa.int64()),
                         "vec_id": pa.array(vs[keep], pa.int64()),
                         "cosine": pa.array(cs[keep], pa.float64())},
                        schema=PAIRS_SCHEMA)

    partials = keyed_fold(
        emb_ds.map_batches(tag, batch_format="pyarrow"),
        ["list_id"], list_fold, num_partitions=num_partitions)
    return keyed_fold(partials, ["query_id"], merge_fold,
                      num_partitions=num_partitions)
