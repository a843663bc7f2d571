"""Deduplication family over a documents table.

Every variant is expressed Ray-Data-first:

* **exact**      -- content hash -> ``groupby(hash)`` -> keep min doc_id
  (hash-partitioned first-wins, the ``select distinct`` shape).
* **minhash LSH**-- shingle -> 64-perm minhash -> fixed-size signatures
  shuffled to band buckets -> in-bucket signature-estimated Jaccard ->
  candidates-only exact-Jaccard verify.  One shuffle keyed by band
  bucket carrying 512 B/doc/band; no O(n^2) stage, no text duplication.
* **simhash**    -- 64-bit simhash, bucketed by 16-bit chunks (Hamming <= 3
  guarantee via pigeonhole across 4 chunks).
* **n-gram Jaccard** -- the exact verifier, also usable standalone.
* **embedding cosine** -- near-dup pairs over an embedding column via
  banded random-hyperplane LSH (AND-within-band / OR-across-bands) +
  exact cosine verify, plus an exact broadcast-matmul variant.

All hashing is seeded and deterministic across processes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


# ---------------------------------------------------------------- exact

def content_hash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    hs = [int.from_bytes(hashlib.sha1(t.encode()).digest()[:8], "big",
                         signed=True)
          for t in batch.column(text_col).to_pylist()]
    return batch.append_column("content_hash", pa.array(hs, pa.int64()))


def exact_dedup(docs_ds, id_col: str = "doc_id", text_col: str = "text"):
    """Keep the lowest-id document per distinct text.  Returns a Dataset of
    surviving (doc_id, content_hash)."""
    import ray.data.aggregate as agg

    hashed = docs_ds.map_batches(
        lambda b: content_hash_batch(b, text_col), batch_format="pyarrow")
    return (hashed.select_columns([id_col, "content_hash"])
            .groupby("content_hash")
            .aggregate(agg.Min(id_col, alias_name="keep_id")))


# ------------------------------------------------------------- shingles

_ROLL_P1 = np.uint32(2654435761)      # Knuth multipliers, two independent
_ROLL_P2 = np.uint32(2246822519)      # 32-bit lanes -> one 64-bit shingle id


def shingle_set(text: str, k: int = 5) -> np.ndarray:
    """Byte k-shingle hash set (sorted unique uint64), fully vectorized.

    Each window is hashed by two independent 32-bit polynomial rolling
    hashes (natural uint32 wraparound, no modulo) packed into a uint64 --
    2^64 id space, so cross-shingle collisions are negligible and Jaccard
    over the id sets equals Jaccard over the shingles.  Replaces a
    blake2b-per-shingle Python loop (50x at 1 kB docs)."""
    b = np.frombuffer(text.encode(), dtype=np.uint8)
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64)
    if len(b) < k:
        win = b[None, :]
    else:
        win = np.lib.stride_tricks.sliding_window_view(b, k)
    w = win.astype(np.uint32)
    h1 = np.zeros(len(w), dtype=np.uint32)
    h2 = np.zeros(len(w), dtype=np.uint32)
    for col in range(w.shape[1]):
        h1 = h1 * _ROLL_P1 + w[:, col]
        h2 = h2 * _ROLL_P2 + (w[:, col] ^ np.uint32(0xA5))
    hs = (h1.astype(np.uint64) << np.uint64(32)) | h2.astype(np.uint64)
    return np.unique(hs)


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = np.intersect1d(a, b, assume_unique=True)
    union = len(a) + len(b) - len(inter)
    return len(inter) / union if union else 1.0


# -------------------------------------------------------------- minhash

_MERSENNE = np.uint64((1 << 61) - 1)


def _perm_params(n_perm: int, seed: int = 17):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 61, size=n_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 1 << 61, size=n_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: np.ndarray, n_perm: int = 64,
                      seed: int = 17, params=None) -> np.ndarray:
    """(a*x + b) mod p universal-hash minhash, vectorized over shingles.
    Pass ``params`` (from :func:`_perm_params`) in hot loops to avoid
    re-deriving the identical seeded arrays per document."""
    a, b = params if params is not None else _perm_params(n_perm, seed)
    if len(shingles) == 0:
        return np.full(n_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    with np.errstate(over="ignore"):
        # (n_perm, n_shingles) in uint64 modular arithmetic
        prod = (shingles[None, :] * a[:, None] + b[:, None]) % _MERSENNE
    return prod.min(axis=1)


def minhash_lsh_pairs(docs_ds, id_col: str = "doc_id",
                      text_col: str = "text", n_perm: int = 64,
                      bands: int = 16, k: int = 5,
                      threshold: float = 0.8, est_slack: float = 0.15):
    """Near-dup pairs by banded minhash, signature-verified in-bucket and
    exact-Jaccard verified in a final candidates-only pass.

    Scale design: what moves through the band-bucket shuffle is the FIXED
    512-byte signature, never the document text (shipping text to every
    band multiplies shuffle volume by ``bands``).  In-bucket, Jaccard is
    estimated from the signatures (unbiased, stderr ~ sqrt(t(1-t)/n_perm));
    pairs estimated above ``threshold - est_slack`` become candidates, and
    only those few pairs get their texts re-read (column-pruned second
    pass over the docs table) for an exact-Jaccard filter at ``threshold``.
    Returns a Dataset of (id_a, id_b, jaccard) with id_a < id_b."""
    import ray
    import ray.data
    import ray.data.aggregate as agg

    rows_per_band = n_perm // bands

    id_type = docs_ds.schema().types[docs_ds.schema().names.index(id_col)]

    def sig_buckets(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        params = _perm_params(n_perm)          # once per batch, not per doc
        out_bucket, out_id, out_sig = [], [], []
        for i, text in zip(ids, texts):
            sig = minhash_signature(shingle_set(text, k), n_perm,
                                    params=params)
            for band in range(bands):
                chunk = sig[band * rows_per_band:(band + 1) * rows_per_band]
                digest = hashlib.blake2b(chunk.tobytes(),
                                         digest_size=8).digest()
                bucket = (band << 56) ^ (int.from_bytes(digest, "big") >> 8)
                out_bucket.append(np.int64(bucket - (1 << 62)))
                out_id.append(i)
                out_sig.append(sig.view(np.int64))
        return pa.table({
            "bucket": pa.array(out_bucket, pa.int64()),
            "doc_id": pa.array(out_id, id_type),
            "sig": pa.array([s.tolist() for s in out_sig],
                            pa.list_(pa.int64(), n_perm))})

    est_floor = threshold - est_slack

    def estimate_group(group: pa.Table) -> pa.Table:
        ids = np.asarray(group.column("doc_id").to_pylist())
        out = {"id_a": [], "id_b": [], "est": []}
        if len(ids) > 1:
            sigs = np.array(group.column("sig").to_pylist(), dtype=np.int64)
            order = np.argsort(ids, kind="stable")
            ids, sigs = ids[order], sigs[order]
            for a in range(len(ids)):
                eq = (sigs[a + 1:] == sigs[a]).mean(axis=1)
                hit = np.nonzero((eq >= est_floor)
                                 & (ids[a + 1:] != ids[a]))[0]
                for h in hit:
                    out["id_a"].append(ids[a])
                    out["id_b"].append(ids[a + 1 + h])
                    out["est"].append(float(eq[h]))
        return pa.table({"id_a": pa.array(list(out["id_a"]), id_type),
                         "id_b": pa.array(list(out["id_b"]), id_type),
                         "est": pa.array(out["est"], pa.float64())})

    # materialized: candidate-pair scale (bounded by output size), and any
    # later schema()/to_arrow_refs call would otherwise re-execute the
    # whole LSH chain a second time
    cand = (docs_ds.map_batches(sig_buckets, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(estimate_group, batch_format="pyarrow")
            .groupby(["id_a", "id_b"])
            .aggregate(agg.Max("est", alias_name="est"))
            .materialize())

    # Candidates-only exact verify, distributed: no document TEXT (or
    # shingle dict) ever lands on the driver.  Only the candidate pair id
    # list (~24 B/pair, bounded by output size) is pulled -- to broadcast
    # the semi-join id filter and to avoid re-executing the LSH DAG.
    # Shingle sets are computed in a column-pruned second pass over the
    # docs table and meet their pairs through two candidate-scale joins.
    ctabs = [t for t in ray.get(
        cand.select_columns(["id_a", "id_b"]).materialize().to_arrow_refs()) if t.num_rows]
    empty = pa.table({"id_a": pa.array([], id_type),
                      "id_b": pa.array([], id_type),
                      "jaccard": pa.array([], pa.float64())})
    if not ctabs:
        return ray.data.from_arrow(empty)
    ctab = pa.concat_tables(ctabs).combine_chunks()
    import logging

    import pyarrow.compute as pc

    need = pc.unique(pa.concat_arrays(
        [ctab.column("id_a").combine_chunks(),
         ctab.column("id_b").combine_chunks()]))
    logging.getLogger(__name__).info(
        "minhash_lsh: %d candidate pairs over %d docs to exact-verify",
        ctab.num_rows, len(need))
    need_ref = ray.put(need)

    def shingles_for_needed(batch: pa.Table) -> pa.Table:
        keep = batch.filter(pc.is_in(batch.column(id_col),
                                     value_set=ray.get(need_ref)))
        # raw little-endian uint64 bytes: Arrow's hash join supports binary
        # payload columns but not list<int64>
        shs = [shingle_set(t, k).tobytes()
               for t in keep.column(text_col).to_pylist()]
        return pa.table({
            id_col: keep.column(id_col),
            "sh": pa.array(shs, pa.binary())})

    # candidate-doc-scale intermediate; materialize so the two join probes
    # below don't re-scan (and re-shingle) the full docs table twice
    sh_ds = (docs_ds.select_columns([id_col, text_col])
             .map_batches(shingles_for_needed, batch_format="pyarrow")
             .materialize())

    # explicit projection, not rename_columns: rename can emit zero-row
    # blocks with the ORIGINAL schema, and mixed-schema bundles make the
    # join's hash-shuffle aggregator fail with ArrowInvalid on concat
    def _project(ident, sh):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table({ident: b.column(id_col), sh: b.column("sh")})
        return fn

    sh_a = sh_ds.map_batches(_project("id_a", "sh_a"),
                             batch_format="pyarrow")
    sh_b = sh_ds.map_batches(_project("id_b", "sh_b"),
                             batch_format="pyarrow")

    def exact_verify(batch: pa.Table) -> pa.Table:
        out = {"id_a": [], "id_b": [], "jaccard": []}
        for a, b, sa, sb in zip(batch.column("id_a").to_pylist(),
                                batch.column("id_b").to_pylist(),
                                batch.column("sh_a").to_pylist(),
                                batch.column("sh_b").to_pylist()):
            j = jaccard(np.frombuffer(sa, dtype=np.uint64),
                        np.frombuffer(sb, dtype=np.uint64))
            if j >= threshold:
                out["id_a"].append(a)
                out["id_b"].append(b)
                out["jaccard"].append(j)
        return pa.table({"id_a": pa.array(out["id_a"], id_type),
                         "id_b": pa.array(out["id_b"], id_type),
                         "jaccard": pa.array(out["jaccard"], pa.float64())})

    # partition count tracks candidate volume: tiny candidate sets don't
    # pay 2x8 shuffle-aggregator actors, huge ones still spread out
    nparts = max(2, min(64, ctab.num_rows // 50_000 + 2))
    pairs = ray.data.from_arrow(ctab)
    return (pairs
            .join(sh_a, "inner", num_partitions=nparts, on=("id_a",))
            .join(sh_b, "inner", num_partitions=nparts, on=("id_b",))
            .map_batches(exact_verify, batch_format="pyarrow"))


# -------------------------------------------------------------- simhash

def simhash64(text: str, k: int = 5) -> int:
    sh = shingle_set(text, k)
    if len(sh) == 0:
        return 0
    bits = ((sh[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    value = 0
    for i in range(64):
        if votes[i] > 0:
            value |= (1 << i)
    return value - (1 << 64) if value >= (1 << 63) else value


def hash64_dup_pairs(ds, id_col: str, hash_col: str,
                     max_hamming: int = 3):
    """Near-dup pairs over ANY int64 64-bit hash column (simhash, image
    phash, audio fingerprint): bucket on each of 4 16-bit chunks
    (pigeonhole: hamming <= 3 implies at least one identical chunk), then
    exact-Hamming verify in-bucket.  One shuffle keyed by (chunk, bits)
    carrying 16 B/row/chunk; the in-bucket verify is a vectorized
    XOR + popcount matrix bounded by bucket size.  Returns (id_a, id_b,
    hamming) with id_a < id_b."""
    if max_hamming > 3:
        raise ValueError("4x16-bit pigeonhole only guarantees recall for "
                         f"hamming <= 3, got {max_hamming}")

    schema = ds.schema()
    id_type = schema.types[schema.names.index(id_col)]

    def to_buckets(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             id_col: batch.column(id_col),
                             hash_col: batch.column(hash_col)})
        h = batch.column(hash_col).to_numpy().astype(np.int64) \
            .view(np.uint64)
        ids = batch.column(id_col).combine_chunks() \
            if isinstance(batch.column(id_col), pa.ChunkedArray) \
            else batch.column(id_col)
        hs = batch.column(hash_col).combine_chunks() \
            if isinstance(batch.column(hash_col), pa.ChunkedArray) \
            else batch.column(hash_col)
        buckets, id_out, h_out = [], [], []
        for c in range(4):
            chunk = ((h >> np.uint64(16 * c))
                     & np.uint64(0xFFFF)).astype(np.int64)
            buckets.append((np.int64(c) << np.int64(16)) | chunk)
            id_out.append(ids)
            h_out.append(hs)
        return pa.table({"bucket": pa.array(np.concatenate(buckets)),
                         id_col: pa.concat_arrays(id_out),
                         hash_col: pa.concat_arrays(h_out)})

    # 16-bit popcount LUT (64 KB, built once per task): 4 flat 2-D
    # gathers per block beat both an unpackbits tensor (64 B/pair) and a
    # 3-D uint8 LUT gather (whose fancy-index path is ~100x slower)
    popcnt16 = np.unpackbits(
        np.arange(1 << 16, dtype=np.uint16).view(np.uint8)[:, None],
        axis=1).astype(np.uint16).reshape(1 << 16, 16).sum(axis=1) \
        .astype(np.uint8)

    def verify_group(group: pa.Table) -> pa.Table:
        ids = np.asarray(group.column(id_col).to_pylist())
        hashes = np.array(group.column(hash_col).to_pylist(),
                          dtype=np.int64).view(np.uint64)
        # this bucket's chunk index: a near pair collides in EVERY chunk
        # where its hashes agree, so the pair is owned by (emitted from)
        # only the FIRST such chunk -- globally exactly-once output with
        # no cross-bucket dedup aggregate afterwards
        chunk = int(group.column("bucket")[0].as_py()) >> 16
        order = np.argsort(ids, kind="stable")
        ids, hashes = ids[order], hashes[order]
        n = len(ids)
        outs = []
        # row-blocked: peak memory is O(block * n) whatever the bucket
        # skew (a low-entropy 16-bit chunk -- e.g. the all-zero plane of
        # uniform images -- can concentrate a large share of the rows
        # into one bucket)
        blk = max(1, min(n, (1 << 22) // max(n, 1)))   # ~32 MB peak
        for r0 in range(0, n, blk):
            r1 = min(n, r0 + blk)
            x = hashes[r0:r1, None] ^ hashes[None, :]
            v = x.view(np.uint16).reshape(r1 - r0, n, 4)
            dist = popcnt16[v[:, :, 0]].astype(np.int16)
            for kk in range(1, 4):
                dist += popcnt16[v[:, :, kk]]
            hit = dist <= max_hamming
            for cp in range(chunk):        # an earlier chunk owns these
                hit &= v[:, :, cp] != 0
            # strict upper triangle in GLOBAL index space + distinct ids
            cols = np.arange(n)[None, :]
            hit &= cols > np.arange(r0, r1)[:, None]
            hit &= ids[r0:r1, None] != ids[None, :]
            ia, ib = np.nonzero(hit)
            outs.append((ids[r0 + ia], ids[ib],
                         dist[ia, ib].astype(np.int64)))
        if outs:
            a = np.concatenate([o[0] for o in outs])
            b = np.concatenate([o[1] for o in outs])
            d = np.concatenate([o[2] for o in outs])
        else:
            a = b = np.empty(0, dtype=object)
            d = np.empty(0, dtype=np.int64)
        return pa.table({"id_a": pa.array(a.tolist(), id_type),
                         "id_b": pa.array(b.tolist(), id_type),
                         "hamming": pa.array(d, pa.int64())})

    return (ds.map_batches(to_buckets, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(verify_group, batch_format="pyarrow"))


def simhash_pairs(docs_ds, id_col: str = "doc_id", text_col: str = "text",
                  max_hamming: int = 3, k: int = 5):
    """Near-dup pairs by text simhash: per-doc 64-bit simhash, then the
    generic :func:`hash64_dup_pairs` pigeonhole bucket + exact verify."""

    def add_hash(b: pa.Table) -> pa.Table:
        hs = [simhash64(t, k) for t in b.column(text_col).to_pylist()]
        return pa.table({id_col: b.column(id_col),
                         "simhash": pa.array(hs, pa.int64())})

    hashed = docs_ds.map_batches(add_hash, batch_format="pyarrow")
    return hash64_dup_pairs(hashed, id_col, "simhash", max_hamming)


# ------------------------------------------------ exact n-gram Jaccard

def ngram_jaccard_pairs(docs_ds, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 3,
                        threshold: float = 0.8,
                        max_df: int | None = None):
    """EXACT n-gram Jaccard near-dup pairs via a shingle inverted index
    (the non-approximate sibling of :func:`minhash_lsh_pairs`).

    Shape: per-doc distinct word n-gram shingles fan out as posting rows
    keyed by a 128-bit shingle digest (the shuffle ships 24 B of ints
    per posting, never the shingle string); ONE shuffle groups postings
    into ~``n_buckets`` coarse hash buckets (large vectorizable groups
    instead of one tiny group per shingle); inside a bucket, equal-digest
    runs are found with a single lexsort and each run expands to its
    co-occurring id pairs (cost sum(df^2), bounded per shingle); pair
    counts are combined NUMPY-side (lexsort + run-length inside each
    bucket task, then one coarse pair-bucket shuffle with a vectorized
    final combine -- a Ray ``groupby(pair)`` would pay per-group Python
    overhead on millions of groups, measured ~100k groups/s); the summed
    count is the intersection size, and
    ``|A inter B| / (|A| + |B| - |A inter B|)`` is exact -- no candidate
    can be missed because any pair above ``threshold > 0`` shares at
    least one shingle (128-bit digests make hash merges of distinct
    shingles a non-event, ~1e-27 at 1e6 shingles).  No doc text moves
    after stage 1 and no task ever holds more than one bucket.

    ``max_df`` (off by default, keeping the operator exact) drops
    stopword-shingles with document frequency above the cap before pair
    expansion -- the standard guard against the df^2 blowup on hot
    shingles at corpus scale; dropped shingles can only lower recall for
    pairs whose ONLY shared shingles are hot ones.

    Returns a Dataset of (id_a, id_b, jaccard) with id_a < id_b.
    """
    schema = docs_ds.schema()
    id_type = schema.types[schema.names.index(id_col)]
    n_buckets = 1024
    n_pair_buckets = 512

    def _codes(arr):
        if arr.dtype == object:        # string ids: lexsort needs codes
            return np.unique(arr, return_inverse=True)[1]
        return arr

    def _pair_bucket(a, b):
        if a.dtype != object:
            return ((a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                    ^ b.astype(np.uint64)) % np.uint64(n_pair_buckets)
        return np.array([int.from_bytes(
            hashlib.blake2b(f"{x}\x00{y}".encode(),
                            digest_size=8).digest(), "big")
            % n_pair_buckets for x, y in zip(a, b)], np.uint64)

    def _combine_pairs(A, B, SH, NA, NB):
        """Sum shared-counts of duplicate (A, B) pairs; vectorized."""
        ca, cb = _codes(A), _codes(B)
        order = np.lexsort((cb, ca))
        A, B, SH, NA, NB = (A[order], B[order], SH[order],
                            NA[order], NB[order])
        ca, cb = ca[order], cb[order]
        new = (ca[1:] != ca[:-1]) | (cb[1:] != cb[:-1])
        starts = np.flatnonzero(np.r_[True, new])
        shared = np.add.reduceat(SH, starts)
        return A[starts], B[starts], shared, NA[starts], NB[starts]

    def shingle_rows(b: pa.Table) -> pa.Table:
        ids, h1s, h2s, out_ns = [], [], [], []
        idv = b.column(id_col).to_pylist()
        for i, t in enumerate(b.column(text_col).to_pylist()):
            words = t.split(" ")
            sh = {" ".join(words[j:j + n])
                  for j in range(len(words) - n + 1)}
            for s in sh:
                d = hashlib.blake2b(s.encode(), digest_size=16).digest()
                h1s.append(int.from_bytes(d[:8], "big", signed=True))
                h2s.append(int.from_bytes(d[8:], "big", signed=True))
            ids.extend([idv[i]] * len(sh))
            out_ns.extend([len(sh)] * len(sh))
        h1 = np.asarray(h1s, np.int64)
        return pa.table({"bucket": pa.array(h1 % n_buckets, pa.int64()),
                         "h1": pa.array(h1, pa.int64()),
                         "h2": pa.array(h2s, pa.int64()),
                         "_id": pa.array(ids, id_type),
                         "ns": pa.array(out_ns, pa.int64())})

    _pairs_empty = pa.table({"pbucket": pa.array([], pa.uint64()),
                             "id_a": pa.array([], id_type),
                             "id_b": pa.array([], id_type),
                             "shared": pa.array([], pa.int64()),
                             "na": pa.array([], pa.int64()),
                             "nb": pa.array([], pa.int64())})

    def expand_postings(g: pa.Table) -> pa.Table:
        if g.num_rows < 2:
            return _pairs_empty
        h1 = g.column("h1").to_numpy(zero_copy_only=False)
        h2 = g.column("h2").to_numpy(zero_copy_only=False)
        ids = g.column("_id").to_numpy(zero_copy_only=False)
        ns = g.column("ns").to_numpy(zero_copy_only=False)
        order = np.lexsort((_codes(ids), h2, h1))
        h1, h2, ids, ns = h1[order], h2[order], ids[order], ns[order]
        new = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        starts = np.flatnonzero(np.r_[True, new])
        ends = np.r_[starts[1:], len(h1)]
        out_a, out_b, out_na, out_nb = [], [], [], []
        for s, e in zip(starts, ends):
            df = e - s
            if df < 2 or (max_df is not None and df > max_df):
                continue
            ia, ib = np.triu_indices(df, k=1)
            out_a.append(ids[s:e][ia])
            out_b.append(ids[s:e][ib])
            out_na.append(ns[s:e][ia])
            out_nb.append(ns[s:e][ib])
        if not out_a:
            return _pairs_empty
        A, B, SH, NA, NB = _combine_pairs(
            np.concatenate(out_a), np.concatenate(out_b),
            np.ones(sum(len(x) for x in out_a), np.int64),
            np.concatenate(out_na), np.concatenate(out_nb))
        return pa.table({"pbucket": pa.array(_pair_bucket(A, B),
                                             pa.uint64()),
                         "id_a": pa.array(A, id_type),
                         "id_b": pa.array(B, id_type),
                         "shared": pa.array(SH, pa.int64()),
                         "na": pa.array(NA, pa.int64()),
                         "nb": pa.array(NB, pa.int64())})

    def finish_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], id_type),
                          "id_b": pa.array([], id_type),
                          "jaccard": pa.array([], pa.float64())})
        if g.num_rows == 0:
            return empty
        A, B, SH, NA, NB = _combine_pairs(
            g.column("id_a").to_numpy(zero_copy_only=False),
            g.column("id_b").to_numpy(zero_copy_only=False),
            g.column("shared").to_numpy(zero_copy_only=False),
            g.column("na").to_numpy(zero_copy_only=False),
            g.column("nb").to_numpy(zero_copy_only=False))
        jac = SH.astype(np.float64) / (NA + NB - SH).astype(np.float64)
        keep = np.flatnonzero(jac >= threshold)
        return pa.table({"id_a": pa.array(A[keep], id_type),
                         "id_b": pa.array(B[keep], id_type),
                         "jaccard": pa.array(jac[keep], pa.float64())})

    return (docs_ds.select_columns([id_col, text_col])
            .map_batches(shingle_rows, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(expand_postings, batch_format="pyarrow")
            .groupby("pbucket")
            .map_groups(finish_bucket, batch_format="pyarrow"))


# --------------------------------------------------- embedding near-dup

def cosine_pairs_exact(emb_ds, id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       threshold: float = 0.45, batch_size: int = 4096):
    """Exact cosine-similarity self-join: all (id_a < id_b) pairs with
    cosine >= threshold.

    Broadcast-join shape: the full unit-normalized matrix is shipped to
    the object store ONCE (``ray.put``) and every batch matmuls against it
    -- valid whenever one side fits in worker memory (the small-side
    broadcast rule).  At 10^12-row scale use :func:`embedding_dup_pairs`
    (LSH-bucketed, no O(n^2) stage); this exact variant doubles as the
    recall oracle for it in tests.
    """
    import ray

    tabs = ray.get(emb_ds.select_columns([id_col, vec_col]).materialize().to_arrow_refs())
    tabs = [t for t in tabs if t.num_rows]
    if not tabs:
        import ray.data

        return ray.data.from_arrow(pa.table(
            {"id_a": pa.array([], pa.int64()),
             "id_b": pa.array([], pa.int64()),
             "cosine": pa.array([], pa.float64())}))
    full = pa.concat_tables(tabs)
    all_ids = np.asarray(full.column(id_col).to_pylist(), dtype=np.int64)
    all_unit = _unit_rows(np.array(full.column(vec_col).to_pylist(),
                                   dtype=np.float64).reshape(len(full), -1))
    bcast = ray.put((all_ids, all_unit))

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        ids_g, unit_g = ray.get(bcast)
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        unit = _unit_rows(np.array(batch.column(vec_col).to_pylist(),
                                   dtype=np.float64).reshape(batch.num_rows,
                                                             -1))
        sims = unit @ unit_g.T                          # (batch, n)
        hit = (sims >= threshold) & (ids[:, None] < ids_g[None, :])
        ia, ib = np.nonzero(hit)
        return pa.table({"id_a": pa.array(ids[ia], pa.int64()),
                         "id_b": pa.array(ids_g[ib], pa.int64()),
                         "cosine": pa.array(sims[ia, ib], pa.float64())})

    return emb_ds.map_batches(fn, batch_format="pyarrow",
                              batch_size=batch_size)


def _unit_rows(mat: np.ndarray) -> np.ndarray:
    from .ann import _unit

    return _unit(mat)


def embedding_dup_pairs(emb_ds, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        threshold: float = 0.95, n_planes: int = 8,
                        n_bands: int = 8, seed: int = 23):
    """Cosine near-dup pairs via banded random-hyperplane LSH + exact
    verify.

    ``n_bands`` independent hash tables of ``n_planes`` hyperplanes each
    (AND within a band, OR across bands): a pair at angle theta collides in
    one band with p = (1 - theta/pi)^n_planes, overall recall
    1 - (1 - p)^n_bands.  Tune n_planes up for tight thresholds (selective
    buckets), n_bands up for recall; precision is always 1 because every
    candidate is cosine-verified.  One shuffle keyed by (band, signbits)."""

    schema = emb_ds.schema()
    id_type = schema.types[schema.names.index(id_col)]

    def bucketize(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             id_col: batch.column(id_col),
                             vec_col: batch.column(vec_col)})
        from .ann import _vec_matrix

        vecs = _vec_matrix(batch.column(vec_col))
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((vecs.shape[1], n_bands * n_planes))
        signs = (vecs @ planes) > 0                     # (n, bands*planes)
        weights = (1 << np.arange(n_planes, dtype=np.int64))
        buckets, ids, vecs_out = [], [], []
        id_arr = batch.column(id_col)
        vec_arr = batch.column(vec_col)
        for b in range(n_bands):
            bits = signs[:, b * n_planes:(b + 1) * n_planes] @ weights
            buckets.append((np.int64(b) << 48) | bits.astype(np.int64))
            ids.append(id_arr)
            vecs_out.append(vec_arr)
        return pa.table({
            "bucket": pa.array(np.concatenate(buckets)),
            id_col: pa.concat_arrays(
                [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
                 for a in ids]),
            vec_col: pa.concat_arrays(
                [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
                 for a in vecs_out])})

    def verify_group(group: pa.Table) -> pa.Table:
        ids = np.array(group.column(id_col).to_pylist())
        from .ann import _vec_matrix

        vecs = _vec_matrix(group.column(vec_col))
        out = {"id_a": [], "id_b": [], "cosine": []}
        if len(ids) > 1:
            norms = np.linalg.norm(vecs, axis=1)
            norms[norms == 0] = 1.0
            unit = vecs / norms[:, None]
            sims = unit @ unit.T
            ia, ib = np.where(np.triu(sims >= threshold, k=1))
            for a, b in zip(ia, ib):
                # preserve the id column's dtype (a string vec_id must not
                # be forced through int()); order the pair id_a < id_b
                lo, hi = sorted((ids[a].item() if hasattr(ids[a], "item")
                                 else ids[a],
                                 ids[b].item() if hasattr(ids[b], "item")
                                 else ids[b]))
                out["id_a"].append(lo)
                out["id_b"].append(hi)
                out["cosine"].append(float(sims[a, b]))
        return pa.table({"id_a": pa.array(out["id_a"], id_type),
                         "id_b": pa.array(out["id_b"], id_type),
                         "cosine": pa.array(out["cosine"], pa.float64())})

    import ray.data.aggregate as agg

    # a pair can collide in several bands -> dedup by (id_a, id_b)
    return (emb_ds.map_batches(bucketize, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(verify_group, batch_format="pyarrow")
            .groupby(["id_a", "id_b"])
            .aggregate(agg.Max("cosine", alias_name="cosine")))


# -------------------------------------------- cross-doc substring windows

_WIN_K1 = np.uint64(0x9E3779B97F4A7C15)   # splitmix64 golden gamma (odd)
_WIN_K2 = np.uint64(0xC2B2AE3D27D4EB4F)   # xxhash64 prime 2 (odd)


def dup_window_counts(docs_ds, id_col: str = "doc_id",
                      text_col: str = "text", *, win: int = 8,
                      num_partitions: int | None = None):
    """Exact cross-document duplicated-substring detection -- the role the
    suffix-array substring dedup plays in LLM corpus prep (Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better"):
    for every document, count the token positions whose ``win``-token
    window also occurs in at least one OTHER document.  Returns a
    Dataset of ``(doc_id, dup_windows)`` for docs with >= 1 such window.

    Scale shape: window TEXT never ships.  Each window is keyed by a
    128-bit id -- two independent 64-bit Horner polynomial mixes (odd
    multipliers, natural uint64 wraparound) over per-token blake2b-64
    hashes -- so equal token sequences always collide and unequal ones
    collide with probability ~2^-128 per pair.  Window extraction is
    vectorized: ``win`` shifted multiply-adds over the whole batch's
    token-hash array, then one ``np.unique(axis=0)`` collapses repeated
    (window, doc) pairs in-block, so the exchange carries ~28 B per
    DISTINCT (window, doc) pair.  Because each document is one row, a
    (window, doc) pair can never span blocks -- the in-block collapse is
    globally exact and within a window-hash partition the row count per
    window IS its distinct-document frequency.  The frequency test and
    the per-doc position sums are FUSED into one window-hash-partitioned
    ``map_groups`` pass (lexsort + run-length boundaries, fully
    vectorized): one window-keyed exchange instead of the naive
    groupby + hash-join-back + re-groupby plan (three exchanges; 6x
    slower measured at sf0.1).  Window ids are uniform by construction,
    so the partitioning is skew-free even when one hot phrase dominates
    the corpus; the final ``groupby(doc_id)`` sums doc-cardinality-
    bounded partials.
    """
    import ray.data.aggregate as agg

    if win < 2:
        raise ValueError("win must be >= 2")
    if num_partitions is None:
        # ~2k docs (0.1-0.6 M window rows) per partition; metadata-only
        # count on a parquet read.  Multi-node: cap at cluster cores.
        num_partitions = max(2, min(1024, docs_ds.count() // 2_000 + 2))
    n_parts = np.uint64(num_partitions)

    def explode(b: pa.Table) -> pa.Table:
        memo: dict[str, int] = {}

        def tok64(t: str) -> int:
            h = memo.get(t)
            if h is None:
                h = int.from_bytes(hashlib.blake2b(
                    t.encode(), digest_size=8).digest(), "big")
                memo[t] = h
            return h

        ids = b.column(id_col).to_numpy()
        w1s, w2s, docs = [], [], []
        for i, text in enumerate(b.column(text_col).to_pylist()):
            toks = text.split(" ")
            n = len(toks) - win + 1
            if n <= 0:
                continue
            h = np.fromiter((tok64(t) for t in toks), np.uint64, len(toks))
            w1 = np.zeros(n, np.uint64)
            w2 = np.zeros(n, np.uint64)
            for j in range(win):          # Horner over the window
                seg = h[j:j + n]
                w1 = w1 * _WIN_K1 + seg
                w2 = w2 * _WIN_K2 + seg
            w1s.append(w1)
            w2s.append(w2)
            docs.append(np.full(n, ids[i], np.uint64))
        if not docs:
            return pa.table({"part": pa.array([], pa.int64()),
                             "w1": pa.array([], pa.int64()),
                             "w2": pa.array([], pa.int64()),
                             id_col: pa.array([], b.schema.field(id_col).type),
                             "n_occ": pa.array([], pa.int64())})
        trip = np.stack([np.concatenate(w1s), np.concatenate(w2s),
                         np.concatenate(docs)], axis=1)
        uniq, cnt = np.unique(trip, axis=0, return_counts=True)
        return pa.table({
            "part": pa.array((uniq[:, 0] % n_parts).view(np.int64),
                             pa.int64()),
            "w1": pa.array(uniq[:, 0].view(np.int64), pa.int64()),
            "w2": pa.array(uniq[:, 1].view(np.int64), pa.int64()),
            id_col: pa.array(uniq[:, 2].astype(np.int64)).cast(
                b.schema.field(id_col).type),
            "n_occ": pa.array(cnt.astype(np.int64), pa.int64())})

    def doc_partials(group: pa.Table) -> pa.Table:
        """One window-hash partition: run-length window frequencies +
        per-doc dup-position partial sums, all vectorized."""
        w1 = group.column("w1").to_numpy()
        w2 = group.column("w2").to_numpy()
        if len(w1) == 0:
            return pa.table({
                id_col: pa.array([], group.schema.field(id_col).type),
                "n_occ": pa.array([], pa.int64())})
        order = np.lexsort((w2, w1))
        sw1, sw2 = w1[order], w2[order]
        new = np.empty(len(sw1), bool)
        new[0] = True
        new[1:] = (sw1[1:] != sw1[:-1]) | (sw2[1:] != sw2[:-1])
        seg = np.cumsum(new) - 1                 # window index per row
        nd = np.bincount(seg)                    # rows/window == distinct docs
        dup_rows = order[nd[seg] >= 2]           # original-index selection
        if len(dup_rows) == 0:
            return pa.table({
                id_col: pa.array([], group.schema.field(id_col).type),
                "n_occ": pa.array([], pa.int64())})
        sub = group.take(pa.array(dup_rows, pa.int64()))
        docs = sub.column(id_col).to_numpy()
        occ = sub.column("n_occ").to_numpy()
        ud, inv = np.unique(docs, return_inverse=True)
        sums = np.bincount(inv, weights=occ).astype(np.int64)
        return pa.table({
            id_col: pa.array(ud).cast(group.schema.field(id_col).type),
            "n_occ": pa.array(sums, pa.int64())})

    return (docs_ds.select_columns([id_col, text_col])
            .map_batches(explode, batch_format="pyarrow")
            .groupby("part")
            .map_groups(doc_partials, batch_format="pyarrow")
            .groupby(id_col)
            .aggregate(agg.Sum("n_occ", alias_name="dup_windows")))


# ------------------------------------------------ edit distance <= 1

def _lev1_dist(a: str, b: str) -> int:
    """Exact Levenshtein distance for candidate pairs already known to be
    close, returning 0, 1 or 2 (2 = "more than 1").  Equal lengths: one
    edit preserving length must be a substitution, so dist<=1 iff the
    strings differ at at most one position.  Length gap 1: dist==1 iff
    the shorter is the longer minus one char, i.e. common prefix +
    common suffix covers the shorter.  Larger gaps: >= 2."""
    la, lb = len(a), len(b)
    if la == lb:
        diff = sum(1 for x, y in zip(a, b) if x != y)
        return diff if diff <= 1 else 2
    if abs(la - lb) != 1:
        return 2
    if la > lb:
        a, b = b, a
        la, lb = lb, la
    p = 0
    while p < la and a[p] == b[p]:
        p += 1
    s = 0
    while s < la - p and a[la - 1 - s] == b[lb - 1 - s]:
        s += 1
    return 1 if p + s >= la else 2


def _deletion_keys(s: str) -> list[str]:
    """FastSS k=1 neighborhood: the string itself plus every
    single-character deletion.  lev(a, b) <= 1 implies keys(a) and
    keys(b) intersect (substitution: delete the differing position from
    both; indel: deleting the inserted char from the longer yields the
    shorter; equal: the string itself)."""
    return [s] + [s[:i] + s[i + 1:] for i in range(len(s))]


def edit_distance_pairs(ds, id_col: str, str_col: str):
    """All pairs of rows whose ``str_col`` values are within Levenshtein
    distance 1 (FastSS, Bocek et al. 2007, "Fast Similarity Search in
    Large Dictionaries") -- the typo/near-id dedup role over SHORT
    strings (names, titles, normalized URLs; document texts belong in
    the minhash family instead, since the key exchange here ships
    ~len(s) copies of each string).

    Scale shape: candidate generation is a deletion-neighborhood
    explode -- each row emits len(s)+1 ``(dkey, id, s)`` rows -- and ONE
    shuffle keyed by ``dkey`` groups candidates; the in-bucket verify is
    the exact distance test above.  Shared keys are intersection-checked
    pairwise so each surviving pair is emitted from exactly ONE bucket
    (its lexicographically smallest shared key) -- globally exactly-once
    with no second dedup shuffle, mirroring the first-agreeing-chunk
    ownership rule of :func:`hash64_dup_pairs`.  Returns
    ``(id_a, id_b, dist)`` with ``id_a < id_b``."""
    schema = ds.schema()
    id_type = schema.types[schema.names.index(id_col)]

    def explode(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_pylist()
        ss = b.column(str_col).to_pylist()
        dk, io, so = [], [], []
        for i, s in zip(ids, ss):
            ks = _deletion_keys(s)
            dk.extend(ks)
            io.extend([i] * len(ks))
            so.extend([s] * len(ks))
        return pa.table({"dkey": pa.array(dk, pa.string()),
                         id_col: pa.array(io, id_type),
                         str_col: pa.array(so, pa.string())})

    def verify_group(group: pa.Table) -> pa.Table:
        out_a, out_b, out_d = [], [], []
        if group.num_rows >= 2:
            key = group.column("dkey")[0].as_py()
            ids = group.column(id_col).to_pylist()
            ss = group.column(str_col).to_pylist()
            rows = sorted(set(zip(ids, ss)))
            # one key set per distinct row, not per pair (the in-bucket
            # verify is quadratic in bucket size already)
            keysets = [frozenset(_deletion_keys(s)) for _, s in rows]
            for i in range(len(rows)):
                for j in range(i + 1, len(rows)):
                    ia, sa = rows[i]
                    ib, sb = rows[j]
                    if ia == ib:
                        continue
                    d = _lev1_dist(sa, sb)
                    if d > 1:
                        continue
                    # exactly-once: the smallest shared key owns the pair
                    if min(keysets[i] & keysets[j]) == key:
                        out_a.append(ia)
                        out_b.append(ib)
                        out_d.append(d)
        return pa.table({"id_a": pa.array(out_a, id_type),
                         "id_b": pa.array(out_b, id_type),
                         "dist": pa.array(out_d, pa.int64())})

    return (ds.select_columns([id_col, str_col])
            .map_batches(explode, batch_format="pyarrow")
            .groupby("dkey")
            .map_groups(verify_group, batch_format="pyarrow"))
