"""Fixed-size-partial sketches: KMV distinct counting, histogram
quantiles, and Misra-Gries heavy hitters (the latter made EXACT by a
candidate recount pass).

The reference has no sketch/approx aggregates at all (SURVEY.md §2.3);
at 100 TB an exact ``count(distinct)`` over a high-cardinality key is a
full shuffle of every distinct value, while a KMV sketch moves a FIXED
``k * 8`` bytes per block regardless of input size: each block keeps its
k smallest 64-bit hash values, partials merge by keeping the k smallest
of the union, and the estimator is ``(k - 1) / t`` where ``t`` is the
k-th smallest hash mapped to (0, 1)  (Bar-Yossef et al. 2002, the
standard KMV estimator).  Deterministic: same input -> same estimate.

Relative error ~ 1/sqrt(k); k = 1024 gives ~3%.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_FULL = np.float64((1 << 64) - 1)
_MULT = np.uint64(0x9E3779B97F4A7C15)        # Fibonacci multiplier


def _hash64(values) -> np.ndarray:
    """Deterministic 64-bit hashes of a pyarrow array (vectorized for
    integer dtypes, blake2b for everything else)."""
    if pa.types.is_integer(values.type):
        v = values.to_numpy(zero_copy_only=False).astype(np.uint64)
        h = v * _MULT
        h ^= h >> np.uint64(29)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(32)
        return h
    return np.array([
        int.from_bytes(hashlib.blake2b(
            str(x).encode(), digest_size=8).digest(), "big")
        for x in values.to_pylist()], dtype=np.uint64)


def kmv_distinct(ds, col: str, k: int = 1024):
    """Approximate ``count(distinct col)``: returns a 1-row pyarrow Table
    ``(estimate: int64, k: int64)``.

    Dataflow: per-batch partial = k smallest unique hashes (``k*8`` bytes
    whatever the batch size) -> a single ``sort + limit(k)`` over the
    tiny partial rows -> driver-side estimator on k values.  No stage
    ever holds the distinct-value set."""
    import ray.data.aggregate as agg

    top = np.uint64(1 << 63)

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"h": pa.array([], pa.int64())})
        h = np.unique(_hash64(b.column(col)))     # sorted unique
        # order-preserving uint64 -> int64 (XOR the sign bit): Ray's sort
        # and hash shuffle handle int64 natively, uint64 falls back to
        # pickled objects which cannot be sorted
        return pa.table({"h": pa.array((h[:k] ^ top).view(np.int64))})

    # distinct-merge BEFORE the limit: the same value hashing identically
    # in several blocks must count once -- a bare sort+limit(k) would let
    # duplicate hashes crowd out genuine minima and collapse the estimate
    mins = (ds.select_columns([col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("h")
            .aggregate(agg.Count(alias_name="_c"))
            .sort("h")
            .limit(k)
            .take_all())
    hs = np.unique(np.array([r["h"] for r in mins],
                            dtype=np.int64).view(np.uint64) ^ top)[:k]
    if len(hs) < k:                               # saw fewer than k hashes
        est = len(hs)                             # exact in this regime
    else:
        t = float(hs[-1]) / _FULL                 # k-th min in (0, 1)
        est = int(round((k - 1) / t))
    return pa.table({"estimate": pa.array([est], pa.int64()),
                     "k": pa.array([np.int64(k)], pa.int64())})


def histogram_quantiles(ds, col: str, qs, nbins: int = 4096):
    """Approximate quantiles via a fixed-width histogram sketch -- the
    continuous-domain sibling of :func:`kmv_distinct` (the reference has
    no approx aggregates, SURVEY.md §2.3; the exact distributed quantile
    lives in relational/queries.q_quantiles_by_flag).

    Two streaming passes, each moving O(nbins) ints per block whatever
    the input size: (1) global min/max aggregate; (2) per-batch partial
    ``np.bincount`` into ``nbins`` fixed bins, merged by one tiny
    ``groupby(bin).sum``.  The driver interpolates inside the target bin,
    so the estimate is within one bin width ``(max-min)/nbins`` of the
    exact quantile.  Deterministic: same input -> same estimate.

    Returns a pyarrow Table ``(q: float64, estimate: float64)``.
    """
    import ray.data.aggregate as agg

    qs = [float(q) for q in qs]
    if any(not 0.0 <= q <= 1.0 for q in qs):
        raise ValueError("quantiles must be in [0, 1]")
    base = ds.select_columns([col])
    stats = base.aggregate(agg.Min(col, alias_name="lo"),
                           agg.Max(col, alias_name="hi"),
                           agg.Count(alias_name="n"))
    lo, hi, n = stats["lo"], stats["hi"], stats["n"]
    if n == 0:
        return pa.table({"q": pa.array([], pa.float64()),
                         "estimate": pa.array([], pa.float64())})
    lo, hi = float(lo), float(hi)
    if hi == lo:
        return pa.table({"q": pa.array(qs, pa.float64()),
                         "estimate": pa.array([lo] * len(qs),
                                              pa.float64())})
    width = (hi - lo) / nbins

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"bin": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        v = b.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        idx = np.clip(((v - lo) / width).astype(np.int64), 0, nbins - 1)
        counts = np.bincount(idx, minlength=nbins)
        nz = np.flatnonzero(counts)
        return pa.table({"bin": pa.array(nz, pa.int64()),
                         "c": pa.array(counts[nz], pa.int64())})

    rows = (base.map_batches(partial, batch_format="pyarrow")
            .groupby("bin").aggregate(agg.Sum("c", alias_name="c"))
            .take_all())
    hist = np.zeros(nbins, dtype=np.int64)
    for r in rows:
        hist[r["bin"]] = r["c"]
    cum = np.cumsum(hist)
    est = []
    for q in qs:
        rank = q * n
        b = int(np.searchsorted(cum, max(rank, 1), side="left"))
        prev = cum[b - 1] if b else 0
        c = hist[b]
        frac = (rank - prev) / c if c else 0.0
        est.append(lo + (b + min(max(frac, 0.0), 1.0)) * width)
    return pa.table({"q": pa.array(qs, pa.float64()),
                     "estimate": pa.array(est, pa.float64())})


def _mg_reduce(counts: dict, width: int) -> dict:
    """Misra-Gries decrement step: if more than ``width`` counters are
    held, subtract the (width+1)-th largest count from all and drop the
    non-positive -- at most ``width`` survive (ties with the pivot die),
    and every counter's undercount grows by at most that pivot."""
    if len(counts) <= width:
        return counts
    vals = np.sort(np.fromiter(counts.values(), np.int64, len(counts)))
    d = int(vals[-(width + 1)])
    return {t: c - d for t, c in counts.items() if c > d}


def heavy_hitter_tokens(ds, col: str = "text", width: int = 512,
                        denom: int = 200):
    """Exact frequent-token mining via a two-pass Misra-Gries sketch +
    distributed recount: every token occurring more than ``total // denom``
    times (the SQL ``having count(*) > n/denom`` contract), with EXACT
    counts, while no stage ever shuffles the full token-frequency table.

    Pass 1 (candidates): each block summarizes its tokens into a width-
    ``width`` Misra-Gries sketch (``width`` counters whatever the block
    size) plus its token total; the driver merges the O(blocks * width)
    partial rows and reduces once more to ``width``.  Merged-MG guarantee:
    undercount <= total/(width+1), so with ``denom < width`` every token
    above the threshold survives as a candidate -- the candidate set is a
    SUPERSET of the answer, never a miss.

    Pass 2 (exact verify): the <= ``width`` candidate tokens broadcast into
    a second streaming pass that counts ONLY them (per-block partials of
    <= ``width`` rows, one tiny groupby-sum), and the exact threshold
    filter makes sketch noise irrelevant to the output.

    This is the candidate-generation + exact-verification shape the
    dedup family uses (functions/dedup.py): the sketch bounds what moves,
    the recount restores exactness.  Tokenization is ``split(' ')``
    (DuckDB ``string_split``), matching token_stats_by_lang.  Both
    passes tokenize and count in Arrow kernels (split_pattern ->
    list_flatten -> value_counts); Python only touches the <= width
    sketch entries per block, never the token stream.

    Returns a Dataset of ``(token: string, n: int64)``.
    """
    import pyarrow.compute as pc
    import ray
    import ray.data.aggregate as agg

    if denom >= width:
        raise ValueError(f"denom ({denom}) must be < width ({width}) for "
                         "the superset guarantee")
    from collections import Counter

    def _flat_tokens(b: pa.Table) -> pa.ChunkedArray:
        return pc.list_flatten(pc.split_pattern(b.column(col), " "))

    def partial(b: pa.Table) -> pa.Table:
        flat = _flat_tokens(b)
        vc = pc.value_counts(flat.combine_chunks())
        cnt = dict(zip(vc.field("values").to_pylist(),
                       vc.field("counts").to_pylist()))
        n = len(flat)
        cnt = _mg_reduce(cnt, width)
        return pa.table({
            "token": pa.array(list(cnt.keys()) + [None], pa.string()),
            "c": pa.array(list(cnt.values()) + [n], pa.int64())})

    parts = ray.get(ds.select_columns([col])
                    .map_batches(partial, batch_format="pyarrow")
                    .materialize().to_arrow_refs())
    merged: Counter = Counter()
    total = 0
    for t in parts:
        for tok, c in zip(t.column("token").to_pylist(),
                          t.column("c").to_pylist()):
            if tok is None:
                total += c
            else:
                merged[tok] += c
    cand = pa.array(sorted(_mg_reduce(merged, width)), pa.string())
    thr = total // denom + 1

    def recount(b: pa.Table) -> pa.Table:
        flat = _flat_tokens(b).combine_chunks()
        hits = flat.filter(pc.is_in(flat, value_set=cand))
        vc = pc.value_counts(hits)
        return pa.table({"token": vc.field("values"),
                         "c": vc.field("counts").cast(pa.int64())})

    return (ds.select_columns([col])
            .map_batches(recount, batch_format="pyarrow")
            .groupby("token")
            .aggregate(agg.Sum("c", alias_name="n"))
            .map_batches(lambda b: b.filter(
                pc.greater_equal(b.column("n"), pa.scalar(thr))),
                batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# HyperLogLog distinct counting (Flajolet et al. 2007, the published
# estimator with the standard linear-counting small-range correction).
# Each block's partial is ONE fixed 2^p-byte register row; registers
# merge by elementwise max -- associative, commutative and idempotent,
# so the estimate is bit-identical under any block layout or merge
# order (tested).  Complements KMV: ~1.04/sqrt(2^p) relative error in
# 4 KB at p=12, and the merge never needs the k-smallest sort.

_HLL_P = 12


def _hll_registers(h: np.ndarray, p: int) -> np.ndarray:
    """uint8[2^p] registers from 64-bit hashes: bucket = top p bits,
    rank = leading-zeros-of-the-rest + 1."""
    m = 1 << p
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | (np.uint64(1) << np.uint64(p - 1))
    # leading zeros via float64 exponent is unsafe >2^53; use bit scan
    rank = np.zeros(len(h), np.uint8)
    mask = np.uint64(1) << np.uint64(63)
    rest_c = rest.copy()
    done = np.zeros(len(h), bool)
    for i in range(64 - p + 1):
        hit = ~done & ((rest_c & mask) != 0)
        rank[hit] = i + 1
        done |= hit
        rest_c <<= np.uint64(1)
    regs = np.zeros(m, np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_distinct(ds, col: str, p: int = _HLL_P):
    """Approximate ``count(distinct col)`` via HyperLogLog: returns a
    1-row pyarrow Table ``(estimate: int64, m: int64)``."""
    import ray

    m = 1 << p

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"regs": pa.array([], pa.binary())})
        regs = _hll_registers(_hash64(b.column(col)), p)
        return pa.table({"regs": pa.array([regs.tobytes()],
                                          pa.binary())})

    parts = ray.get(ds.select_columns([col])
                    .map_batches(partial, batch_format="pyarrow")
                    .materialize().to_arrow_refs())
    regs = np.zeros(m, np.uint8)
    for t in parts:
        for blob in t.column("regs").to_pylist():
            np.maximum(regs, np.frombuffer(blob, np.uint8), out=regs)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros > 0:          # linear counting
        est = m * np.log(m / zeros)
    return pa.table({"estimate": pa.array([int(round(est))], pa.int64()),
                     "m": pa.array([m], pa.int64())})
