"""Bloom-filter join prefilter: build a compact bitset of the small
side's join keys, broadcast it, and drop non-matching big-side rows
BEFORE the shuffle join -- the classic shuffle-volume reducer for
selective large-large joins (no reference analogue; Postgres does the
equivalent internally with its hash-join batching).  Correctness-neutral:
false positives survive the prefilter and are removed by the exact join
that follows, so the end result is exact.

Build is a per-batch partial: each batch ORs its keys into a local
bitset and emits it as ONE bytes row; the driver ORs O(#batches) bitsets
(bounded bytes, never keys).  Probe is vectorized numpy bit tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_MIX1 = np.uint64(0xFF51AFD7ED558CCD)
_MIX2 = np.uint64(0xC4CEB9FE1A85EC53)


def _hashes(keys: np.ndarray, n_bits: int, k: int) -> np.ndarray:
    """k bit positions per key (splitmix-style double hashing)."""
    x = keys.astype(np.uint64)
    with np.errstate(over="ignore"):
        x ^= x >> np.uint64(33)
        x *= _MIX1
        x ^= x >> np.uint64(33)
        h1 = x * _MIX2
        h2 = (x >> np.uint64(29)) | np.uint64(1)     # odd stride
        ks = np.arange(k, dtype=np.uint64)
        pos = (h1[:, None] + ks[None, :] * h2[:, None]) % np.uint64(n_bits)
    return pos


def build_bloom(ds, key_col: str, *, n_bits: int = 1 << 20, k: int = 4):
    """Small-side Dataset -> bloom bitset (numpy uint64 array) over
    ``key_col`` (integer keys)."""
    n_words = n_bits // 64

    def partial(b: pa.Table) -> pa.Table:
        bits = np.zeros(n_words, dtype=np.uint64)
        if b.num_rows:
            pos = _hashes(b.column(key_col).to_numpy(), n_bits, k).ravel()
            np.bitwise_or.at(bits, (pos // 64).astype(np.int64),
                             np.uint64(1) << (pos % np.uint64(64)))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    out = np.zeros(n_words, dtype=np.uint64)
    import ray

    for tab in ray.get(ds.map_batches(partial, batch_format="pyarrow")
                       .materialize().to_arrow_refs()):
        for row in tab.column("bits").to_pylist():
            out |= np.frombuffer(row, dtype=np.uint64)
    return out


def filter_by_bloom(ds, key_col: str, bloom: np.ndarray, *, k: int = 4):
    """Keep only rows whose key MIGHT be in the bloom (exact join after
    this removes the false positives).  The bitset ships once per task
    via ``ray.put`` broadcast, not per batch."""
    import ray

    n_bits = len(bloom) * 64
    ref = ray.put(bloom)

    class Probe:
        def __init__(self):
            self.bits = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return b
            pos = _hashes(b.column(key_col).to_numpy(), n_bits, k)
            word = self.bits[(pos // 64).astype(np.int64)]
            hit = (word >> (pos % np.uint64(64))) & np.uint64(1)
            return b.filter(pa.array(hit.all(axis=1)))

    return ds.map_batches(Probe, batch_format="pyarrow",
                          concurrency=(1, 8))
