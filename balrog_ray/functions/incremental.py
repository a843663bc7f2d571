"""Incremental near-dup screening of NEW documents against a persistent
sharded MinHash band-bucket index held by Ray actors -- the streaming /
ingest-time dedup role: a crawl ingests a batch and must answer "is this
a near-dup of the corpus?" WITHOUT re-running the corpus x corpus LSH
(the reference's whole-corpus batch shape; cf. balrog's chunked fan-out,
SURVEY op 41).

This is the one pattern the Dataset API genuinely can't express -- a
shared MUTABLE index consulted and updated across pipeline stages -- so
it drops to raw Ray actors exactly as SURVEY §7.5 prescribes.  Scale
design:

* the index is SHARDED by bucket hash across ``num_shards`` actors;
  each holds ``dict[bucket -> (ids, signatures)]`` for its share only.
  Inserts and probes route straight to the owning shard, so no actor
  materializes more than ~1/num_shards of the index, and shard count
  scales index memory across a cluster the same way the partitioned
  spatial join scales its STR-trees;
* BUILD is a ``map_batches`` pass over the corpus: signatures are
  computed once per doc (the vectorized minhash of functions/dedup.py)
  and (bucket, id, sig) rows are pushed to their owning shards; the
  build stage is forced to completion before any probe (a barrier by
  semantics, not by materializing data -- only counts cross it);
* PROBE is a ``map_batches`` pass over the new batch: the same band
  keys are computed, owning shards return their candidate (id, sig)
  lists, and verification -- full-signature agreement, the unbiased
  Jaccard estimator with stderr ~ sqrt(t(1-t)/n_perm) -- runs inside
  the map task.  Nothing index-sized or candidate-sized reaches the
  driver; the output Dataset carries verified matches only;
* ``admit=True`` inserts each probed doc into the index AFTER its own
  batch's verdicts are computed, so docs are never matched against
  themselves and a re-probe of the same text later IS matched -- the
  streaming-ingest contract.

Shard count and bands are the knobs: probes cost ``bands`` small actor
calls per batch (grouped per shard, one call each), and a hot bucket is
bounded by the LSH banding itself, not by skew handling here.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from .dedup import _perm_params, minhash_signature, shingle_set


def _band_buckets(sig: np.ndarray, bands: int, rows_per_band: int
                  ) -> np.ndarray:
    """The same band->bucket digest rule as minhash_lsh_pairs
    (dedup.py:sig_buckets), returned as one int64 per band."""
    out = np.empty(bands, np.int64)
    for band in range(bands):
        chunk = sig[band * rows_per_band:(band + 1) * rows_per_band]
        digest = hashlib.blake2b(chunk.tobytes(), digest_size=8).digest()
        bucket = (band << 56) ^ (int.from_bytes(digest, "big") >> 8)
        out[band] = np.int64(bucket - (1 << 62))
    return out


class _BucketShardImpl:
    """One shard: dict[bucket -> list of (doc_id, signature)].  Plain
    class; wrapped by ray.remote in build_minhash_index so tests can
    also drive it in-process."""

    def __init__(self) -> None:
        self._ids: dict[int, list[int]] = {}
        self._sigs: dict[int, list[np.ndarray]] = {}
        self._seen: set[tuple[int, int]] = set()
        self._n = 0

    def insert(self, buckets: np.ndarray, ids: np.ndarray,
               sigs: np.ndarray) -> int:
        """sigs: (n, n_perm) uint64; one row per (bucket, id) entry.
        IDEMPOTENT on (bucket, id): a Ray task retry (or a re-executed
        lazy dataset) re-sending the same rows is a no-op, so the index
        never holds duplicate entries."""
        for b, i, s in zip(buckets.tolist(), ids.tolist(), sigs):
            if (b, i) in self._seen:
                continue
            self._seen.add((b, i))
            self._ids.setdefault(b, []).append(i)
            self._sigs.setdefault(b, []).append(s)
            self._n += 1
        return self._n

    def probe(self, buckets: np.ndarray):
        """Return (offsets, ids, sigs): candidates of query k are
        ids[offsets[k]:offsets[k+1]] (duplicate ids across bands are
        fine -- the caller dedups per query)."""
        offs = np.zeros(len(buckets) + 1, np.int64)
        ids: list[int] = []
        sigs: list[np.ndarray] = []
        for k, b in enumerate(buckets.tolist()):
            got = self._ids.get(b)
            if got:
                ids.extend(got)
                sigs.extend(self._sigs[b])
            offs[k + 1] = len(ids)
        return (offs, np.asarray(ids, np.int64),
                np.stack(sigs) if sigs else
                np.empty((0, 0), np.uint64))

    def stats(self) -> dict:
        return {"buckets": len(self._ids), "entries": self._n}

    def dump(self, path: str) -> int:
        """Snapshot this shard's (bucket, doc_id, signature) rows as ONE
        parquet file, written ATOMICALLY (tmp + rename) by the shard
        itself -- the driver never holds index-sized data.  Returns the
        entry count written."""
        import os

        import pyarrow.parquet as _pq

        rows_b, rows_i, rows_s = [], [], []
        for b, ids in self._ids.items():
            sigs = self._sigs[b]
            rows_b.extend([b] * len(ids))
            rows_i.extend(ids)
            rows_s.extend(s.tolist() for s in sigs)
        n_perm = len(rows_s[0]) if rows_s else 0
        tab = pa.table({
            "bucket": pa.array(rows_b, pa.int64()),
            "doc_id": pa.array(rows_i, pa.int64()),
            "sig": pa.array(rows_s, pa.list_(pa.uint64(), n_perm)
                            if n_perm else pa.list_(pa.uint64()))})
        tmp = path + ".tmp"
        _pq.write_table(tab, tmp)
        os.replace(tmp, path)
        return self._n

    def load(self, path: str) -> int:
        """Restore from a :meth:`dump` snapshot (idempotent: re-loading
        over existing entries is a no-op via the (bucket, id) seen-set).
        Returns the entry count after load."""
        import pyarrow.parquet as _pq

        tab = _pq.read_table(path)
        if tab.num_rows == 0:
            return self._n
        bks = tab.column("bucket").to_numpy()
        ids = tab.column("doc_id").to_numpy()
        sigs = np.asarray(tab.column("sig").to_pylist(), np.uint64)
        self.insert(bks, ids, sigs)
        return self._n


@dataclass
class MinHashIndex:
    """Handle to the sharded index: actor handles + the signature
    parameters every caller must reuse (signatures are only comparable
    under identical permutations/banding)."""
    shards: list
    num_shards: int
    n_perm: int
    bands: int
    k: int

    def stats(self) -> list[dict]:
        import ray

        return ray.get([s.stats.remote() for s in self.shards])

    def save(self, path: str) -> None:
        """Persist the index as a partitioned parquet snapshot: every
        shard writes its own ``shard-NNNN.parquet`` in parallel (atomic
        tmp+rename each), then the driver commits a ``_meta.json``
        carrying the signature parameters LAST -- a snapshot without
        meta is incomplete and ignored by :func:`load_minhash_index`.
        Closes the round-3 gap: every other stage had checkpoint/resume
        while a driver restart lost the ingest-dedup corpus index
        (reference restart analogue, nsw_dcs 03_*.py:107-122)."""
        import json
        import os

        import ray

        os.makedirs(path, exist_ok=True)
        meta_tmp = os.path.join(path, "_meta.json.tmp")
        meta = os.path.join(path, "_meta.json")
        if os.path.exists(meta):
            os.remove(meta)     # invalidate while shard files change
        ray.get([s.dump.remote(os.path.join(path,
                                            f"shard-{i:04d}.parquet"))
                 for i, s in enumerate(self.shards)])
        with open(meta_tmp, "w") as f:
            json.dump({"num_shards": self.num_shards,
                       "n_perm": self.n_perm, "bands": self.bands,
                       "k": self.k}, f)
        os.replace(meta_tmp, meta)


def load_minhash_index(path: str) -> MinHashIndex:
    """Rebuild the sharded index actors from a :meth:`MinHashIndex.save`
    snapshot: shard i loads shard-i's file (parallel, idempotent
    inserts), so a restored index yields byte-identical probe/admit
    decisions to the uninterrupted actor set.  Shard count and signature
    parameters come from the committed ``_meta.json``; a missing meta
    means the snapshot never committed and raises."""
    import json
    import os

    import ray

    meta_path = os.path.join(path, "_meta.json")
    if not os.path.exists(meta_path):
        raise FileNotFoundError(
            f"no committed MinHash index snapshot at {path!r} "
            "(_meta.json absent: save() never completed)")
    with open(meta_path) as f:
        meta = json.load(f)
    shard_cls = ray.remote(_BucketShardImpl)
    shards = [shard_cls.remote() for _ in range(meta["num_shards"])]
    ray.get([s.load.remote(os.path.join(path, f"shard-{i:04d}.parquet"))
             for i, s in enumerate(shards)])
    return MinHashIndex(shards, meta["num_shards"], meta["n_perm"],
                        meta["bands"], meta["k"])


def _shard_of(buckets: np.ndarray, num_shards: int) -> np.ndarray:
    # cheap splitmix-style scramble so band bits don't bias the route
    x = buckets.astype(np.uint64)
    x = (x ^ (x >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
    x = x ^ (x >> np.uint64(33))
    return (x % np.uint64(num_shards)).astype(np.int64)


def build_minhash_index(corpus_ds, *, id_col: str = "doc_id",
                        text_col: str = "text", n_perm: int = 64,
                        bands: int = 16, k: int = 5,
                        num_shards: int = 8) -> MinHashIndex:
    """Build the sharded index from a corpus Dataset.  Returns the
    handle once every shard has acknowledged every insert."""
    import ray

    shard_cls = ray.remote(_BucketShardImpl)
    shards = [shard_cls.remote() for _ in range(num_shards)]
    idx = MinHashIndex(shards, num_shards, n_perm, bands, k)
    rows_per_band = n_perm // bands

    def push(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        params = _perm_params(n_perm)
        all_b, all_i, all_s = [], [], []
        for i, text in zip(ids, texts):
            sig = minhash_signature(shingle_set(text, k), n_perm,
                                    params=params)
            bks = _band_buckets(sig, bands, rows_per_band)
            all_b.append(bks)
            all_i.append(np.full(bands, i, np.int64))
            all_s.append(np.repeat(sig[None, :], bands, axis=0))
        if all_b:
            bks = np.concatenate(all_b)
            dids = np.concatenate(all_i)
            sgs = np.concatenate(all_s)
            route = _shard_of(bks, num_shards)
            futs = []
            for sh in np.unique(route):
                m = route == sh
                futs.append(shards[int(sh)].insert.remote(
                    bks[m], dids[m], sgs[m]))
            ray.get(futs)        # batch-level ack: build is durable
                                 # before this map task reports done
        return pa.table({"n": pa.array([len(ids)], pa.int64())})

    total = (corpus_ds.map_batches(push, batch_format="pyarrow")
             .sum("n"))
    if total is None:
        raise ValueError("empty corpus")
    return idx


def probe_minhash_index(index: MinHashIndex, new_ds, *,
                        id_col: str = "doc_id", text_col: str = "text",
                        threshold: float = 0.8, admit: bool = False):
    """Screen ``new_ds`` against the index.  Returns a Dataset of
    ``(new_id, dup_of, est_e6)`` -- signature-agreement Jaccard
    estimates >= threshold, est_e6 the estimate in exact parts-per-
    million.  With ``admit=True`` every probed doc is inserted after
    its OWN batch's verdicts (never matched against itself or its
    batchmates; re-probes of the same text later do match).  The admit
    path MATERIALIZES the result before returning: a lazy dataset
    re-executed after the inserts landed would re-probe against its own
    admissions and self-match (shard inserts are also idempotent on
    (bucket, id), so a task retry never duplicates index entries), and
    the probe itself drops self/batchmate candidate ids so a task
    RETRY after its inserts landed emits the same verdicts as the
    first run.  Cross-BATCH ordering within one admit call is
    concurrency-dependent by design: batch B may or may not see batch
    A's admissions; callers needing a total order must admit in
    separate, smaller calls."""
    shards = index.shards
    num_shards = index.num_shards
    n_perm, bands, k = index.n_perm, index.bands, index.k
    rows_per_band = n_perm // bands

    def probe(batch: pa.Table) -> pa.Table:
        import ray

        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        params = _perm_params(n_perm)
        sigs = np.empty((len(ids), n_perm), np.uint64)
        bks = np.empty((len(ids), bands), np.int64)
        for q, text in enumerate(texts):
            sigs[q] = minhash_signature(shingle_set(text, k), n_perm,
                                        params=params)
            bks[q] = _band_buckets(sigs[q], bands, rows_per_band)
        flat = bks.reshape(-1)
        route = _shard_of(flat, num_shards)
        # one probe call per shard, covering every query's keys --
        # launched together, gathered once (not a serial per-shard
        # round-trip)
        cand_ids = [[] for _ in ids]
        cand_sigs = [[] for _ in ids]
        probe_shards = np.unique(route)
        futs = [shards[int(sh)].probe.remote(flat[route == sh])
                for sh in probe_shards]
        for sh, (offs, cids, csigs) in zip(probe_shards, ray.get(futs)):
            m = route == sh
            qpos = np.flatnonzero(m) // bands
            for j, q in enumerate(qpos.tolist()):
                lo, hi = offs[j], offs[j + 1]
                if hi > lo:
                    cand_ids[q].extend(cids[lo:hi].tolist())
                    cand_sigs[q].append(csigs[lo:hi])
        out_new, out_dup, out_est = [], [], []
        # Retry safety: if this task re-runs AFTER its admit inserts
        # landed (shard inserts are idempotent but persistent), the
        # re-probe would see its own batch's docs.  Dropping the
        # query's own id -- and, under admit, every batchmate id --
        # makes the emitted verdicts identical between first run and
        # retry, preserving the "never matched against itself or its
        # batchmates" contract.
        batch_ids = np.asarray(ids, np.int64)
        for q in range(len(ids)):
            if not cand_ids[q]:
                continue
            cids = np.asarray(cand_ids[q], np.int64)
            csig = np.concatenate(cand_sigs[q], axis=0)
            uniq, first = np.unique(cids, return_index=True)
            drop = uniq == ids[q]
            if admit:
                drop |= np.isin(uniq, batch_ids)
            if drop.any():
                uniq, first = uniq[~drop], first[~drop]
                if uniq.size == 0:
                    continue
            agree = (csig[first] == sigs[q][None, :]).mean(axis=1)
            keep = agree >= threshold
            for dup, est in zip(uniq[keep].tolist(),
                                agree[keep].tolist()):
                out_new.append(ids[q])
                out_dup.append(dup)
                out_est.append(int(round(est * 1_000_000)))
        if admit:
            flat_ids = np.repeat(np.asarray(ids, np.int64), bands)
            flat_sigs = np.repeat(sigs, bands, axis=0)
            futs = []
            for sh in np.unique(route):
                m = route == sh
                futs.append(shards[int(sh)].insert.remote(
                    flat[m], flat_ids[m], flat_sigs[m]))
            ray.get(futs)
        return pa.table({
            "new_id": pa.array(out_new, pa.int64()),
            "dup_of": pa.array(out_dup, pa.int64()),
            "est_e6": pa.array(out_est, pa.int64())})

    out = new_ds.map_batches(probe, batch_format="pyarrow")
    return out.materialize() if admit else out
