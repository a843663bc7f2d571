"""Banded interval (range) join -- the second join shape Ray Data has no
primitive for (alongside :mod:`.asof`).  For every probe row, match build
rows with the same key whose timestamp falls in ``[probe_ts + lo,
probe_ts + hi)``.

The reference has no interval join (SURVEY §2.3 notes the gap); this is
engine surface beyond it, with semantics pinned by a DuckDB range-predicate
join oracle in relational/queries.py.

Shape -- the standard time-bucket replication scheme:

* band width ``W = hi - lo`` (the window length).  Every build row belongs
  to exactly ONE band ``ts // W``; every probe row's window spans at most
  TWO consecutive bands, so the probe side is replicated <=2x (tagged
  union, same trick as the as-of join) and shuffled ONCE by
  ``(key, band)``.
* inside a group the build timestamps are sorted once and every probe row
  is answered with two vectorized ``searchsorted`` calls.  A (probe,
  build) pair can only meet in the build row's own band, so matches are
  exactly-once by construction -- no dedup pass.
* probe replicas emit a partial-count row even when zero build rows match,
  so the final tiny ``groupby(id).sum`` preserves left-join zero counts
  without a join-back against the probe table.

At 10^12 scale the banded shuffle is the only payload-bearing all-to-all
(volume <= probes x 2 + builds); the count merge moves two ints per probe
replica.  Skew on a hot (key, band) is bounded by that bucket's own rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .asof import _ts_us


def _banded_union(probe_ds, build_ds, *, probe_key: str, build_key: str,
                  probe_ts: str, build_ts: str, lo_us: int, hi_us: int,
                  key_type, payload):
    """The shared band-replication normalizer both interval joins ride:
    probe rows land in every band their ``[ts+lo, ts+hi)`` window touches
    (at most two, since the band width equals the window width), build
    rows in exactly the band holding their timestamp, and the two sides
    union into ONE keyed shuffle on ``(__key, __band)``.  ``payload``
    lists ``(out_name, probe_col | None, build_col | None, dtype)`` --
    the id columns each caller carries through (absent side is null)."""
    W = hi_us - lo_us

    def norm_probe(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column(probe_key)))
        ts = _ts_us(b.column(probe_ts))
        b0 = (ts + lo_us) // W
        b1 = (ts + hi_us - 1) // W
        two = b1 != b0
        idx = np.concatenate([np.arange(len(ts)), np.flatnonzero(two)])
        bands = np.concatenate([b0, b1[two]])
        t = b.take(pa.array(idx, pa.int64()))
        cols = {
            "__key": t.column(probe_key).cast(key_type),
            "__band": pa.array(bands, pa.int64()),
            "__side": pa.array(np.zeros(len(bands), dtype=np.int8)),
            "__ts": pa.array(np.concatenate([ts, ts[two]]), pa.int64()),
        }
        for name, pcol, _bcol, typ in payload:
            cols[name] = (t.column(pcol) if pcol is not None
                          else pa.nulls(len(bands), typ))
        return pa.table(cols)

    def norm_build(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column(build_key)))
        ts = _ts_us(b.column(build_ts))
        cols = {
            "__key": b.column(build_key).cast(key_type),
            "__band": pa.array(ts // W, pa.int64()),
            "__side": pa.array(np.ones(len(ts), dtype=np.int8)),
            "__ts": pa.array(ts, pa.int64()),
        }
        for name, _pcol, bcol, typ in payload:
            cols[name] = (b.column(bcol) if bcol is not None
                          else pa.nulls(len(ts), typ))
        return pa.table(cols)

    return (probe_ds.map_batches(norm_probe, batch_format="pyarrow")
            .union(build_ds.map_batches(norm_build,
                                        batch_format="pyarrow")))


def interval_count_join(probe_ds, build_ds, *, probe_key: str,
                        build_key: str, probe_ts: str, build_ts: str,
                        lo_us: int, hi_us: int, probe_id: str,
                        out_col: str = "n_matches",
                        driver_merge_max: int | None = 4_000_000):
    """Left range-join count: one output row per probe row --
    ``(probe_id, out_col)`` where ``out_col`` counts build rows with the
    probe's key and ``build_ts`` in ``[probe_ts + lo_us, probe_ts +
    hi_us)``.  Unmatched probe rows count 0 (left semantics).
    ``driver_merge_max`` bounds the partial-row driver merge of the
    final per-probe sum (<= 2 rows x probes; ~64 MB of (id, n) at the
    default); None forces the distributed rollup."""
    lo_us, hi_us = int(lo_us), int(hi_us)
    if hi_us <= lo_us:
        raise ValueError("interval join needs hi_us > lo_us")
    probe_schema = probe_ds.schema()
    id_type = probe_schema.types[probe_schema.names.index(probe_id)]
    key_type = probe_schema.types[probe_schema.names.index(probe_key)]

    both = _banded_union(
        probe_ds, build_ds, probe_key=probe_key, build_key=build_key,
        probe_ts=probe_ts, build_ts=build_ts, lo_us=lo_us, hi_us=hi_us,
        key_type=key_type, payload=[("__id", probe_id, None, id_type)])

    def count_block(b: pa.Table) -> pa.Table:
        """Whole hash partition per call: COMPLETE (key, band) groups,
        many at a time (keyed_fold) -- one multi-key arrow sort + a
        numpy segment sweep instead of per-GROUP Python (the
        ~45us/group map_groups floor round 3 paid here)."""
        if b.num_rows == 0 or "__key" not in b.column_names:
            return pa.table({"__id": pa.array([], id_type),
                             "__n": pa.array([], pa.int64())})
        order = pc.sort_indices(
            b, sort_keys=[("__key", "ascending"),
                          ("__band", "ascending"),
                          ("__side", "ascending"),
                          ("__ts", "ascending")])
        b = b.take(order)
        key = b.column("__key").to_numpy(zero_copy_only=False)
        band = b.column("__band").to_numpy()
        side = b.column("__side").to_numpy()
        ts = b.column("__ts").to_numpy()
        starts = np.flatnonzero(np.r_[True, (key[1:] != key[:-1])
                                      | (band[1:] != band[:-1])])
        bounds = np.r_[starts, len(key)]
        id_rows: list[np.ndarray] = []
        counts: list[np.ndarray] = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            n_p = int(np.searchsorted(side[s:e], 1))  # probes first
            if n_p == 0:
                continue
            b_ts = ts[s + n_p:e]                      # sorted already
            p_ts = ts[s:s + n_p]
            n = (np.searchsorted(b_ts, p_ts + hi_us, side="left")
                 - np.searchsorted(b_ts, p_ts + lo_us, side="left"))
            id_rows.append(np.arange(s, s + n_p))
            counts.append(n)
        if not id_rows:
            return pa.table({"__id": pa.array([], id_type),
                             "__n": pa.array([], pa.int64())})
        idx = pa.array(np.concatenate(id_rows), pa.int64())
        return pa.table({
            "__id": b.column("__id").take(idx),
            "__n": pa.array(np.concatenate(counts).astype(np.int64),
                            pa.int64())})

    import ray
    import ray.data
    import ray.data.aggregate as agg

    from ..partitions import keyed_fold, shuffle_width

    folded = keyed_fold(both, ["__key", "__band"], count_block,
                        num_partitions=shuffle_width(1, lo=8)) \
        .materialize()
    # the per-replica partials are <= 2 rows per probe; under the
    # output-bounded gate they driver-merge (two ints per row) instead
    # of paying a second hash-aggregate pool on the probe-id key --
    # past it the distributed sum owns the rollup
    if (driver_merge_max is not None
            and folded.count() <= driver_merge_max):
        tabs = [t for t in ray.get(folded.to_arrow_refs())
                if t.num_rows]
        if not tabs:
            return ray.data.from_arrow(pa.table({
                probe_id: pa.array([], id_type),
                out_col: pa.array([], pa.int64())}))
        allp = pa.concat_tables(tabs)
        ids = allp.column("__id").to_numpy(zero_copy_only=False)
        ns = allp.column("__n").to_numpy()
        order = np.argsort(ids, kind="stable")
        ids, ns = ids[order], ns[order]
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        return ray.data.from_arrow(pa.table({
            probe_id: pa.array(ids[starts]).cast(id_type),
            out_col: pa.array(np.add.reduceat(ns, starts), pa.int64())}))
    out = (folded.groupby("__id")
           .aggregate(agg.Sum("__n", alias_name=out_col)))
    return out.rename_columns({"__id": probe_id})


def interval_join_pairs(probe_ds, build_ds, *, probe_key: str,
                        build_key: str, probe_ts: str, build_ts: str,
                        lo_us: int, hi_us: int, probe_id: str,
                        build_id: str):
    """Inner range join emitting the matched ``(probe_id, build_id)``
    pairs.  Same banded shuffle as :func:`interval_count_join`; pair
    volume is the true join cardinality (no dedup needed -- a pair meets
    only in the build row's band)."""
    lo_us, hi_us = int(lo_us), int(hi_us)
    if hi_us <= lo_us:
        raise ValueError("interval join needs hi_us > lo_us")
    probe_schema = probe_ds.schema()
    build_schema = build_ds.schema()
    pid_type = probe_schema.types[probe_schema.names.index(probe_id)]
    bid_type = build_schema.types[build_schema.names.index(build_id)]
    key_type = probe_schema.types[probe_schema.names.index(probe_key)]

    both = _banded_union(
        probe_ds, build_ds, probe_key=probe_key, build_key=build_key,
        probe_ts=probe_ts, build_ts=build_ts, lo_us=lo_us, hi_us=hi_us,
        key_type=key_type, payload=[("__pid", probe_id, None, pid_type),
                                    ("__bid", None, build_id, bid_type)])

    def pairs_block(b: pa.Table) -> pa.Table:
        """Same block-fold shape as interval_count_join.count_block:
        per (key, band) segment, matched build rows form a contiguous
        sorted-ts range; emit (probe, build) index pairs and one take
        per column at the end."""
        empty = pa.table({"probe_id": pa.array([], pid_type),
                          "build_id": pa.array([], bid_type)})
        if b.num_rows == 0 or "__key" not in b.column_names:
            return empty
        order = pc.sort_indices(
            b, sort_keys=[("__key", "ascending"),
                          ("__band", "ascending"),
                          ("__side", "ascending"),
                          ("__ts", "ascending")])
        b = b.take(order)
        key = b.column("__key").to_numpy(zero_copy_only=False)
        band = b.column("__band").to_numpy()
        side = b.column("__side").to_numpy()
        ts = b.column("__ts").to_numpy()
        starts = np.flatnonzero(np.r_[True, (key[1:] != key[:-1])
                                      | (band[1:] != band[:-1])])
        bounds = np.r_[starts, len(key)]
        p_rows: list[np.ndarray] = []
        b_rows: list[np.ndarray] = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            n_p = int(np.searchsorted(side[s:e], 1))
            if n_p == 0 or n_p == e - s:
                continue
            b_ts = ts[s + n_p:e]
            p_ts = ts[s:s + n_p]
            lo = np.searchsorted(b_ts, p_ts + lo_us, side="left")
            hi = np.searchsorted(b_ts, p_ts + hi_us, side="left")
            cnt = hi - lo
            if not cnt.any():
                continue
            p_rows.append(np.repeat(np.arange(s, s + n_p), cnt))
            b_rows.append(np.concatenate(
                [np.arange(s + n_p + a, s + n_p + c)
                 for a, c in zip(lo, hi) if c > a]))
        if not p_rows:
            return empty
        pi = pa.array(np.concatenate(p_rows), pa.int64())
        bi = pa.array(np.concatenate(b_rows), pa.int64())
        return pa.table({
            "probe_id": b.column("__pid").take(pi),
            "build_id": b.column("__bid").take(bi),
        }).rename_columns(["probe_id", "build_id"])

    from ..partitions import keyed_fold, shuffle_width

    return keyed_fold(both, ["__key", "__band"], pairs_block,
                      num_partitions=shuffle_width(1, lo=8))
