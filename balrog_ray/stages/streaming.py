"""Watermark-gated streaming windows -- the stateful STREAMING shape of
the window family (tumbling/hopping/sessionize in relational/queries are
the batch shapes).

A streaming engine ingests events in ARRIVAL order, advances a watermark
``wm = max(event time seen) - allowed_lateness``, finalizes a tumbling
window once ``wm`` passes its end, and DROPS events arriving for already
-finalized windows (the late-data contract of Beam/Flink-style
watermarking).  This module replays those semantics exactly and
deterministically over a batch Dataset: arrival order is the explicit
``seq`` column (per key), so the result is a pure function of the data
-- replayable by a SQL window expression, hence SQL-checkable, while
still exercising genuinely streaming semantics (admission depends on a
RUNNING state, not on any whole-window property).

Scale shape: ONE keyed fold co-locates each key's full stream; inside
the fold everything is numpy (running max per key segment, vectorized
window binning, composite-key partial aggregation), and the per-block
output is bounded by (keys x windows), not events.  The per-key
watermark matches a sharded streaming deployment where each key's
events ride one ingest shard (the same partitioning assumption the
incremental MinHash index documents).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_NO_PRIOR = np.int64(-(1 << 62))


def _prev_running_max(tus: np.ndarray, starts: np.ndarray):
    """Per-segment running max of PRIOR values: ``prev[i]`` is
    ``max(tus[s:i])`` for ``i`` inside the segment starting at ``s``,
    and ``_NO_PRIOR`` at each segment head.  Segments are maximal runs
    of equal keys in sorted order, given by their start indices
    (``starts[0] == 0``).

    Implemented as a C-grouped cummax (pandas ``groupby().cummax``)
    shifted by one row.  An earlier banded formulation
    (``seg_id << 52`` + global cummax) silently wrapped int64 once a
    block held >= 2048 key segments (2048 << 52 == 2**63), admitting
    late events with corrupted counts; a grouped cummax has no offset
    arithmetic to overflow at any segment count or time span.

    Returns ``(prev_max, no_prior)`` where ``no_prior`` marks segment
    heads."""
    import pandas as pd

    seg_head = np.zeros(len(tus), np.int64)
    seg_head[starts] = 1
    seg_id = np.cumsum(seg_head) - 1
    cmax = pd.Series(tus).groupby(seg_id).cummax().to_numpy()
    prev = np.empty(len(tus), np.int64)
    prev[1:] = cmax[:-1]
    no_prior = np.zeros(len(tus), bool)
    no_prior[starts] = True
    prev[no_prior] = _NO_PRIOR
    return prev, no_prior


def watermark_tumbling(ds, *, key_col: str, ts_col: str, seq_col: str,
                       value_col: str, window_us: int, lateness_us: int,
                       hop_us: int | None = None,
                       num_partitions: int = 8):
    """Per-key watermark windows: returns one row per (key, win_start)
    with ``n_admitted``, ``n_late`` and the exact integer-cents sum of
    admitted values.  Tumbling by default; with ``hop_us`` (which must
    divide ``window_us``) each event lands in its ``window_us/hop_us``
    overlapping HOPPING window instances, admission decided per
    instance.

    An event is LATE for a window instance (dropped from its
    aggregate, counted in its ``n_late``) iff that instance's end is
    not after the watermark at the event's arrival:
    ``win_start + window_us <= max(prior ts) - lateness_us``, with
    arrival order = ascending ``seq_col`` within the key.  Under
    hopping, one arrival can be late for its older instances and
    admitted to its newer ones -- exactly a streaming engine's
    per-pane firing behavior.
    """
    from ..partitions import keyed_fold

    if hop_us is None:
        hop_us = window_us
    if window_us % hop_us != 0:
        raise ValueError("hop_us must divide window_us")
    n_inst = window_us // hop_us

    def fold(b: pa.Table) -> pa.Table:
        empty = pa.table({
            key_col: pa.array([], pa.int64()),
            "win_start": pa.array([], pa.int64()),
            "n_admitted": pa.array([], pa.int64()),
            "n_late": pa.array([], pa.int64()),
            "admitted_v_c": pa.array([], pa.int64())})
        if b.num_rows == 0 or key_col not in b.column_names:
            return empty
        import pyarrow.compute as pc

        order = pc.sort_indices(
            b, sort_keys=[(key_col, "ascending"),
                          (seq_col, "ascending")])
        b = b.take(order)
        keys = b.column(key_col).to_numpy()
        ts_field = b.column(ts_col)
        if pa.types.is_timestamp(ts_field.type):
            ts_field = ts_field.cast(pa.timestamp("us"))
            tus = ts_field.to_numpy().astype("datetime64[us]") \
                .astype(np.int64)
        else:
            tus = ts_field.to_numpy().astype(np.int64)
        v_c = np.rint(b.column(value_col).to_numpy()
                      * 100.0).astype(np.int64)

        # running max of PRIOR ts, restarted per key segment (grouped
        # cummax -- see _prev_running_max for why not a banded offset)
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        prev_max, no_prior = _prev_running_max(tus, starts)

        # explode each event into its window instances (1 when
        # tumbling): instance j covers win_start = (ts//hop - j)*hop
        rep = np.repeat(np.arange(len(tus)), n_inst)
        j = np.tile(np.arange(n_inst, dtype=np.int64), len(tus))
        keys = keys[rep]
        v_c = v_c[rep]
        no_prior = no_prior[rep]
        prev_max = prev_max[rep]
        win_start = ((tus[rep] // hop_us) - j) * hop_us
        ok = no_prior | (win_start + window_us
                         > prev_max - lateness_us)

        # composite (key, window) group id: window index rebased per
        # block so any epoch/window combination fits the 22-bit band
        wi = win_start // hop_us
        wi = wi - wi.min()
        if wi.max() >= (1 << 22) or keys.min() < 0:
            raise ValueError(
                "watermark_tumbling: key/window range exceeds the "
                "composite grouping band (negative keys or > 4M "
                "distinct windows per key partition)")
        comp = keys * np.int64(1 << 22) + wi
        u, inv = np.unique(comp, return_inverse=True)
        n_adm = np.zeros(len(u), np.int64)
        n_late = np.zeros(len(u), np.int64)
        v_adm = np.zeros(len(u), np.int64)
        np.add.at(n_adm, inv, ok.astype(np.int64))
        np.add.at(n_late, inv, (~ok).astype(np.int64))
        np.add.at(v_adm, inv, np.where(ok, v_c, 0))
        src = np.full(len(u), -1, np.int64)
        src[inv] = np.arange(len(inv))       # one source row per group
        return pa.table({
            key_col: pa.array(keys[src], pa.int64()),
            "win_start": pa.array(win_start[src], pa.int64()),
            "n_admitted": pa.array(n_adm, pa.int64()),
            "n_late": pa.array(n_late, pa.int64()),
            "admitted_v_c": pa.array(v_adm, pa.int64())})

    return keyed_fold(ds, [key_col], fold,
                      num_partitions=num_partitions)


def watermark_sessions(ds, *, key_col: str, ts_col: str, seq_col: str,
                       value_col: str, gap_us: int, lateness_us: int,
                       num_partitions: int = 8):
    """Per-key watermark SESSION windows: events arriving at or before
    the watermark (``max(prior ts) - lateness_us`` in seq order) are
    dropped late; the admitted events then sessionize by EVENT time --
    a gap over ``gap_us`` starts a new session (ties broken by seq).
    Returns one row per session: (key, session_start, n_events, v_c
    sum) plus a per-key late count carried on every session row
    (``n_late_key``) so the drop volume is visible without a second
    output stream."""
    from ..partitions import keyed_fold

    def fold(b: pa.Table) -> pa.Table:
        empty = pa.table({
            key_col: pa.array([], pa.int64()),
            "session_start": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "session_v_c": pa.array([], pa.int64()),
            "n_late_key": pa.array([], pa.int64())})
        if b.num_rows == 0 or key_col not in b.column_names:
            return empty
        import pyarrow.compute as pc

        order = pc.sort_indices(
            b, sort_keys=[(key_col, "ascending"),
                          (seq_col, "ascending")])
        b = b.take(order)
        keys = b.column(key_col).to_numpy()
        ts_field = b.column(ts_col)
        if pa.types.is_timestamp(ts_field.type):
            tus = (ts_field.cast(pa.timestamp("us")).to_numpy()
                   .astype("datetime64[us]").astype(np.int64))
        else:
            tus = ts_field.to_numpy().astype(np.int64)
        seq = b.column(seq_col).to_numpy().astype(np.int64)
        v_c = np.rint(b.column(value_col).to_numpy()
                      * 100.0).astype(np.int64)

        # per-key prior running max (same grouped cummax as tumbling)
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        prev_max, no_prior = _prev_running_max(tus, starts)
        ok = no_prior | (tus > prev_max - lateness_us)
        n_late_seg = np.add.reduceat((~ok).astype(np.int64), starts)
        n_late_of_key = dict(zip(keys[starts].tolist(),
                                 n_late_seg.tolist()))

        # sessionize ADMITTED events by event time (ties by seq)
        keys_a, tus_a, seq_a, v_a = (keys[ok], tus[ok], seq[ok],
                                     v_c[ok])
        if len(keys_a) == 0:
            return empty
        so = np.lexsort((seq_a, tus_a, keys_a))
        keys_a, tus_a, v_a = keys_a[so], tus_a[so], v_a[so]
        new_key = np.r_[True, keys_a[1:] != keys_a[:-1]]
        gap_brk = np.r_[True, (tus_a[1:] - tus_a[:-1]) > gap_us]
        brk = new_key | gap_brk
        sid = np.cumsum(brk) - 1
        s_starts = np.flatnonzero(brk)
        bounds = np.r_[s_starts, len(sid)]
        n_ev = np.diff(bounds)
        sv = np.add.reduceat(v_a, s_starts)
        k_out = keys_a[s_starts]
        return pa.table({
            key_col: pa.array(k_out, pa.int64()),
            "session_start": pa.array(tus_a[s_starts], pa.int64()),
            "n_events": pa.array(n_ev, pa.int64()),
            "session_v_c": pa.array(sv, pa.int64()),
            "n_late_key": pa.array(
                [n_late_of_key.get(k, 0) for k in k_out], pa.int64())})

    return keyed_fold(ds, [key_col], fold,
                      num_partitions=num_partitions)


def watermark_stream_join(ds, *, key_col: str, ts_col: str,
                          seq_col: str, side_col: str, id_col: str,
                          value_col: str, window_us: int,
                          lateness_us: int, num_partitions: int = 8):
    """Watermark-gated STREAM-STREAM interval join, final-state
    semantics: both sides ride ONE keyed stream per key (arrival order
    = ``seq_col``), the shared per-key watermark ``max(prior ts) -
    lateness`` drops late events from EITHER side (the admission rule
    of :func:`watermark_sessions`), and every ADMITTED probe row
    (``side_col`` == 0) matches the admitted build rows (side 1) of
    its key with ``build_ts`` in ``[probe_ts - window_us, probe_ts)``.

    "Final state" means the result is the converged join after the
    stream drains -- matches do not depend on relative arrival order
    of probe vs build (a real engine reaches the same table through
    incremental updates); what IS order-dependent, the admission
    decision, follows the explicit seq order, so the whole operator is
    a pure function of the data and hence SQL-checkable.

    Returns one row per admitted probe: ``(id_col, n_matches,
    matched_v_c)`` with the exact integer-cents sum of matched build
    values (0 when none -- left semantics).  Late probes are dropped
    entirely, mirroring the window family's late-data contract.

    Scale shape: ONE keyed fold; admission is the shared grouped
    cummax, and the match pass is two ``searchsorted`` calls per KEY
    SEGMENT against that key's ts-sorted admitted builds (prefix-sum
    for the value sums) -- per-segment numpy, never per-row Python."""
    from ..partitions import keyed_fold

    def fold(b: pa.Table) -> pa.Table:
        empty = pa.table({
            id_col: pa.array([], pa.int64()),
            "n_matches": pa.array([], pa.int64()),
            "matched_v_c": pa.array([], pa.int64())})
        if b.num_rows == 0 or key_col not in b.column_names:
            return empty
        import pyarrow.compute as pc

        order = pc.sort_indices(
            b, sort_keys=[(key_col, "ascending"),
                          (seq_col, "ascending")])
        g = b.take(order)
        keys = g.column(key_col).to_numpy()
        ts_field = g.column(ts_col)
        if pa.types.is_timestamp(ts_field.type):
            tus = (ts_field.cast(pa.timestamp("us")).to_numpy()
                   .astype("datetime64[us]").astype(np.int64))
        else:
            tus = ts_field.to_numpy().astype(np.int64)
        side = g.column(side_col).to_numpy()
        ids = g.column(id_col).to_numpy()
        v_c = np.rint(g.column(value_col).to_numpy()
                      * 100.0).astype(np.int64)

        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        prev_max, no_prior = _prev_running_max(tus, starts)
        ok = no_prior | (tus > prev_max - lateness_us)

        # per key segment: ts-sorted admitted builds + vectorized
        # window count/sum for that segment's admitted probes
        bounds = np.r_[starts, len(keys)]
        out_id, out_n, out_v = [], [], []
        for si in range(len(starts)):
            s, e = bounds[si], bounds[si + 1]
            seg_ok = ok[s:e]
            seg_side = side[s:e]
            pm = seg_ok & (seg_side == 0)
            bm = seg_ok & (seg_side == 1)
            if not pm.any():
                continue
            p_ts = tus[s:e][pm]
            b_ts = tus[s:e][bm]
            border = np.argsort(b_ts, kind="stable")
            b_ts = b_ts[border]
            b_cum = np.concatenate(
                ([0], np.cumsum(v_c[s:e][bm][border])))
            hi = np.searchsorted(b_ts, p_ts, side="left")
            lo = np.searchsorted(b_ts, p_ts - window_us, side="left")
            out_id.append(ids[s:e][pm])
            out_n.append(hi - lo)
            out_v.append(b_cum[hi] - b_cum[lo])
        if not out_id:
            return empty
        return pa.table({
            id_col: pa.array(np.concatenate(out_id), pa.int64()),
            "n_matches": pa.array(
                np.concatenate(out_n).astype(np.int64), pa.int64()),
            "matched_v_c": pa.array(np.concatenate(out_v), pa.int64())})

    return keyed_fold(ds, [key_col], fold,
                      num_partitions=num_partitions)
