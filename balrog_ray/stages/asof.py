"""As-of (nearest-preceding) join -- a join shape Ray Data has no primitive
for, composed from union + one keyed shuffle + per-group sorted merge.

For every left row, find the right row with the greatest ``right_ts <=
left_ts`` for the same key (ties broken by the greatest payload tuple).
The reference has no as-of join (SURVEY §2.3 notes the gap); this is part
of the engine's beyond-reference surface, with semantics pinned by a DuckDB
correlated-subquery oracle in relational/queries.py.

Shape: both sides are normalized to one schema (side tag + nulls for the
other side's columns), unioned, and shuffled ONCE by key; the per-group
merge sorts the right rows and answers every left row with one vectorized
``searchsorted``.  At 10^12 scale the shuffle is the only all-to-all; skew
on a hot key is bounded by that key's own row count (salt upstream if a
single key exceeds a block).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _ts_us(col: pa.ChunkedArray) -> np.ndarray:
    """Any temporal/numeric column -> int64 microseconds (dates become
    midnight, matching SQL date->timestamp comparison)."""
    if pa.types.is_date(col.type):
        col = col.cast(pa.timestamp("us"))
    elif pa.types.is_timestamp(col.type):
        col = col.cast(pa.timestamp("us"))
    return col.to_numpy().astype("datetime64[us]").astype(np.int64) \
        if pa.types.is_timestamp(col.type) else col.to_numpy().astype(np.int64)


def asof_join(left_ds, right_ds, *, left_key: str, right_key: str,
              left_ts: str, right_ts: str, right_payload: list[str]):
    """Inner as-of join; emits every left column plus ``right_payload``
    columns of the matched right row.  Left rows with no match are dropped
    (inner semantics)."""
    left_schema = left_ds.schema()
    left_cols = [c for c in left_schema.names]
    clash = set(left_cols) & set(right_payload)
    if clash:
        raise ValueError(
            f"right_payload columns {sorted(clash)} collide with left "
            "columns; rename one side before joining")
    payload_types = {}

    right_schema = right_ds.schema()
    for c in right_payload:
        payload_types[c] = right_schema.types[right_schema.names.index(c)]
    left_types = {c: left_schema.types[left_schema.names.index(c)]
                  for c in left_cols}

    # keys keep their own type (string/int/...); rows with NULL keys are
    # dropped on both sides (SQL inner-join semantics), and the right key
    # is cast to the left key's type so the union schema agrees
    key_type = left_schema.types[left_schema.names.index(left_key)]

    def norm_left(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.is_valid(b.column(left_key)))
        n = b.num_rows
        cols = {
            "__key": b.column(left_key).cast(key_type),
            "__ts": pa.array(_ts_us(b.column(left_ts))),
            "__side": pa.array(np.zeros(n, dtype=np.int8)),
        }
        for c in left_cols:
            cols[f"l_{c}"] = b.column(c)
        for c in right_payload:
            cols[f"r_{c}"] = pa.nulls(n, payload_types[c])
        return pa.table(cols)

    def norm_right(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.is_valid(b.column(right_key)))
        n = b.num_rows
        cols = {
            "__key": b.column(right_key).cast(key_type),
            "__ts": pa.array(_ts_us(b.column(right_ts))),
            "__side": pa.array(np.ones(n, dtype=np.int8)),
        }
        for c in left_cols:
            cols[f"l_{c}"] = pa.nulls(n, left_types[c])
        for c in right_payload:
            cols[f"r_{c}"] = b.column(c)
        return pa.table(cols)

    both = (left_ds.map_batches(norm_left, batch_format="pyarrow")
            .union(right_ds.map_batches(norm_right,
                                        batch_format="pyarrow")))

    def merge_block(b: pa.Table) -> pa.Table:
        """Whole hash partition per call: COMPLETE key groups, many at a
        time (keyed_fold) -- one multi-key arrow sort, then a numpy
        sweep over key segments, instead of round 3's per-GROUP
        ``map_groups`` Python call (~45us/group floor)."""
        empty_cols = {f"l_{c}": pa.array([], left_types[c])
                      for c in left_cols}
        empty_cols.update({f"r_{c}": pa.array([], payload_types[c])
                           for c in right_payload})
        renames = {f"l_{c}": c for c in left_cols}
        renames.update({f"r_{c}": c for c in right_payload})

        def finish(out: pa.Table) -> pa.Table:
            return out.rename_columns(
                [renames[n] for n in out.schema.names])

        if b.num_rows == 0 or "__key" not in b.column_names:
            return finish(pa.table(empty_cols))
        order = pc.sort_indices(
            b, sort_keys=[("__key", "ascending"),
                          ("__side", "ascending"),
                          ("__ts", "ascending")]
            + [(f"r_{c}", "ascending") for c in right_payload])
        b = b.take(order)
        key_np = b.column("__key").to_numpy(zero_copy_only=False)
        side = b.column("__side").to_numpy()
        ts = b.column("__ts").to_numpy()
        starts = np.flatnonzero(
            np.r_[True, key_np[1:] != key_np[:-1]])
        bounds = np.r_[starts, len(key_np)]
        left_rows: list[np.ndarray] = []
        right_rows: list[np.ndarray] = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            seg_side = side[s:e]
            n_l = int(np.searchsorted(seg_side, 1))   # lefts first
            if n_l == 0 or n_l == e - s:
                continue
            r_ts = ts[s + n_l:e]
            l_ts = ts[s:s + n_l]
            idx = np.searchsorted(r_ts, l_ts, side="right") - 1
            hit = idx >= 0
            if not hit.any():
                continue
            left_rows.append(np.arange(s, s + n_l)[hit])
            right_rows.append(s + n_l + idx[hit])
        if not left_rows:
            return finish(pa.table(empty_cols))
        li = pa.array(np.concatenate(left_rows), pa.int64())
        ri = pa.array(np.concatenate(right_rows), pa.int64())
        cols = {f"l_{c}": b.column(f"l_{c}").take(li)
                for c in left_cols}
        for c in right_payload:
            cols[f"r_{c}"] = b.column(f"r_{c}").take(ri)
        return finish(pa.table(cols))

    from ..partitions import keyed_fold, shuffle_width

    return keyed_fold(both, ["__key"], merge_block,
                      num_partitions=shuffle_width(1, lo=8))
