"""Distributed polygonize: raster -> vector regions (gdal_polygonize's
role; the raster->vector direction of the north rule's raster<->vector
pair, complementing ``geo/geometry.rasterize``).  Connected regions of
equal pixel value (4-connectivity, the GDAL default) are labeled
GLOBALLY across tile boundaries and reduced to one row per region:
``(region_id, value, n_px, xmin, ymin, xmax, ymax)`` in world coords.

Scale shape -- no halo, no full-raster pass:

1. ONE decode+label pass (stateless ``map_batches``): per-tile
   union-find over equal-value pixel adjacencies, per-label partial
   stats (count + bbox) via scatter reductions, and the tile's border
   strips (values + packed global region ids) keyed by the SHARED edge
   id.  The pass emits a compact table -- one row per region partial
   plus four sliver rows per tile (~1-3% of input bytes) -- which is
   materialized so the two consumers below don't re-decode the raster
   (at petabyte scale, checkpoint it to parquet instead);
2. ``groupby(edge)`` over the border strips emits cross-tile
   same-value region pairs, and the existing tree-reduce union-find
   (``functions/components.py``) contracts the pair graph -- bounded
   by border-crossing regions, never pixels;
3. a hash join + ``groupby(region)`` folds the per-tile partials into
   global regions.  Interior-only regions never enter the pair graph.

Equality is exact float comparison: polygonize is for CATEGORICAL
layers (veg classes, BAL bands); run continuous layers through
``core/remap`` or ``stages/raster_calc`` first.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .halo import GridSpec

_LABEL_BITS = 20                     # local labels per tile < 2^20

_COMBINED_SCHEMA = pa.schema([
    ("kind", pa.int8()),             # 0 = region partial, 1 = border strip
    ("gid", pa.int64()), ("value", pa.float64()), ("n_px", pa.int64()),
    ("rmin", pa.int64()), ("rmax", pa.int64()),
    ("cmin", pa.int64()), ("cmax", pa.int64()),
    ("edge_id", pa.int64()), ("side", pa.int8()),
    ("vals", pa.binary()), ("gids", pa.binary())])


def _label_tile(arr: np.ndarray, nodata: float):
    """4-connectivity connected-component labeling of one tile.
    Returns (labels, n_labels): int32 array with -1 at nodata pixels,
    labels compact in [0, n_labels).  Fully vectorized
    Shiloach-Vishkin-style hooking (``np.minimum.at`` over the edge
    list) + pointer jumping -- O(E log n) numpy kernels, 10-20x faster
    than a per-edge Python union-find at 256 px tiles."""
    H, W = arr.shape
    valid = arr != np.float32(nodata)
    idx = np.arange(H * W, dtype=np.int64).reshape(H, W)
    right = valid[:, :-1] & valid[:, 1:] & (arr[:, :-1] == arr[:, 1:])
    down = valid[:-1, :] & valid[1:, :] & (arr[:-1, :] == arr[1:, :])
    ea = np.concatenate([idx[:, :-1][right], idx[:-1, :][down]])
    eb = np.concatenate([idx[:, 1:][right], idx[1:, :][down]])

    parent = np.arange(H * W, dtype=np.int64)
    while True:
        pa_, pb_ = parent[ea], parent[eb]
        lo = np.minimum(pa_, pb_)
        hi = np.maximum(pa_, pb_)
        m = lo != hi
        if not m.any():
            break
        np.minimum.at(parent, hi[m], lo[m])      # hook higher root to lower
        while True:                              # pointer jumping
            nxt = parent[parent]
            if np.array_equal(nxt, parent):
                break
            parent = nxt

    flat_valid = valid.ravel()
    roots = parent[np.flatnonzero(flat_valid)]
    labels = np.full(H * W, -1, dtype=np.int32)
    if len(roots):
        uniq, compact = np.unique(roots, return_inverse=True)
        labels[flat_valid] = compact.astype(np.int32)
        n = len(uniq)
    else:
        n = 0
    return labels.reshape(H, W), n


def polygonize(ds, spec: GridSpec, *, layer: str, num_partitions: int = 8):
    """Image-table Dataset -> one-row-per-region Dataset
    ``(region_id, value, n_px, xmin, ymin, xmax, ymax)``; region_id is
    the minimum packed (cell, local-label) id of the region, bbox is
    pixel-edge world coordinates."""
    if spec.tile_px * spec.tile_px >= (1 << _LABEL_BITS):
        raise ValueError(
            f"tile_px {spec.tile_px} packs more than 2^{_LABEL_BITS} "
            f"labels; raise _LABEL_BITS or re-tile")
    T, ps, y_north = spec.tile_px, spec.pixel_size, spec.y_north
    tiles_x, tiles_y = spec.tiles_x, spec.tiles_y

    def label_stage(b: pa.Table) -> pa.Table:
        import json

        from ..tiles.codec import Caption, decode_tile

        out = {n: [] for n in _COMBINED_SCHEMA.names}

        def part_row(**kw):
            for n in _COMBINED_SCHEMA.names:
                out[n].append(kw.get(n))

        for i in range(b.num_rows):
            cap_raw = b.column("caption")[i].as_py()
            if json.loads(cap_raw).get("layer") != layer:
                continue
            cap = Caption.from_json(cap_raw)
            arr = decode_tile(b.column("bytes")[i].as_py(),
                              b.column("fmt")[i].as_py(), cap)
            tx, ty = cap.tx, cap.ty
            cell = spec.cell_id(tx, ty)
            labels, n_lab = _label_tile(arr, float(cap.nodata))
            base = np.int64(cell) << _LABEL_BITS
            if n_lab:
                flat = labels.ravel()
                sel = flat >= 0
                lab = flat[sel].astype(np.int64)
                rows = np.repeat(np.arange(arr.shape[0], dtype=np.int64),
                                 arr.shape[1])[sel] + ty * T
                cols = np.tile(np.arange(arr.shape[1], dtype=np.int64),
                               arr.shape[0])[sel] + tx * T
                counts = np.bincount(lab, minlength=n_lab)
                rmin = np.full(n_lab, np.iinfo(np.int64).max)
                rmax = np.full(n_lab, -1, dtype=np.int64)
                cmin = np.full(n_lab, np.iinfo(np.int64).max)
                cmax = np.full(n_lab, -1, dtype=np.int64)
                np.minimum.at(rmin, lab, rows)
                np.maximum.at(rmax, lab, rows)
                np.minimum.at(cmin, lab, cols)
                np.maximum.at(cmax, lab, cols)
                vals = np.zeros(n_lab, dtype=np.float64)
                vals[lab] = arr.ravel()[sel]         # equal within a region
                for j in range(n_lab):
                    part_row(kind=0, gid=int(base) + j,
                             value=float(vals[j]), n_px=int(counts[j]),
                             rmin=int(rmin[j]), rmax=int(rmax[j]),
                             cmin=int(cmin[j]), cmax=int(cmax[j]))
            # border strips keyed by the SHARED edge: the vertical
            # boundary between (tx,ty)-(tx+1,ty) is edge cell_id*2 of the
            # LEFT cell; the horizontal boundary between (tx,ty)-(tx,ty+1)
            # is edge cell_id*2+1 of the TOP cell.  side 0 = owner's
            # strip, side 1 = the neighbour's facing strip.
            gid2d = np.where(labels >= 0,
                             base + labels.astype(np.int64),
                             np.int64(-1))
            for vline, gline, eid, ok, side in (
                (arr[:, -1], gid2d[:, -1],
                 np.int64(cell) * 2, tx + 1 < tiles_x, 0),
                (arr[:, 0], gid2d[:, 0],
                 np.int64(spec.cell_id(tx - 1, ty)) * 2, tx > 0, 1),
                (arr[-1, :], gid2d[-1, :],
                 np.int64(cell) * 2 + 1, ty + 1 < tiles_y, 0),
                (arr[0, :], gid2d[0, :],
                 np.int64(spec.cell_id(tx, ty - 1)) * 2 + 1, ty > 0, 1),
            ):
                if not ok:
                    continue
                part_row(kind=1, edge_id=int(eid), side=side,
                         vals=np.ascontiguousarray(
                             vline, dtype=np.float32).tobytes(),
                         gids=np.ascontiguousarray(gline).tobytes())
        return pa.table(out, schema=_COMBINED_SCHEMA)

    combined = (ds.map_batches(label_stage, batch_format="pyarrow")
                .materialize())
    parts_ds = (combined.filter(expr="kind == 0")
                .select_columns(["gid", "value", "n_px",
                                 "rmin", "rmax", "cmin", "cmax"]))
    strips_ds = (combined.filter(expr="kind == 1")
                 .select_columns(["edge_id", "side", "vals", "gids"]))

    def cross_edges(group: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64())})
        if group.num_rows != 2:
            return empty            # missing neighbour tile
        side = group.column("side").to_pylist()
        a, b_ = (0, 1) if side[0] == 0 else (1, 0)
        va = np.frombuffer(group.column("vals")[a].as_py(), np.float32)
        vb = np.frombuffer(group.column("vals")[b_].as_py(), np.float32)
        ga = np.frombuffer(group.column("gids")[a].as_py(), np.int64)
        gb = np.frombuffer(group.column("gids")[b_].as_py(), np.int64)
        match = (va == vb) & (ga >= 0) & (gb >= 0)
        if not match.any():
            return empty
        pairs = np.unique(
            np.stack([ga[match], gb[match]], axis=1), axis=0)
        return pa.table({"id_a": pa.array(pairs[:, 0], pa.int64()),
                         "id_b": pa.array(pairs[:, 1], pa.int64())})

    edges_ds = (strips_ds.groupby("edge_id")
                .map_groups(cross_edges, batch_format="pyarrow"))

    from ..functions.components import connected_components

    mapping = connected_components(edges_ds, "id_a", "id_b")

    joined = parts_ds.join(mapping, "left_outer",
                           num_partitions=num_partitions,
                           on=("gid",), right_on=("doc_id",))

    def canonical(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        comp = pc.coalesce(b.column("component_id"), b.column("gid"))
        return pa.table({
            "region_id": comp, "value": b.column("value"),
            "n_px": b.column("n_px"), "rmin": b.column("rmin"),
            "rmax": b.column("rmax"), "cmin": b.column("cmin"),
            "cmax": b.column("cmax")})

    import ray.data.aggregate as agg

    folded = (joined.map_batches(canonical, batch_format="pyarrow")
              .groupby("region_id")
              .aggregate(agg.Max("value", alias_name="value"),
                         agg.Sum("n_px", alias_name="n_px"),
                         agg.Min("rmin", alias_name="rmin"),
                         agg.Max("rmax", alias_name="rmax"),
                         agg.Min("cmin", alias_name="cmin"),
                         agg.Max("cmax", alias_name="cmax")))

    def world(b: pa.Table) -> pa.Table:
        rmin = b.column("rmin").to_numpy()
        rmax = b.column("rmax").to_numpy()
        cmin = b.column("cmin").to_numpy()
        cmax = b.column("cmax").to_numpy()
        return pa.table({
            "region_id": b.column("region_id"),
            "value": b.column("value"),
            "n_px": b.column("n_px"),
            "xmin": pa.array(cmin * ps, pa.float64()),
            "ymin": pa.array(y_north - (rmax + 1) * ps, pa.float64()),
            "xmax": pa.array((cmax + 1) * ps, pa.float64()),
            "ymax": pa.array(y_north - rmin * ps, pa.float64())})

    return folded.map_batches(world, batch_format="pyarrow")
