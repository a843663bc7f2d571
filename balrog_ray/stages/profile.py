"""Terrain profile extraction and point-to-point line-of-sight -- the
`gdallocationinfo`-along-a-line / `gdal_viewshed` single-ray roles
(reference access pattern: the per-site window read of
``testing/02_get_slope_from_buffer.py:204-251`` repeated along a
transect).  A profile densifies each (x0,y0)->(x1,y1) segment at
~pixel-size spacing and samples the tiled raster at every station; LOS
reduces one profile to a visibility verdict using the same
tangent-angle rule as ``stages/viewshed.py``.

Scale shape (two keyed shuffles, both shipping only sample rows):

1. lines explode to stations inside ``map_batches`` (no driver loop); a
   station keys to the ONE tile cell containing it, tiles of the layer
   key to their own cell, and ``groupby(cell_id)`` meets each tile with
   exactly the stations on it -- one decode + one vectorized gather per
   tile, the ``site_sample.sample_raster`` plan shape.  A transect
   crossing 1 000 tiles never decodes more than those 1 000 tiles, and
   no tile is decoded for transects that miss it.
2. ``line_of_sight`` re-keys the sampled stations by ``line_id`` (a few
   bytes each) and reduces each group with one vectorized pass.

Stations outside the grid or on nodata emit ``OUT_OF_AREA`` (-9999, the
reference's outside-raster sentinel) and are treated as sunken for LOS
-- present in the profile, never blocking -- matching viewshed's
nodata rule; an invalid observer or target station makes the line
``visible = false`` with ``n_valid`` telling the caller why.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .halo import GridSpec
from .site_sample import OUT_OF_AREA

_UNION_SCHEMA = pa.schema([
    ("cell_id", pa.int64()), ("side", pa.int8()),
    ("line_id", pa.string()), ("step", pa.int32()),
    ("n_steps", pa.int32()), ("dist_m", pa.float64()),
    ("x", pa.float64()), ("y", pa.float64()),
    ("bytes", pa.binary()), ("fmt", pa.string()),
    ("caption", pa.string())])

_OUT_FIELDS = ["line_id", "step", "n_steps", "dist_m", "x", "y"]


def profile_stations(x0, y0, x1, y1, step_m: float):
    """Station count + fractions for one segment: stations at
    ``t_i = i/(n-1)`` with n chosen so spacing <= step_m (n >= 2, so a
    degenerate zero-length line still yields observer + target)."""
    L = float(np.hypot(x1 - x0, y1 - y0))
    n = max(2, int(np.ceil(L / step_m)) + 1)
    t = np.arange(n, dtype=np.float64) / (n - 1)
    return L, n, t


def terrain_profile(lines_ds, tiles_ds, spec: GridSpec, *,
                    layer: str = "dem", step_m: float | None = None,
                    value_col: str = "z"):
    """``(line_id, x0, y0, x1, y1)`` Dataset x image-table Dataset ->
    per-station ``(line_id, step, n_steps, dist_m, x, y, value_col)``
    rows (row count conserved: every station of every line emits)."""
    T, ps, y_north = spec.tile_px, spec.pixel_size, spec.y_north
    tiles_x, tiles_y = spec.tiles_x, spec.tiles_y
    step = float(step_m) if step_m is not None else ps
    if step <= 0:
        raise ValueError("step_m must be positive")

    def explode(b: pa.Table) -> pa.Table:
        ids = b.column("line_id").to_pylist()
        x0s = b.column("x0").to_numpy()
        y0s = b.column("y0").to_numpy()
        x1s = b.column("x1").to_numpy()
        y1s = b.column("y1").to_numpy()
        lid, stp, nst, dst, exs, eys = [], [], [], [], [], []
        for i in range(len(ids)):
            L, n, t = profile_stations(x0s[i], y0s[i], x1s[i], y1s[i],
                                       step)
            lid.append(np.full(n, i, np.int64))
            stp.append(np.arange(n, dtype=np.int32))
            nst.append(np.full(n, n, np.int32))
            dst.append(t * L)
            exs.append(x0s[i] + t * (x1s[i] - x0s[i]))
            eys.append(y0s[i] + t * (y1s[i] - y0s[i]))
        if not lid:
            return pa.table({f.name: pa.array([], f.type)
                             for f in _UNION_SCHEMA},
                            schema=_UNION_SCHEMA)
        idx = np.concatenate(lid)
        xs = np.concatenate(exs)
        ys = np.concatenate(eys)
        tx = np.floor(xs / (T * ps)).astype(np.int64)
        ty = np.floor((y_north - ys) / (T * ps)).astype(np.int64)
        inside = (tx >= 0) & (tx < tiles_x) & (ty >= 0) & (ty < tiles_y)
        cell = np.where(inside, ty * tiles_x + tx, -1)
        m = len(xs)
        return pa.table({
            "cell_id": pa.array(cell, pa.int64()),
            "side": pa.array(np.zeros(m, dtype=np.int8)),
            "line_id": pa.array([ids[j] for j in idx], pa.string()),
            "step": pa.array(np.concatenate(stp)),
            "n_steps": pa.array(np.concatenate(nst)),
            "dist_m": pa.array(np.concatenate(dst), pa.float64()),
            "x": pa.array(xs, pa.float64()),
            "y": pa.array(ys, pa.float64()),
            "bytes": pa.nulls(m, pa.binary()),
            "fmt": pa.nulls(m, pa.string()),
            "caption": pa.nulls(m, pa.string())}, schema=_UNION_SCHEMA)

    def key_tiles(b: pa.Table) -> pa.Table:
        import json

        caps = b.column("caption").to_pylist()
        keep, cells = [], []
        for i, c in enumerate(caps):
            d = json.loads(c)
            if d["layer"] == layer:
                keep.append(i)
                cells.append(int(d["ty"]) * tiles_x + int(d["tx"]))
        t = b.take(pa.array(keep, pa.int64()))
        n = t.num_rows
        return pa.table({
            "cell_id": pa.array(cells, pa.int64()),
            "side": pa.array(np.ones(n, dtype=np.int8)),
            "line_id": pa.nulls(n, pa.string()),
            "step": pa.nulls(n, pa.int32()),
            "n_steps": pa.nulls(n, pa.int32()),
            "dist_m": pa.nulls(n, pa.float64()),
            "x": pa.nulls(n, pa.float64()),
            "y": pa.nulls(n, pa.float64()),
            "bytes": t.column("bytes"), "fmt": t.column("fmt"),
            "caption": t.column("caption")}, schema=_UNION_SCHEMA)

    def lookup(group: pa.Table) -> pa.Table:
        from ..tiles.codec import Caption, decode_tile

        side = group.column("side").to_numpy()
        is_pt = side == 0
        pts = group.filter(pa.array(is_pt))
        if pts.num_rows == 0:
            cols = {f: pa.array([], _UNION_SCHEMA.field(f).type)
                    for f in _OUT_FIELDS}
            cols[value_col] = pa.array([], pa.float64())
            return pa.table(cols)
        xs = pts.column("x").to_numpy()
        ys = pts.column("y").to_numpy()
        vals = np.full(len(xs), OUT_OF_AREA)
        tiles = group.filter(pa.array(~is_pt))
        if tiles.num_rows:
            cap = Caption.from_json(tiles.column("caption")[0].as_py())
            arr = decode_tile(tiles.column("bytes")[0].as_py(),
                              tiles.column("fmt")[0].as_py(), cap)
            col = np.floor(xs / ps).astype(np.int64) - cap.tx * T
            row = np.floor((y_north - ys) / ps).astype(np.int64) \
                - cap.ty * T
            ok = (col >= 0) & (col < arr.shape[1]) \
                & (row >= 0) & (row < arr.shape[0])
            v = arr[row[ok], col[ok]].astype(np.float64)
            v[v == float(cap.nodata)] = OUT_OF_AREA
            vals[ok] = v
        cols = {f: pts.column(f) for f in _OUT_FIELDS}
        cols[value_col] = pa.array(vals, pa.float64())
        return pa.table(cols)

    both = (lines_ds.map_batches(explode, batch_format="pyarrow")
            .union(tiles_ds.map_batches(key_tiles,
                                        batch_format="pyarrow")))
    return (both.groupby("cell_id")
            .map_groups(lookup, batch_format="pyarrow"))


def line_of_sight(lines_ds, tiles_ds, spec: GridSpec, *,
                  layer: str = "dem", observer_height: float = 0.0,
                  target_height: float = 0.0,
                  step_m: float | None = None):
    """Point-to-point visibility per line, viewshed's tangent-angle rule
    along the densified profile: the target is visible iff its tangent
    from the raised observer is >= every intermediate station's tangent.
    Returns ``(line_id, visible, n_steps, n_valid, first_block_step)``;
    ``first_block_step`` is the nearest blocking station (-1 if none).
    Invalid (out-of-area / nodata) observer or target -> not visible."""
    prof = terrain_profile(lines_ds, tiles_ds, spec, layer=layer,
                           step_m=step_m)

    def verdict(group: pa.Table) -> pa.Table:
        order = np.argsort(group.column("step").to_numpy())
        z = group.column("z").to_numpy()[order]
        d = group.column("dist_m").to_numpy()[order]
        n = len(z)
        valid = z != OUT_OF_AREA
        n_valid = int(valid.sum())
        vis, first = False, -1
        if valid[0] and valid[-1]:
            z_obs = z[0] + observer_height
            if n == 2 or d[-1] == 0.0:
                vis = True
            else:
                t_ang = (z[-1] + target_height - z_obs) / d[-1]
                mids = slice(1, n - 1)
                mz = np.where(valid[mids], z[mids], -np.inf)
                tans = (mz - z_obs) / d[mids]
                blocked = tans > t_ang
                vis = not blocked.any()
                if not vis:
                    first = int(np.flatnonzero(blocked)[0]) + 1
        return pa.table({
            "line_id": pa.array([group.column("line_id")[0].as_py()],
                                pa.string()),
            "visible": pa.array([vis], pa.bool_()),
            "n_steps": pa.array([n], pa.int32()),
            "n_valid": pa.array([n_valid], pa.int32()),
            "first_block_step": pa.array([first], pa.int32())})

    return prof.groupby("line_id").map_groups(verdict,
                                              batch_format="pyarrow")
