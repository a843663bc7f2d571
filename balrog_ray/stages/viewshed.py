"""Per-site bounded-radius viewshed over the tiled DEM -- the visibility
analysis of the gdal_viewshed / ArcGIS Viewshed family, restricted to a
finite radius so it tiles (the same bounded-reach trick the BAL scan
itself uses: AS 3959 only looks 100 m, ``calculate_bal.py:169``).

Semantics (R3 line-of-sight, the textbook exact algorithm):

* observer stands at the center of the pixel containing the site, at
  ``dem[site] + observer_height``;
* a target pixel within ``radius_m`` is visible iff its elevation angle
  from the observer is >= the maximum angle of every intermediate sample
  along the straight ray between the two pixel centers; ties see.
  Rays are sampled at 1/n fractions (n = Chebyshev pixel distance) with
  bilinear interpolation;
* nodata / out-of-raster targets are excluded from both counts;
  nodata contributions to an intermediate sample never block (their
  elevation reads as -1e9) -- documented, deterministic choice;
* adjacent pixels (n = 1, no intermediate sample) are always visible.

Scale shape: ONE keyed shuffle.  Sites key to the cell whose tile
contains them; tiles fan radius-sized edge strips with the shared halo
emitter; ``groupby(cell_id)`` meets each site with exactly the window it
can see (site anywhere in a tile + radius halo).  Per-group compute is
fully vectorized: ray sample indices / bilinear weights are precomputed
ONCE PER WORKER PROCESS (module-level cache keyed by radius -- the
actor-``__init__`` idiom for ``map_groups`` tasks) and reused as pure
gather + running-max kernels over site chunks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .focal import FocalGridSpec, make_strip_emitter_batch
from .halo import GridSpec, assemble_window

#: elevation substituted for nodata cells during ray interpolation:
#: deep enough that a nodata neighbourhood never blocks a sight line
_SUNKEN = -1e9

_UNION_SCHEMA = pa.schema([
    ("cell_id", pa.int64()), ("is_site", pa.bool_()),
    ("site_id", pa.string()), ("x", pa.float64()), ("y", pa.float64()),
    ("layer", pa.string()),
    ("row0", pa.int32()), ("col0", pa.int32()),
    ("h", pa.int32()), ("w", pa.int32()),
    ("payload", pa.binary()), ("fmt", pa.string()),
    ("caption", pa.string()), ("is_core", pa.bool_())])

RESULT_SCHEMA = pa.schema([
    ("site_id", pa.string()), ("x", pa.float64()), ("y", pa.float64()),
    ("visible_px", pa.int64()), ("total_px", pa.int64()),
    ("visible_frac", pa.float64())])

#: per-worker-process cache of ray geometry, keyed by pixel radius
_GEOM_CACHE: dict[int, "_RayGeom"] = {}


class _RayGeom:
    """Precomputed ray sampling for a (2R+1)^2 window: for every target
    pixel within R (euclidean), the bilinear gather indices + weights of
    its intermediate ray samples and its own center index.  ~R^3 * 4
    int32/float32 entries (33 k samples at R=20) -- built once per worker
    process and shared by every group task."""

    def __init__(self, rad_px: int):
        R = self.R = rad_px
        side = self.side = 2 * R + 1
        dr, dc = np.mgrid[-R:R + 1, -R:R + 1]
        dist = np.hypot(dr, dc)
        sel = (dist > 0) & (dist <= R)
        self.tdr = dr[sel].astype(np.int64)          # (n_targets,)
        self.tdc = dc[sel].astype(np.int64)
        self.tdist = dist[sel]                       # pixel units
        self.tidx = ((self.tdr + R) * side
                     + (self.tdc + R)).astype(np.int64)
        n_t = len(self.tdr)
        cheb = np.maximum(np.abs(self.tdr), np.abs(self.tdc))
        S = int(cheb.max()) - 1                      # max intermediate rows
        self.n_samples = np.maximum(cheb - 1, 0)     # per target
        # fractional sample positions k/n, k = 1..n-1, padded to S
        k = np.arange(1, S + 1)[None, :]             # (1, S)
        frac = k / cheb[:, None].astype(np.float64)  # (n_t, S)
        self.smask = k <= (cheb - 1)[:, None]        # valid samples
        ry = self.tdr[:, None] * frac + R            # window-row coords
        rx = self.tdc[:, None] * frac + R
        ry = np.clip(ry, 0, side - 1)
        rx = np.clip(rx, 0, side - 1)
        r0 = np.clip(np.floor(ry).astype(np.int64), 0, side - 2)
        c0 = np.clip(np.floor(rx).astype(np.int64), 0, side - 2)
        fy = (ry - r0).astype(np.float32)
        fx = (rx - c0).astype(np.float32)
        self.i00 = r0 * side + c0
        self.i01 = self.i00 + 1
        self.i10 = self.i00 + side
        self.i11 = self.i10 + 1
        self.w00 = (1 - fy) * (1 - fx)
        self.w01 = (1 - fy) * fx
        self.w10 = fy * (1 - fx)
        self.w11 = fy * fx
        # distance of sample k along the ray, pixel units (n_t, S)
        self.sdist = (self.tdist[:, None] * frac).astype(np.float64)
        self.nts = n_t * max(S, 1)

    def counts_batch(self, wins: np.ndarray, obs_height: float,
                     ps: float, nodata: float):
        """``wins``: (m, side*side) float32 windows, each centered on its
        observer pixel (nodata where out of raster).  Returns
        ``(visible, total)`` int64 arrays of shape (m,) -- all-zero rows
        where the observer pixel itself is nodata."""
        nd = np.float32(nodata)
        ctr = (self.side * self.side) // 2
        obs_ok = wins[:, ctr] != nd
        z = np.where(wins == nd, _SUNKEN, wins.astype(np.float64))
        eff = z[:, ctr] + obs_height                       # (m,)
        if self.sdist.shape[1] == 0:                 # radius 1: no samples
            block = np.full((wins.shape[0], len(self.tidx)), -np.inf)
        else:
            zs = (self.w00 * z[:, self.i00] + self.w01 * z[:, self.i01]
                  + self.w10 * z[:, self.i10] + self.w11 * z[:, self.i11])
            tan = (zs - eff[:, None, None]) / (self.sdist * ps)[None]
            tan = np.where(self.smask[None], tan, -np.inf)
            block = tan.max(axis=2)                        # (m, n_t)
        valid_t = wins[:, self.tidx] != nd                 # (m, n_t)
        t_ang = (z[:, self.tidx] - eff[:, None]) / (self.tdist * ps)[None]
        vis = (valid_t & (t_ang >= block)).sum(axis=1).astype(np.int64)
        tot = valid_t.sum(axis=1).astype(np.int64)
        vis[~obs_ok] = 0
        tot[~obs_ok] = 0
        return vis, tot


def _geom(rad_px: int) -> _RayGeom:
    g = _GEOM_CACHE.get(rad_px)
    if g is None:
        g = _GEOM_CACHE[rad_px] = _RayGeom(rad_px)
    return g


def site_viewshed(sites_ds, tiles_ds, spec: GridSpec, *,
                  radius_m: float, observer_height: float = 1.8,
                  layer: str = "dem"):
    """``(site_id, x, y)`` Dataset x image-table Dataset ->
    ``(site_id, x, y, visible_px, total_px, visible_frac)``.

    Sites outside the grid or on a nodata pixel emit 0 / 0 / 0.0 --
    row counts are conserved (the reference's outside-raster convention,
    ``02_get_slope_from_buffer.py:266-273``)."""
    rad_px = int(np.ceil(radius_m / spec.pixel_size))
    if rad_px < 1:
        raise ValueError("radius_m smaller than one pixel")
    if rad_px >= spec.tile_px:
        raise ValueError(
            f"radius {rad_px} px >= tile_px {spec.tile_px}: re-tile "
            f"coarser or lower the radius (strips are single-hop)")
    fspec = FocalGridSpec(spec.tiles_x, spec.tiles_y, spec.tile_px,
                          spec.pixel_size, spec.y_north, radius=rad_px)
    T, ps, y_north = fspec.tile_px, fspec.pixel_size, fspec.y_north
    tiles_x, tiles_y = fspec.tiles_x, fspec.tiles_y
    side = 2 * rad_px + 1

    def key_sites(b: pa.Table) -> pa.Table:
        xs = b.column("x").to_numpy()
        ys = b.column("y").to_numpy()
        tx = np.floor(xs / (T * ps)).astype(np.int64)
        ty = np.floor((y_north - ys) / (T * ps)).astype(np.int64)
        inside = (tx >= 0) & (tx < tiles_x) & (ty >= 0) & (ty < tiles_y)
        cell = np.where(inside, ty * tiles_x + tx, -1)
        n = len(xs)
        return pa.table({
            "cell_id": pa.array(cell, pa.int64()),
            "is_site": pa.array(np.ones(n, bool)),
            "site_id": b.column("site_id"),
            "x": b.column("x"), "y": b.column("y"),
            "layer": pa.nulls(n, pa.string()),
            "row0": pa.nulls(n, pa.int32()),
            "col0": pa.nulls(n, pa.int32()),
            "h": pa.nulls(n, pa.int32()), "w": pa.nulls(n, pa.int32()),
            "payload": pa.nulls(n, pa.binary()),
            "fmt": pa.nulls(n, pa.string()),
            "caption": pa.nulls(n, pa.string()),
            "is_core": pa.array(np.zeros(n, bool))}, schema=_UNION_SCHEMA)

    emit = make_strip_emitter_batch(fspec)

    def key_tiles(b: pa.Table) -> pa.Table:
        import json

        caps = b.column("caption").to_pylist()
        keep = [i for i, c in enumerate(caps)
                if json.loads(c)["layer"] == layer]
        t = emit(b.take(pa.array(keep, pa.int64())))
        n = t.num_rows
        return pa.table({
            "cell_id": t.column("cell_id"),
            "is_site": pa.array(np.zeros(n, bool)),
            "site_id": pa.nulls(n, pa.string()),
            "x": pa.nulls(n, pa.float64()), "y": pa.nulls(n, pa.float64()),
            "layer": t.column("layer"),
            "row0": t.column("row0"), "col0": t.column("col0"),
            "h": t.column("h"), "w": t.column("w"),
            "payload": t.column("payload"), "fmt": t.column("fmt"),
            "caption": t.column("caption"),
            "is_core": t.column("is_core")}, schema=_UNION_SCHEMA)

    def compute(group: pa.Table) -> pa.Table:
        is_site = group.column("is_site").to_numpy()
        sites = group.filter(pa.array(is_site))
        if sites.num_rows == 0:
            return pa.table({c: [] for c in RESULT_SCHEMA.names},
                            schema=RESULT_SCHEMA)
        n = sites.num_rows
        xs = sites.column("x").to_numpy()
        ys = sites.column("y").to_numpy()
        vis = np.zeros(n, np.int64)
        tot = np.zeros(n, np.int64)
        cell = int(group.column("cell_id")[0].as_py())
        if cell >= 0:
            from .halo import NODATA

            tx, ty = cell % tiles_x, cell // tiles_x
            g = group.filter(pa.array(~is_site)).to_pydict()
            canvas = assemble_window(g, fspec, layer, tx, ty)
            if canvas is not None:
                r0, r1, c0, c1 = fspec.assembled_window(tx, ty)
                geom = _geom(rad_px)
                nd = np.float32(NODATA)
                # pad the edge-clipped canvas so every site window is a
                # full side^2 (out-of-raster cells read as nodata)
                pad = np.full((r1 - r0 + 2 * rad_px,
                               c1 - c0 + 2 * rad_px), nd, np.float32)
                pad[rad_px:rad_px + canvas.shape[0],
                    rad_px:rad_px + canvas.shape[1]] = canvas
                pr = np.floor((y_north - ys) / ps).astype(np.int64)
                pc_ = np.floor(xs / ps).astype(np.int64)
                rr = pr - r0 + rad_px                  # pad coords
                cc = pc_ - c0 + rad_px
                offs = np.arange(side * side, dtype=np.int64)
                off_r = offs // side - rad_px
                off_c = offs % side - rad_px
                # memory-bounded chunks: the (m, n_targets, S) ray
                # intermediates dominate, ~6 float64 temporaries each
                step = max(1, (1 << 21) // max(1, geom.nts))
                for i0 in range(0, n, step):
                    sl = slice(i0, min(n, i0 + step))
                    wins = pad[rr[sl, None] + off_r[None, :],
                               cc[sl, None] + off_c[None, :]]
                    vis[sl], tot[sl] = geom.counts_batch(
                        wins, observer_height, ps, float(nd))
        with np.errstate(invalid="ignore", divide="ignore"):
            frac = np.where(tot > 0, vis / np.maximum(tot, 1), 0.0)
        return pa.table({
            "site_id": sites.column("site_id"),
            "x": sites.column("x"), "y": sites.column("y"),
            "visible_px": pa.array(vis, pa.int64()),
            "total_px": pa.array(tot, pa.int64()),
            "visible_frac": pa.array(frac, pa.float64())},
            schema=RESULT_SCHEMA)

    both = (sites_ds.map_batches(key_sites, batch_format="pyarrow")
            .union(tiles_ds.map_batches(key_tiles,
                                        batch_format="pyarrow")))
    return (both.groupby("cell_id")
            .map_groups(compute, batch_format="pyarrow"))
