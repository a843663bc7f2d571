"""Scattered-point gridding: inverse-distance-weighted interpolation of
a point table onto the tile grid -- the ``gdal_grid`` (invdist
algorithm) role, the vector->raster complement of ``stages/site_sample``
(raster->vector point probe).  The reference ecosystem reaches this
through GDAL's gridding utilities; the engine expresses it as the
standard emit/assemble shape.

Semantics (pinned by the brute-force oracle in tests/test_gridding.py):
for each target pixel center p::

    value(p) = sum(v_i / max(d_i, eps)^power)
             / sum(1 / max(d_i, eps)^power)     over points with d_i <= radius

``eps`` = 1e-9 world units (a point exactly on a pixel center dominates
without a 1/0 special case); pixels with no point within ``radius``
are nodata.  Deterministic: points are sorted by (x, y, value) before
accumulation so float-sum order never depends on shuffle arrival order.

Scale shape: ONE pass over the point table replicates each point to
every tile whose extent dilated by ``radius`` contains it (bounded
fan-out <= (1 + 2*radius/tile_m)^2 rows -- radius must stay of tile
order, exactly like the halo rule), then ONE ``groupby(cell_id)``
interpolates each tile independently.  Per-tile work is
O(points x window^2) via bounded per-point windows, never a full
points-x-pixels distance matrix.  No raster is ever assembled whole;
empty cells are simply absent from the output (resume-friendly).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..tiles.codec import Caption, encode_tile, phash64
from ..tiles.synth import TILES_SCHEMA
from .halo import GridSpec

NODATA = -99.0
EPS = 1e-9

_PT_SCHEMA = pa.schema([
    ("cell_id", pa.int64()),
    ("x", pa.float64()), ("y", pa.float64()), ("v", pa.float64())])


def idw_kernel(points: np.ndarray, values: np.ndarray, x0: float,
               y0: float, ps: float, shape: tuple[int, int],
               radius: float, power: float) -> np.ndarray:
    """IDW over one tile window (top-left world ``(x0, y0)``): bounded
    per-point accumulation windows, float64 sums, float32 out."""
    H, W = shape
    num = np.zeros((H, W), np.float64)
    den = np.zeros((H, W), np.float64)
    r_px = int(np.ceil(radius / ps)) + 1
    for (px, py), v in zip(points, values):
        # pixel-center window that can be within `radius` of the point
        cc = (px - x0) / ps - 0.5
        rr = (y0 - py) / ps - 0.5
        c0 = max(0, int(np.floor(cc)) - r_px)
        c1 = min(W - 1, int(np.ceil(cc)) + r_px)
        r0 = max(0, int(np.floor(rr)) - r_px)
        r1 = min(H - 1, int(np.ceil(rr)) + r_px)
        if c0 > c1 or r0 > r1:
            continue
        xs = x0 + (np.arange(c0, c1 + 1) + 0.5) * ps
        ys = y0 - (np.arange(r0, r1 + 1) + 0.5) * ps
        d = np.hypot(xs[None, :] - px, ys[:, None] - py)
        m = d <= radius
        if not m.any():
            continue
        w = np.where(m, 1.0 / np.maximum(d, EPS) ** power, 0.0)
        num[r0:r1 + 1, c0:c1 + 1] += w * v
        den[r0:r1 + 1, c0:c1 + 1] += w
    with np.errstate(invalid="ignore", divide="ignore"):
        out = np.where(den > 0, num / den, NODATA).astype(np.float32)
    return out


def idw_grid(points_ds, spec: GridSpec, *, radius: float,
             power: float = 2.0, x_col: str = "x", y_col: str = "y",
             v_col: str = "v", layer: str = "idw", fmt: str = "npz"):
    """Point-table Dataset -> TILES_SCHEMA Dataset of interpolated
    tiles.  ``radius`` is in world units and must be positive; fan-out
    is bounded by ``(1 + 2*radius/tile_m)^2`` so keep it of tile order
    (same rule as the halo width)."""
    if radius <= 0:
        raise ValueError("radius must be > 0")
    T, ps = spec.tile_px, spec.pixel_size
    tile_m = T * ps
    if radius > 4 * tile_m:
        raise ValueError(
            f"radius {radius} > 4 tiles ({4 * tile_m}): fan-out would "
            f"exceed 81 cells per point; re-tile coarser")

    def emit(b: pa.Table) -> pa.Table:
        xs = b.column(x_col).to_numpy(zero_copy_only=False)
        ys = b.column(y_col).to_numpy(zero_copy_only=False)
        vs = b.column(v_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        cell, ox, oy, ov = [], [], [], []
        for x, y, v in zip(xs, ys, vs):
            tx0 = int(np.floor((x - radius) / tile_m))
            tx1 = int(np.floor((x + radius) / tile_m))
            ty0 = int(np.floor((spec.y_north - y - radius) / tile_m))
            ty1 = int(np.floor((spec.y_north - y + radius) / tile_m))
            for ty in range(max(0, ty0), min(spec.tiles_y - 1, ty1) + 1):
                for tx in range(max(0, tx0), min(spec.tiles_x - 1, tx1) + 1):
                    cell.append(spec.cell_id(tx, ty))
                    ox.append(float(x))
                    oy.append(float(y))
                    ov.append(float(v))
        return pa.table({"cell_id": pa.array(cell, pa.int64()),
                         "x": pa.array(ox, pa.float64()),
                         "y": pa.array(oy, pa.float64()),
                         "v": pa.array(ov, pa.float64())},
                        schema=_PT_SCHEMA)

    def interpolate(group: pa.Table) -> pa.Table:
        g = group.to_pydict()
        cell = int(g["cell_id"][0])
        tx, ty = cell % spec.tiles_x, cell // spec.tiles_x
        pts = np.stack([np.asarray(g["x"]), np.asarray(g["y"])], axis=1)
        vals = np.asarray(g["v"])
        order = np.lexsort((vals, pts[:, 1], pts[:, 0]))
        pts, vals = pts[order], vals[order]
        x0 = tx * tile_m
        y0 = spec.y_north - ty * tile_m
        canvas = idw_kernel(pts, vals, x0, y0, ps, (T, T), radius, power)
        cap = Caption(layer=layer, x0=x0, y0=y0, pixel_size=ps,
                      edge={"n": ty == 0, "s": ty == spec.tiles_y - 1,
                            "w": tx == 0, "e": tx == spec.tiles_x - 1},
                      tx=tx, ty=ty)
        payload, cap = encode_tile(canvas, fmt, cap)
        return pa.table({
            "image_id": [f"{layer}/{tx}/{ty}"],
            "bytes": [payload], "w": [np.int32(T)], "h": [np.int32(T)],
            "fmt": [fmt], "caption": [cap.to_json()],
            "phash": [np.int64(phash64(canvas))]}, schema=TILES_SCHEMA)

    return (points_ds
            .map_batches(emit, batch_format="pyarrow")
            .groupby("cell_id")
            .map_groups(interpolate, batch_format="pyarrow"))


def kernel_density_cells(points_ds, *, cell_size: int, radius: int,
                         x_col: str = "x", y_col: str = "y"):
    """Quartic (biweight) kernel density over a square analysis grid --
    the heat-map / ArcGIS ``KernelDensity`` role (the reference's
    point-density analyses live in Postgres; e.g. the GNAF address
    density checks around `data_prep/gnaf/create_buffered_points.sql`).

    INTEGER-EXACT: with integer point coordinates, an even integer
    ``cell_size`` and integer ``radius``, each point's contribution to
    a cell whose center is at squared distance ``d2 <= radius^2`` is
    the exact int64 ``(radius^2 - d2)^2`` -- the quartic kernel times
    the constant ``radius^4`` (the true density is ``num / (pi *
    radius^4 / 3)`` per unit area; the float never enters the fold, so
    the distributed sum is bit-exact and SQL-replayable).

    Plan shape (the 100 TB heat-map pattern): one ``map_batches``
    stamps every point onto its <= ``(2*radius/cell_size + 1)^2``
    neighbor cells -- fully vectorized (n x K x K outer sums, K
    radius-bounded), contributions stay LOCAL, no all-pairs -- then ONE
    ``groupby(cx, cy).sum`` shuffle folds the numerators.  Cells no
    point reaches are absent (emit-only-touched, like proximity).

    Returns (cx, cy, n_points, density_num) -- cell indices, the count
    of in-radius points (boundary ``d2 == radius^2`` points count with
    zero weight, matching the ``<=`` mask), and the integer numerator.
    """
    from ray.data.aggregate import Count, Sum

    if cell_size <= 0 or cell_size % 2:
        raise ValueError("cell_size must be a positive even integer")
    if radius <= 0:
        raise ValueError("radius must be > 0")
    h = cell_size // 2
    K = 2 * radius // cell_size + 1
    if K > 15:
        raise ValueError(
            f"radius/cell_size fan-out {K}x{K} > 15x15: coarsen the "
            f"grid or shrink the radius")
    r2 = radius * radius
    off = np.arange(K, dtype=np.int64)

    def stamp(b: pa.Table) -> pa.Table:
        px = b.column(x_col).to_numpy().astype(np.int64)
        py = b.column(y_col).to_numpy().astype(np.int64)
        # lowest cell index whose center can be in range: exact integer
        # ceil((p - radius - h) / cell_size)
        i0 = -((-(px - radius - h)) // cell_size)
        j0 = -((-(py - radius - h)) // cell_size)
        ii = i0[:, None] + off[None, :]                    # (n, K)
        jj = j0[:, None] + off[None, :]
        dx = ii * cell_size + h - px[:, None]              # (n, K)
        dy = jj * cell_size + h - py[:, None]
        d2 = (dx * dx)[:, :, None] + (dy * dy)[:, None, :]  # (n, K, K)
        m = d2 <= r2
        w = r2 - d2[m]
        cx = np.broadcast_to(ii[:, :, None], d2.shape)[m]
        cy = np.broadcast_to(jj[:, None, :], d2.shape)[m]
        return pa.table({"cx": pa.array(cx, pa.int64()),
                         "cy": pa.array(cy, pa.int64()),
                         "num": pa.array(w * w, pa.int64())})

    return (points_ds.map_batches(stamp, batch_format="pyarrow")
            .groupby(["cx", "cy"])
            .aggregate(Count(alias_name="n_points"),
                       Sum("num", alias_name="density_num")))
