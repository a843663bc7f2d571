"""Bounded proximity raster: per-pixel Euclidean distance to the nearest
target-class pixel -- gdal_proximity's role, and the generalized form of
the reference's distance-to-vegetation core (its directional scan bins
exactly this distance into AS 3959 classes, ``calculate_bal.py:169-214``,
``value_lookup.py:15-23``).

Shape: the focal halo machinery with the halo sized to ``max_dist``
(pixels beyond the reach cannot influence the answer, so the bound makes
the op tileable at all); per-cell compute is the exact two-step
decomposition of squared Euclidean distance --

1. column pass: two vectorized row sweeps give ``dcol[i, j]`` = vertical
   pixel distance from (i, j) to the nearest target in column j;
2. row pass: ``dist^2 = min over dx in [-R, R] of dx^2 + dcol^2`` at the
   shifted column -- exact because the nearest target at offset (dx, dy)
   satisfies ``dcol(x+dx) <= |dy|``.

Cost is O(R) vectorized array ops per window; output pixels farther than
``max_dist`` from every target (or with no target in reach) emit nodata,
matching a whole-raster run exactly because the halo covers the full
reach.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .focal import FocalGridSpec
from .halo import GridSpec, assemble_window, make_strip_emitter_batch


def proximity_kernel(arr: np.ndarray, target_values, max_dist: float,
                     pixel_size: float, nodata: float) -> np.ndarray:
    """Distance (in world units) from every pixel to the nearest pixel
    whose value is in ``target_values``; strictly beyond ``max_dist``
    emits nodata.  Target pixels are 0."""
    radius_px = int(np.ceil(max_dist / pixel_size))
    target = np.isin(arr, np.asarray(target_values, dtype=np.float32)) \
        & (arr != np.float32(nodata))
    H, W = arr.shape
    INF = np.inf
    dcol = np.empty((H, W))
    run = np.full(W, INF)
    for i in range(H):                       # downward sweep
        run = np.where(target[i], 0.0, run + 1.0)
        dcol[i] = run
    run = np.full(W, INF)
    for i in range(H - 1, -1, -1):           # upward sweep
        run = np.where(target[i], 0.0, run + 1.0)
        dcol[i] = np.minimum(dcol[i], run)
    R = int(radius_px)
    dc2 = np.minimum(dcol, R + 1) ** 2       # clip: beyond-reach == INF
    d2 = np.full((H, W), INF)
    for dx in range(-R, R + 1):
        if dx < 0:
            d2[:, -dx:] = np.minimum(d2[:, -dx:],
                                     dx * dx + dc2[:, :dx])
        elif dx > 0:
            d2[:, :-dx] = np.minimum(d2[:, :-dx],
                                     dx * dx + dc2[:, dx:])
        else:
            d2 = np.minimum(d2, dc2)
    dist = np.sqrt(d2) * pixel_size
    out = dist.astype(np.float32)
    out[dist > max_dist] = np.float32(nodata)
    return out


def proximity(ds, spec: GridSpec, *, layer: str = "veg", target_values,
              max_dist: float, fmt: str = "npz"):
    """Image-table Dataset -> image-table Dataset of distance tiles
    (layer ``proximity``), exact parity with a whole-raster run out to
    ``max_dist`` world units."""
    radius = int(np.ceil(max_dist / spec.pixel_size))
    if radius < 1:
        raise ValueError("max_dist smaller than one pixel")
    if radius >= spec.tile_px:
        raise ValueError(
            f"max_dist needs a {radius}-px halo >= tile_px "
            f"{spec.tile_px}; re-tile coarser or lower max_dist")
    fspec = FocalGridSpec(spec.tiles_x, spec.tiles_y, spec.tile_px,
                          spec.pixel_size, spec.y_north, radius=radius)
    T = fspec.tile_px
    tvals = tuple(float(v) for v in target_values)

    def keep_layer(b: pa.Table) -> pa.Table:
        import json

        caps = b.column("caption").to_pylist()
        keep = [i for i, c in enumerate(caps)
                if json.loads(c)["layer"] == layer]
        return b.take(pa.array(keep, pa.int64()))

    emit = make_strip_emitter_batch(fspec)

    def compute(group: pa.Table) -> pa.Table:
        from ..tiles.codec import Caption, encode_tile, phash64
        from ..tiles.synth import TILES_SCHEMA

        g = group.to_pydict()
        cell = int(g["cell_id"][0])
        tx, ty = cell % fspec.tiles_x, cell // fspec.tiles_x
        neigh = sum(1 for dy in (-1, 0, 1) for dx in (-1, 0, 1)
                    if 0 <= tx + dx < fspec.tiles_x
                    and 0 <= ty + dy < fspec.tiles_y)
        window = (assemble_window(g, fspec, layer, tx, ty)
                  if g["layer"].count(layer) == neigh else None)
        if window is None:
            return pa.table({c: [] for c in TILES_SCHEMA.names},
                            schema=TILES_SCHEMA)
        ref = next(Caption.from_json(g["caption"][i])
                   for i in range(len(g["is_core"])) if g["is_core"][i])
        out_full = proximity_kernel(window, tvals, max_dist,
                                    fspec.pixel_size, float(ref.nodata))
        r0, _, c0, _ = fspec.assembled_window(tx, ty)
        rs, cs = ty * T - r0, tx * T - c0
        core = np.ascontiguousarray(out_full[rs:rs + T, cs:cs + T])
        ocap = Caption(layer="proximity", x0=ref.x0, y0=ref.y0,
                       pixel_size=ref.pixel_size, crs=ref.crs,
                       nodata=ref.nodata, edge=dict(ref.edge),
                       tx=ref.tx, ty=ref.ty)
        payload, ocap = encode_tile(core, fmt, ocap)
        h, w = core.shape
        return pa.table({
            "image_id": pa.array([f"proximity/{tx}/{ty}"], pa.string()),
            "bytes": pa.array([payload], pa.binary()),
            "w": pa.array([w], pa.int32()),
            "h": pa.array([h], pa.int32()),
            "fmt": pa.array([fmt], pa.string()),
            "caption": pa.array([ocap.to_json()], pa.string()),
            "phash": pa.array([phash64(core)], pa.int64())},
            schema=TILES_SCHEMA)

    return (ds.map_batches(keep_layer, batch_format="pyarrow")
            .map_batches(emit, batch_format="pyarrow")
            .groupby("cell_id")
            .map_groups(compute, batch_format="pyarrow"))
