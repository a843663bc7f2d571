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

from .focal import windowed_stage
from .halo import GridSpec


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
    tvals = tuple(float(v) for v in target_values)
    ps = spec.pixel_size

    def fn(window: np.ndarray, nodata: float) -> np.ndarray:
        return proximity_kernel(window, tvals, max_dist, ps, nodata)

    return windowed_stage(ds, spec, layer=layer, radius=radius,
                          out_layer="proximity", window_fn=fn, fmt=fmt)
