"""Bounded nodata interpolation -- ``gdal.FillNodata``'s role (the
reference's DEM prep step fills void pixels before slope/aspect;
``cal_slope_aspect``'s edge fill handles only the 1-px frame): every
nodata pixel takes the value of its NEAREST valid pixel within
``max_dist`` world units (Euclidean pixel distance; ties broken by
smaller dy, then smaller dx -- a total, documented order so the result
is deterministic and whole-raster-identical).

Rides :func:`balrog_ray.stages.focal.windowed_stage` -- the shared halo
machinery: ONE ``groupby(cell_id)`` exchange of edge strips sized to the
search radius, so a void crossing a tile border fills from the
neighbouring tile's pixels exactly as a whole-raster run would.  Pixels
with no valid donor in reach stay nodata (voids wider than ``2R`` need a
larger radius or an IDW/coarse-fill pass -- an honest bound, like
proximity's).

Per-window cost is one vectorized shift per candidate offset, offsets
visited in increasing (d^2, dy, dx); the loop exits as soon as every
hole is filled, so sparse-void rasters pay only a handful of shifts.
"""

from __future__ import annotations

import numpy as np

from .focal import windowed_stage
from .halo import GridSpec


def _offsets(radius_px: int) -> list[tuple[int, int]]:
    """Candidate donor offsets, nearest first: sorted by (d^2, dy, dx),
    excluding (0, 0)."""
    offs = [(dy * dy + dx * dx, dy, dx)
            for dy in range(-radius_px, radius_px + 1)
            for dx in range(-radius_px, radius_px + 1)
            if (dy, dx) != (0, 0) and dy * dy + dx * dx <= radius_px ** 2]
    offs.sort()
    return [(dy, dx) for _, dy, dx in offs]


def fillnodata_kernel(arr: np.ndarray, max_dist: float, pixel_size: float,
                      nodata: float) -> np.ndarray:
    """Fill nodata pixels from the nearest valid pixel within
    ``max_dist`` world units; unreachable holes stay nodata."""
    nd = np.float32(nodata)
    a = arr.astype(np.float32, copy=True)
    unset = a == nd
    if not unset.any():
        return a
    valid = ~unset
    H, W = a.shape
    R = int(np.floor(max_dist / pixel_size))
    for dy, dx in _offsets(R):
        if not unset.any():
            break
        # donor value at (i + dy, j + dx), in-bounds only
        ss = (slice(max(dy, 0), H + min(dy, 0)),
              slice(max(dx, 0), W + min(dx, 0)))
        ds_ = (slice(max(-dy, 0), H + min(-dy, 0)),
               slice(max(-dx, 0), W + min(-dx, 0)))
        can = np.zeros((H, W), bool)
        can[ds_] = unset[ds_] & valid[ss]
        if can.any():
            src = np.full((H, W), nd, np.float32)
            src[ds_] = a[ss]
            a[can] = src[can]
            unset &= ~can
    return a


def fill_nodata(ds, spec: GridSpec, *, layer: str = "dem",
                max_dist: float, fmt: str = "npz"):
    """Image-table Dataset -> image-table Dataset with holes filled
    (layer ``filled``), exact parity with a whole-raster run."""
    radius = int(np.floor(max_dist / spec.pixel_size))
    if radius < 1:
        raise ValueError("max_dist smaller than one pixel")
    md = float(max_dist)
    ps = spec.pixel_size

    def fn(window: np.ndarray, nodata: float) -> np.ndarray:
        return fillnodata_kernel(window, md, ps, nodata)

    return windowed_stage(ds, spec, layer=layer, radius=radius,
                          out_layer="filled", window_fn=fn, fmt=fmt)
