"""Topographic Wetness Index (Beven & Kirkby 1979): ``ln(a / tan b)``
where ``a`` is the specific catchment area and ``b`` the local slope --
the classic hydrology-terrain COMPOSITE layer (SAGA ``twi`` / GRASS
``r.topidx`` role; the reference's toolbox derives slope and aspect but
no wetness, so this is a beyond-reference composition exercising three
engine stages end-to-end).

Composition (all existing primitives, no new shuffle kind):

1. ``flow_accumulation`` -- the iterative D8 front exchange, exact
   global upstream-cell counts (layer ``flow_acc``);
2. a 1-px halo ``windowed_stage`` computing the Horn slope in degrees
   (layer ``slope_deg``, same kernel as the BAL pipeline);
3. ``raster_calc`` over the union of the two derived tables -- ONE
   co-key groupby joins the co-registered tiles per cell.

Formula details (deterministic): specific catchment area per unit
contour width ``a = (acc + 1) * pixel_size`` (the cell itself counts,
GRASS convention), ``tan b`` floored at ``tan(min_slope_deg)`` so flat
cells stay finite (SAGA's standard guard).  Nodata anywhere in either
input propagates."""

from __future__ import annotations

import numpy as np

from ..core.kernels import slope_aspect
from .focal import windowed_stage
from .halo import GridSpec
from .hydrology import accumulate_kernel, d8_kernel
from .raster_calc import raster_calc


def twi_kernel(dem: np.ndarray, pixel_size: float, nodata: float,
               min_slope_deg: float = 0.1) -> np.ndarray:
    """Whole-raster oracle: D8 accumulate + Horn slope + the TWI map."""
    acc = accumulate_kernel(d8_kernel(dem, nodata)).astype(np.float64)
    slope, _ = slope_aspect(dem, pixel_size, pixel_size, nodata)
    nd = np.float32(nodata)
    valid = (np.asarray(dem, np.float32) != nd) & (slope != nd)
    a = (acc + 1.0) * pixel_size
    tanb = np.maximum(np.tan(np.deg2rad(slope.astype(np.float64))),
                      np.tan(np.deg2rad(min_slope_deg)))
    out = np.where(valid, np.log(a / tanb), np.float64(nodata))
    return out.astype(np.float32)


def twi(ds, spec: GridSpec, *, layer: str = "dem", fmt: str = "npz",
        min_slope_deg: float = 0.1, max_hops: int = 256):
    """Image-table Dataset -> per-pixel TWI layer (``twi``)."""
    from .hydrology import flow_accumulation

    acc = flow_accumulation(ds, spec, layer=layer, fmt=fmt,
                            max_hops=max_hops)

    def slope_fn(window: np.ndarray, nd: float) -> np.ndarray:
        s, _ = slope_aspect(window, spec.pixel_size, spec.pixel_size, nd)
        return s

    slope_ds = windowed_stage(ds, spec, layer=layer, radius=1,
                              out_layer="slope_deg", window_fn=slope_fn,
                              fmt=fmt)

    ps = spec.pixel_size
    tan_floor = np.tan(np.deg2rad(min_slope_deg))

    def fn(layers, nd):
        acc_a, slope_a = layers["flow_acc"], layers["slope_deg"]
        nd32 = np.float32(nd)
        valid = (acc_a != nd32) & (slope_a != nd32)
        a = (acc_a.astype(np.float64) + 1.0) * ps
        tanb = np.maximum(np.tan(np.deg2rad(slope_a.astype(np.float64))),
                          tan_floor)
        with np.errstate(invalid="ignore", divide="ignore"):
            out = np.log(a / tanb)
        return np.where(valid, out, np.float64(nd)).astype(np.float32)

    # the union re-blocks before raster_calc's groupby (tiny tile-count
    # tables; avoids empty-schema union blocks breaking the co-key sort)
    both = acc.union(slope_ds).repartition(
        max(2, (spec.tiles_x * spec.tiles_y) // 8))
    return raster_calc(both, ["flow_acc", "slope_deg"], fn,
                       out_layer="twi", fmt=fmt)
