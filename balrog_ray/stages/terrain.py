"""Hillshade over the tiled DEM -- the remaining gdaldem mode next to
slope/aspect (SURVEY op 26; the reference shells out to ``gdaldem`` at
``data_prep/03_create_dem_aspect_slope_rasters.sh:24-33``).  Standard
illumination model: ``255 * (cos(zenith) cos(slope) + sin(zenith)
sin(slope) cos(azimuth - aspect))`` clamped at 0, on the engine's own
Horn slope/aspect kernel, so the tiled output is bit-identical to a
whole-raster run (1-px halo via the shared windowed stage)."""

from __future__ import annotations

import numpy as np

from ..core.kernels import slope_aspect
from .focal import windowed_stage
from .halo import GridSpec

RAD = np.pi / 180.0


def hillshade_kernel(dem: np.ndarray, pixel_size: float,
                     azimuth_deg: float, altitude_deg: float,
                     nodata: float) -> np.ndarray:
    """Shaded relief 0-255 (float32), nodata propagated."""
    slope, aspect = slope_aspect(dem, pixel_size, pixel_size, nodata)
    mask = dem == np.float32(nodata)
    zen = (90.0 - altitude_deg) * RAD
    az = azimuth_deg * RAD
    sl = slope.astype(np.float64) * RAD
    asp = aspect.astype(np.float64) * RAD
    hs = 255.0 * (np.cos(zen) * np.cos(sl)
                  + np.sin(zen) * np.sin(sl) * np.cos(az - asp))
    out = np.maximum(hs, 0.0).astype(np.float32)
    out[mask] = np.float32(nodata)
    return out


def hillshade(ds, spec: GridSpec, *, layer: str = "dem",
              azimuth_deg: float = 315.0, altitude_deg: float = 45.0,
              radius: int | None = None, fmt: str = "npz"):
    """Image-table Dataset -> image-table Dataset of hillshade tiles
    (layer ``hillshade``).

    The gradient itself needs a 1-px halo, but ``edge_fill_nodata``
    forward-fills nodata from arbitrarily far, so exact whole-raster
    parity requires the halo to cover interior nodata gaps -- the same
    contract as the BAL pipeline (halo.py docstring); hence the default
    ``radius`` is ``spec.halo``, not 1."""
    ps = spec.pixel_size

    def fn(window: np.ndarray, nd: float) -> np.ndarray:
        return hillshade_kernel(window, ps, azimuth_deg, altitude_deg, nd)

    return windowed_stage(ds, spec, layer=layer,
                          radius=spec.halo if radius is None else radius,
                          out_layer="hillshade", window_fn=fn, fmt=fmt)
