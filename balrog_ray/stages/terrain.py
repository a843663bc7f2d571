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


def _shift_pad(a: np.ndarray, dy: int, dx: int, fill: float) -> np.ndarray:
    out = np.full_like(a, fill)
    H, W = a.shape
    ys = slice(max(dy, 0), H + min(dy, 0))
    yd = slice(max(-dy, 0), H + min(-dy, 0))
    xs = slice(max(dx, 0), W + min(dx, 0))
    xd = slice(max(-dx, 0), W + min(-dx, 0))
    out[yd, xd] = a[ys, xs]
    return out


def dem_metric_kernel(dem: np.ndarray, metric: str,
                      nodata: float) -> np.ndarray:
    """gdaldem's 3x3 terrain metrics (TPI / TRI / roughness, the modes
    next to slope/aspect/hillshade).  Nodata-aware: nodata neighbours are
    excluded; a center with no valid neighbour (or itself nodata) emits
    nodata.

    * ``tpi``: center minus the mean of its valid 8-neighbours;
    * ``tri``: mean |center - neighbour| over valid 8-neighbours
      (Wilson et al. 2007, gdaldem's TRI formula);
    * ``roughness``: max - min over the valid 3x3 window incl. center.
    """
    if metric not in ("tpi", "tri", "roughness"):
        raise ValueError(f"metric must be tpi|tri|roughness, got {metric!r}")
    valid = dem != np.float32(nodata)
    d = dem.astype(np.float64)
    nb_sum = np.zeros_like(d)
    nb_abs = np.zeros_like(d)
    nb_n = np.zeros_like(d)
    lo = np.where(valid, d, np.inf)
    hi = np.where(valid, d, -np.inf)
    wmin, wmax = lo.copy(), hi.copy()
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            v = _shift_pad(valid.astype(np.float64), dy, dx, 0.0)
            x = _shift_pad(d, dy, dx, 0.0) * v
            nb_sum += x
            nb_abs += np.abs(d - _shift_pad(d, dy, dx, 0.0)) * v
            nb_n += v
            wmin = np.minimum(wmin, _shift_pad(lo, dy, dx, np.inf))
            wmax = np.maximum(wmax, _shift_pad(hi, dy, dx, -np.inf))
    with np.errstate(invalid="ignore", divide="ignore"):
        if metric == "tpi":
            out = d - nb_sum / nb_n
        elif metric == "tri":
            out = nb_abs / nb_n
        else:
            out = wmax - wmin
    out = out.astype(np.float32)
    out[~valid | (nb_n == 0)] = np.float32(nodata)
    return out


def dem_metrics(ds, spec: GridSpec, *, metric: str, layer: str = "dem",
                fmt: str = "npz"):
    """Image-table Dataset -> image-table Dataset of TPI / TRI /
    roughness tiles (layer = the metric name).  Pure 3x3 windows with no
    nodata fill, so a 1-px halo gives exact whole-raster parity."""
    if metric not in ("tpi", "tri", "roughness"):
        raise ValueError(f"metric must be tpi|tri|roughness, got {metric!r}")

    def fn(window: np.ndarray, nd: float) -> np.ndarray:
        return dem_metric_kernel(window, metric, nd)

    return windowed_stage(ds, spec, layer=layer, radius=1,
                          out_layer=metric, window_fn=fn, fmt=fmt)


def curvature_kernel(dem: np.ndarray, pixel_size: float, kind: str,
                     nodata: float) -> np.ndarray:
    """Zevenbergen & Thorne (1987) curvature on the 3x3 window -- the
    ArcGIS Curvature tool of the Gen-1 toolbox's ecosystem (the natural
    second derivative after the Horn slope/aspect of SURVEY op 4).

    Quadratic-surface coefficients with cell size L (z1..z3 = north
    row, z4..z6 = middle, z7..z9 = south row)::

        D = ((z4+z6)/2 - z5) / L^2       E = ((z2+z8)/2 - z5) / L^2
        F = (-z1+z3+z7-z9) / (4 L^2)
        G = (-z4+z6) / (2 L)             H = (z2-z8) / (2 L)

    * ``total``   = -2 (D + E) * 100
    * ``profile`` =  2 (D G^2 + E H^2 + F G H) / (G^2 + H^2) * 100
    * ``plan``    = -2 (D H^2 + E G^2 - F G H) / (G^2 + H^2) * 100

    (profile/plan are 0 where the gradient vanishes).  Nodata / out-of-
    raster neighbours take the CENTER value (the ESRI substitution
    rule), so curvature is defined at every valid pixel."""
    if kind not in ("total", "profile", "plan"):
        raise ValueError(f"kind must be total|profile|plan, got {kind!r}")
    valid = dem != np.float32(nodata)
    d = dem.astype(np.float64)
    L = float(pixel_size)

    def nb(dy, dx):
        v = _shift_pad(valid, dy, dx, False)
        x = _shift_pad(d, dy, dx, 0.0)
        return np.where(v, x, d)         # substitute center for missing

    z1, z2, z3 = nb(-1, -1), nb(-1, 0), nb(-1, 1)
    z4, z6 = nb(0, -1), nb(0, 1)
    z7, z8, z9 = nb(1, -1), nb(1, 0), nb(1, 1)
    z5 = d
    D = ((z4 + z6) / 2 - z5) / L ** 2
    E = ((z2 + z8) / 2 - z5) / L ** 2
    F = (-z1 + z3 + z7 - z9) / (4 * L ** 2)
    G = (-z4 + z6) / (2 * L)
    H = (z2 - z8) / (2 * L)
    if kind == "total":
        out = -2.0 * (D + E) * 100.0
    else:
        g2 = G * G + H * H
        with np.errstate(invalid="ignore", divide="ignore"):
            if kind == "profile":
                out = 2.0 * (D * G * G + E * H * H + F * G * H) / g2 * 100.0
            else:
                out = -2.0 * (D * H * H + E * G * G - F * G * H) / g2 * 100.0
        out = np.where(g2 == 0.0, 0.0, out)
    out = out.astype(np.float32)
    out[~valid] = np.float32(nodata)
    return out


def curvature(ds, spec: GridSpec, *, kind: str = "profile",
              layer: str = "dem", fmt: str = "npz"):
    """Image-table Dataset -> curvature tiles (layer ``curv_<kind>``).
    Center-substitution makes the 3x3 window self-contained, so a 1-px
    halo gives exact whole-raster parity."""
    if kind not in ("total", "profile", "plan"):
        raise ValueError(f"kind must be total|profile|plan, got {kind!r}")
    ps = spec.pixel_size

    def fn(window: np.ndarray, nd: float) -> np.ndarray:
        return curvature_kernel(window, ps, kind, nd)

    return windowed_stage(ds, spec, layer=layer, radius=1,
                          out_layer=f"curv_{kind}", window_fn=fn, fmt=fmt)
