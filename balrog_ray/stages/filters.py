"""Convolution image filters over the tile table: nodata-aware Gaussian
blur and Sobel gradient magnitude -- the classic raster smoothing /
edge-detection pair (GDAL ``gdal_calc``+scipy workflows; the reference's
imagery side preps DEM derivatives the same way before classification).
Both ride :func:`~balrog_ray.stages.focal.windowed_stage`, so the tiled
output is bit-identical to the whole-raster kernels below (the test
oracles) with ONE radius-sized halo shuffle.

Conventions:

* **Gaussian**: separable kernel ``exp(-0.5 (i/sigma)^2)``, truncated at
  ``radius`` (default ``ceil(3 sigma)``), renormalized over the VALID
  pixels under the window (nodata and off-raster contribute neither
  weight nor value); output is nodata exactly where the input pixel is
  nodata -- blur never in-fills holes.
* **Sobel**: gradient magnitude ``hypot(gx, gy) / (8 * pixel_size)`` in
  value-units per map-unit (same normalization as the Horn slope
  kernel); defined only where the full 3x3 neighbourhood is valid and
  in-raster, nodata elsewhere -- an edge detector must not hallucinate
  edges against padding.
"""

from __future__ import annotations

import numpy as np

from .focal import windowed_stage
from .halo import GridSpec


def _shift(a: np.ndarray, dy: int, dx: int, fill: float) -> np.ndarray:
    out = np.full_like(a, fill)
    H, W = a.shape
    ys = slice(max(0, dy), H + min(0, dy))
    xs = slice(max(0, dx), W + min(0, dx))
    yo = slice(max(0, -dy), H + min(0, -dy))
    xo = slice(max(0, -dx), W + min(0, -dx))
    out[ys, xs] = a[yo, xo]
    return out


def _conv1d(a: np.ndarray, w: np.ndarray, axis: int) -> np.ndarray:
    """Zero-padded 1-D convolution along ``axis`` by shifted adds --
    O(len(w)) vectorized passes, no Python per-pixel loop."""
    r = len(w) // 2
    out = np.zeros_like(a)
    for i, wi in enumerate(w):
        o = i - r
        out += wi * (_shift(a, o, 0, 0.0) if axis == 0
                     else _shift(a, 0, o, 0.0))
    return out


def gaussian_weights(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    w = np.exp(-0.5 * (x / float(sigma)) ** 2)
    return w / w.sum()


def gaussian_kernel(arr: np.ndarray, sigma: float, radius: int,
                    nodata: float) -> np.ndarray:
    """Whole-array nodata-aware Gaussian blur (the test oracle)."""
    a = np.asarray(arr, dtype=np.float32)
    valid = a != np.float32(nodata)
    w = gaussian_weights(sigma, radius)
    vals = np.where(valid, a.astype(np.float64), 0.0)
    num = _conv1d(_conv1d(vals, w, 0), w, 1)
    den = _conv1d(_conv1d(valid.astype(np.float64), w, 0), w, 1)
    with np.errstate(invalid="ignore", divide="ignore"):
        out = (num / den).astype(np.float32)
    out[~valid] = np.float32(nodata)
    return out


_SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float64)


def sobel_kernel(arr: np.ndarray, pixel_size: float,
                 nodata: float) -> np.ndarray:
    """Whole-array Sobel gradient magnitude (the test oracle)."""
    a = np.asarray(arr, dtype=np.float32)
    valid = a != np.float32(nodata)
    vals = np.where(valid, a.astype(np.float64), 0.0)
    gx = np.zeros_like(vals)
    gy = np.zeros_like(vals)
    ok = np.ones_like(valid)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            sh = _shift(vals, dy, dx, 0.0)
            gx += _SOBEL_X[dy + 1, dx + 1] * sh
            gy += _SOBEL_X[dx + 1, dy + 1] * sh
            # in-bounds AND valid for the full 3x3 footprint
            ok &= _shift(valid.astype(np.float64), dy, dx, 0.0) > 0.5
    out = (np.hypot(gx, gy) / (8.0 * float(pixel_size))).astype(np.float32)
    out[~ok] = np.float32(nodata)
    return out


def gaussian_blur(ds, spec: GridSpec, *, layer: str = "dem",
                  sigma: float = 2.0, radius: int | None = None,
                  out_layer: str = "gauss", fmt: str = "npz"):
    """Image-table Dataset -> blurred image-table Dataset.  One halo
    shuffle sized to the kernel radius; exact parity with
    :func:`gaussian_kernel` on the mosaicked raster."""
    if sigma <= 0:
        raise ValueError("sigma must be > 0")
    r = int(np.ceil(3.0 * sigma)) if radius is None else int(radius)

    def fn(window: np.ndarray, nd: float) -> np.ndarray:
        return gaussian_kernel(window, sigma, r, nd)

    return windowed_stage(ds, spec, layer=layer, radius=r,
                          out_layer=out_layer, window_fn=fn, fmt=fmt)


def sobel_edges(ds, spec: GridSpec, *, layer: str = "dem",
                out_layer: str = "sobel", fmt: str = "npz"):
    """Image-table Dataset -> Sobel gradient-magnitude tiles (radius-1
    halo; exact parity with :func:`sobel_kernel`)."""
    ps = spec.pixel_size

    def fn(window: np.ndarray, nd: float) -> np.ndarray:
        return sobel_kernel(window, ps, nd)

    return windowed_stage(ds, spec, layer=layer, radius=1,
                          out_layer=out_layer, window_fn=fn, fmt=fmt)


def median_kernel(arr: np.ndarray, radius: int,
                  nodata: float) -> np.ndarray:
    """Whole-array nodata-aware focal median (the test oracle path too):
    median of the VALID values in the (2r+1)^2 window, off-raster cells
    not counted, numpy half-sum convention on even counts; output nodata
    exactly where the input pixel is nodata (denoise, don't in-fill)."""
    a = np.asarray(arr, dtype=np.float32)
    valid = a != np.float32(nodata)
    k = 2 * radius + 1
    pad = np.full((a.shape[0] + 2 * radius, a.shape[1] + 2 * radius),
                  np.nan, np.float64)
    pad[radius:-radius or None, radius:-radius or None] = np.where(
        valid, a.astype(np.float64), np.nan)
    win = np.lib.stride_tricks.sliding_window_view(pad, (k, k))
    with np.errstate(invalid="ignore"):
        med = np.nanmedian(win, axis=(-2, -1))
    out = med.astype(np.float32)
    out[~valid] = np.float32(nodata)
    return out


def majority_kernel(arr: np.ndarray, radius: int, nodata: float,
                    max_classes: int = 256) -> np.ndarray:
    """Whole-array focal majority for CATEGORICAL rasters: the most
    frequent valid value in the window, smallest value on ties, output
    nodata where the center is nodata.  Vectorized one box-sum pass per
    distinct class (integral-image window counts) -- refuses rasters
    with more than ``max_classes`` distinct values rather than degrading
    to a per-pixel loop."""
    from .focal import _winsum

    a = np.asarray(arr, dtype=np.float32)
    valid = a != np.float32(nodata)
    vals = np.unique(a[valid])
    if len(vals) > max_classes:
        raise ValueError(
            f"majority filter saw {len(vals)} distinct values (> "
            f"{max_classes}): this is a categorical-raster op; "
            f"reclassify/bin the layer first")
    best_cnt = np.zeros(a.shape, np.int64)
    best_val = np.full(a.shape, np.float32(nodata), np.float32)
    for v in vals:                      # ascending: ties keep smaller
        cnt = _winsum((a == v) & valid, radius).astype(np.int64)
        take = cnt > best_cnt
        best_cnt = np.where(take, cnt, best_cnt)
        best_val = np.where(take, np.float32(v), best_val)
    best_val[~valid] = np.float32(nodata)
    return best_val


def focal_median(ds, spec: GridSpec, *, layer: str = "dem",
                 radius: int = 2, out_layer: str = "median",
                 fmt: str = "npz"):
    """Exact distributed focal median (the famously non-decomposable
    focal stat): one radius-sized halo shuffle, full in-window sort per
    pixel via sliding windows -- parity with :func:`median_kernel`."""

    def fn(window: np.ndarray, nd: float) -> np.ndarray:
        return median_kernel(window, radius, nd)

    return windowed_stage(ds, spec, layer=layer, radius=radius,
                          out_layer=out_layer, window_fn=fn, fmt=fmt)


def focal_majority(ds, spec: GridSpec, *, layer: str = "veg",
                   radius: int = 1, out_layer: str = "majority",
                   fmt: str = "npz"):
    """Distributed focal majority for class rasters (smoothing before
    polygonize/sieve) -- value parity with :func:`majority_kernel`.
    NOTE: the ``max_classes`` guard runs per assembled window here, so a
    raster whose GLOBAL class count exceeds the cap can still pass when
    every window stays under it (the whole-raster kernel would raise);
    the computed values are identical wherever both succeed."""

    def fn(window: np.ndarray, nd: float) -> np.ndarray:
        return majority_kernel(window, radius, nd)

    return windowed_stage(ds, spec, layer=layer, radius=radius,
                          out_layer=out_layer, window_fn=fn, fmt=fmt)


def bilateral_kernel(arr: np.ndarray, sigma_s: float, sigma_r: float,
                     radius: int, nodata: float) -> np.ndarray:
    """Whole-array nodata-aware bilateral filter (OpenCV
    ``bilateralFilter`` / skimage ``denoise_bilateral`` role) -- the
    edge-preserving smoother: each neighbor is weighted by BOTH its
    spatial distance (``exp(-0.5 (dy^2+dx^2)/sigma_s^2)``) and its value
    difference from the center (``exp(-0.5 (v_n - v_c)^2/sigma_r^2)``,
    ``sigma_r`` in value units), normalized over the VALID neighbors
    under the window.  Output is nodata exactly where the input is
    nodata; invalid / off-raster neighbors contribute neither weight
    nor value.  Vectorized one shifted-add pass per window offset --
    O((2r+1)^2) array ops, no per-pixel loop."""
    a = np.asarray(arr, dtype=np.float32)
    valid = a != np.float32(nodata)
    vals = np.where(valid, a.astype(np.float64), 0.0)
    inv_s2 = 0.5 / (float(sigma_s) ** 2)
    inv_r2 = 0.5 / (float(sigma_r) ** 2)
    num = np.zeros_like(vals)
    den = np.zeros_like(vals)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            ws = np.exp(-(dy * dy + dx * dx) * inv_s2)
            sv = _shift(vals, dy, dx, 0.0)
            sm = _shift(valid.astype(np.float64), dy, dx, 0.0)
            w = ws * np.exp(-((sv - vals) ** 2) * inv_r2) * sm
            num += w * sv
            den += w
    with np.errstate(invalid="ignore", divide="ignore"):
        out = (num / den).astype(np.float32)
    out[~valid] = np.float32(nodata)
    return out


def bilateral_filter(ds, spec: GridSpec, *, layer: str = "dem",
                     sigma_s: float = 2.0, sigma_r: float = 5.0,
                     radius: int | None = None,
                     out_layer: str = "bilateral", fmt: str = "npz"):
    """Distributed edge-preserving bilateral filter: one halo shuffle
    sized to the kernel radius; the per-pixel result depends only on
    the radius-r neighborhood, so the tiled output is bit-identical to
    :func:`bilateral_kernel` on the mosaicked raster."""
    if sigma_s <= 0 or sigma_r <= 0:
        raise ValueError("sigma_s and sigma_r must be > 0")
    r = int(np.ceil(3.0 * sigma_s)) if radius is None else int(radius)

    def fn(window: np.ndarray, nd: float) -> np.ndarray:
        return bilateral_kernel(window, sigma_s, sigma_r, r, nd)

    return windowed_stage(ds, spec, layer=layer, radius=r,
                          out_layer=out_layer, window_fn=fn, fmt=fmt)


def kuwahara_kernel(arr: np.ndarray, radius: int,
                    nodata: float) -> np.ndarray:
    """Kuwahara edge-preserving smoother (Kuwahara et al. 1976; the
    classic pre-bilateral member of the family): the (2r+1)^2 window
    splits into four overlapping (r+1)^2 quadrants sharing the center;
    the output is the MEAN of the quadrant with the SMALLEST variance
    -- flat regions average, edges pick the quadrant that does not
    straddle them.

    Determinism contract: per-quadrant sum/sumsq accumulate in float64
    over a FIXED offset order, variance compares as float64, and ties
    break by quadrant index (NW, NE, SW, SE), so tiled == whole is
    bit-exact.  Nodata-aware: invalid neighbors drop out of their
    quadrant's count; a quadrant with zero valid cells is skipped
    (the center pixel keeps >= 1 quadrant alive); nodata centers stay
    nodata."""
    if radius < 1:
        raise ValueError("radius must be >= 1")
    a32 = np.asarray(arr, np.float32)
    nd = np.float32(nodata)
    valid = a32 != nd
    v = np.where(valid, a32.astype(np.float64), 0.0)
    m = valid.astype(np.float64)
    # quadrant dy/dx ranges, each includes the center row/col
    quads = (((-radius, 0), (-radius, 0)),   # NW
             ((-radius, 0), (0, radius)),    # NE
             ((0, radius), (-radius, 0)),    # SW
             ((0, radius), (0, radius)))     # SE
    best_var = np.full(a32.shape, np.inf)
    best_mean = np.zeros(a32.shape, np.float64)
    for (ylo, yhi), (xlo, xhi) in quads:
        s = np.zeros(a32.shape, np.float64)
        s2 = np.zeros(a32.shape, np.float64)
        c = np.zeros(a32.shape, np.float64)
        for dy in range(ylo, yhi + 1):
            for dx in range(xlo, xhi + 1):
                sv = _shift(v, dy, dx, 0.0)
                sm = _shift(m, dy, dx, 0.0)
                s += sv
                s2 += sv * sv
                c += sm
        alive = c > 0
        mean = np.where(alive, s / np.where(alive, c, 1.0), 0.0)
        var = np.where(alive, s2 / np.where(alive, c, 1.0)
                       - mean * mean, np.inf)
        take = var < best_var          # strict: earlier quadrant wins ties
        best_var = np.where(take, var, best_var)
        best_mean = np.where(take, mean, best_mean)
    out = best_mean.astype(np.float32)
    out[~valid] = nd
    return out


def kuwahara(ds, spec: GridSpec, *, layer: str = "dem",
             radius: int = 2, out_layer: str = "kuwahara",
             fmt: str = "npz"):
    """Image-table Dataset -> Kuwahara-filtered tiles; one radius-sized
    halo exchange on the shared windowed stage."""
    def fn(window: np.ndarray, nd: float) -> np.ndarray:
        return kuwahara_kernel(window, radius, nd)

    return windowed_stage(ds, spec, layer=layer, radius=radius,
                          out_layer=out_layer, window_fn=fn, fmt=fmt)
