"""Harris corner detection over the tiled raster table -- the interest
-point extractor (OpenCV ``cornerHarris`` / skimage ``corner_harris`` +
``corner_peaks`` role), third member of the engine's detection family
after NCC template matching and Canny.  Local structure tensor + NMS
ride the shared one-shuffle halo-window plan; the global corner list
reuses :func:`..stages.match.top_matches`'s per-block partial top-k.

Deterministic semantics:

* gradients: Sobel 3x3, defined only where the full 3x3 is inside the
  raster AND valid (position-independent -- the tiled parity contract);
* structure tensor: UNWEIGHTED box sums of (Ix^2, Iy^2, IxIy) over the
  ``(2r+1)^2`` window, defined only where every window gradient is
  defined (fully-inside rule again -- no partial windows, no edge
  renormalization ambiguity);
* response: ``R = det(M) - k * trace(M)^2`` (Harris & Stephens 1988),
  float64 sums, float32 out;
* corner: ``R >= every response in the (2*nms_r+1)^2 NMS window``
  (undefined neighbors count -inf) and ``R > thr``; non-corners emit
  nodata, so the output layer doubles as a sparse corner mask with the
  response as the value.

Scale shape: per-tile work is integral-image box sums (no per-pixel
loop); the only exchange is the halo shuffle; the corner list is
top-k-bounded per block.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .focal import windowed_stage
from .halo import GridSpec


def _box_full(plane: np.ndarray, defined: np.ndarray, r: int):
    """Box sum over (2r+1)^2 windows + fully-defined window mask, edges
    excluded (windows must be fully inside)."""
    H, W = plane.shape
    k = 2 * r + 1
    ii = np.zeros((H + 1, W + 1), np.float64)
    np.cumsum(np.where(defined, plane, 0.0), axis=0, out=ii[1:, 1:])
    np.cumsum(ii[1:, 1:], axis=1, out=ii[1:, 1:])
    ic = np.zeros((H + 1, W + 1), np.float64)
    np.cumsum(defined.astype(np.float64), axis=0, out=ic[1:, 1:])
    np.cumsum(ic[1:, 1:], axis=1, out=ic[1:, 1:])
    s = ii[k:, k:] - ii[:-k, k:] - ii[k:, :-k] + ii[:-k, :-k]
    c = ic[k:, k:] - ic[:-k, k:] - ic[k:, :-k] + ic[:-k, :-k]
    out = np.full((H, W), 0.0)
    full = np.zeros((H, W), bool)
    out[r:H - r, r:W - r] = s
    full[r:H - r, r:W - r] = c > k * k - 0.5
    return out, full


def harris_kernel(arr: np.ndarray, nodata: float, *, k: float = 0.05,
                  radius: int = 2, nms_radius: int = 2,
                  thr: float = 0.0) -> np.ndarray:
    """Whole-array Harris corners: float32 plane with the response R at
    corner pixels, nodata elsewhere.  Same result tiled or whole."""
    a32 = np.asarray(arr, np.float32)
    H, W = a32.shape
    nd = np.float32(nodata)
    valid = a32 != nd
    a = np.where(valid, a32.astype(np.float64), 0.0)

    gdef = np.zeros((H, W), bool)
    gx = np.zeros((H, W), np.float64)
    gy = np.zeros((H, W), np.float64)
    if H >= 3 and W >= 3:
        ok = valid
        gdef[1:-1, 1:-1] = (ok[:-2, :-2] & ok[:-2, 1:-1] & ok[:-2, 2:]
                            & ok[1:-1, :-2] & ok[1:-1, 1:-1]
                            & ok[1:-1, 2:] & ok[2:, :-2] & ok[2:, 1:-1]
                            & ok[2:, 2:])
        gx[1:-1, 1:-1] = ((a[:-2, 2:] + 2.0 * a[1:-1, 2:] + a[2:, 2:])
                          - (a[:-2, :-2] + 2.0 * a[1:-1, :-2]
                             + a[2:, :-2]))
        gy[1:-1, 1:-1] = ((a[2:, :-2] + 2.0 * a[2:, 1:-1] + a[2:, 2:])
                          - (a[:-2, :-2] + 2.0 * a[:-2, 1:-1]
                             + a[:-2, 2:]))
    gx[~gdef] = 0.0
    gy[~gdef] = 0.0

    sxx, f1 = _box_full(gx * gx, gdef, radius)
    syy, _ = _box_full(gy * gy, gdef, radius)
    sxy, _ = _box_full(gx * gy, gdef, radius)
    rdef = f1
    resp = np.where(rdef,
                    (sxx * syy - sxy * sxy)
                    - k * (sxx + syy) * (sxx + syy), -np.inf)

    # NMS: corner iff R >= every neighbor response in the NMS window
    pad = np.full((H + 2 * nms_radius, W + 2 * nms_radius), -np.inf)
    pad[nms_radius:nms_radius + H, nms_radius:nms_radius + W] = resp
    mx = np.full((H, W), -np.inf)
    for dy in range(2 * nms_radius + 1):
        for dx in range(2 * nms_radius + 1):
            np.maximum(mx, pad[dy:dy + H, dx:dx + W], out=mx)
    corner = rdef & (resp >= mx) & (resp > thr)

    out = np.full((H, W), nd, np.float32)
    out[corner] = resp[corner].astype(np.float32)
    return out


def harris_corners(tiles_ds, spec: GridSpec, *, layer: str = "dem",
                   k: float = 0.05, radius: int = 2, nms_radius: int = 2,
                   thr: float = 0.0, fmt: str = "npz"):
    """Image-table Dataset -> sparse corner-response layer ``harris``
    via the one-shuffle halo plan (halo = 1 + radius + nms_radius)."""

    def fn(window: np.ndarray, nd: float) -> np.ndarray:
        return harris_kernel(window, nd, k=k, radius=radius,
                             nms_radius=nms_radius, thr=thr)

    return windowed_stage(tiles_ds, spec, layer=layer,
                          radius=1 + radius + nms_radius,
                          out_layer="harris", window_fn=fn, fmt=fmt)
