"""Stereo block-matching disparity between two co-registered raster
planes -- the classic dense-correspondence op (OpenCV ``StereoBM`` /
SGBM's local-cost core role).  Third rider on the shared dual-plane
halo pipeline (:func:`..stages.ssim.dual_epoch_stage`): plane A is the
left image, plane B the right, and the engine's ``epoch`` column
addresses the pair -- for true stereo pairs, ingest left/right as two
epochs of one layer.

Deterministic semantics (documented where libraries differ):

* candidate disparity ``d`` in ``[0, d_max]`` is valid at pixel
  ``(y, x)`` iff the ``(2r+1)^2`` window around ``(y, x)`` in A and
  around ``(y, x - d)`` in B are both fully inside the raster and
  fully valid (position-independent -- the tiled parity contract);
* cost = SAD (sum of absolute differences, float64);
* disparity = argmin cost over valid candidates, ties -> smallest d;
  nodata when no candidate is valid;
* output is float32 ``disparity`` (pixels).

Scale shape: ONE dual-plane halo shuffle (halo = r + d_max so the
shifted windows resolve locally); per-cell cost volume is ``d_max + 1``
integral-image box sums -- vectorized, no per-pixel loop; no second
exchange.
"""

from __future__ import annotations

import numpy as np

from .halo import GridSpec
from .ssim import dual_epoch_stage


def _box(plane: np.ndarray, r: int) -> np.ndarray:
    """Box sum over fully-inside (2r+1)^2 windows; border ring left 0."""
    H, W = plane.shape
    k = 2 * r + 1
    ii = np.zeros((H + 1, W + 1), np.float64)
    np.cumsum(plane, axis=0, out=ii[1:, 1:])
    np.cumsum(ii[1:, 1:], axis=1, out=ii[1:, 1:])
    s = ii[k:, k:] - ii[:-k, k:] - ii[k:, :-k] + ii[:-k, :-k]
    out = np.zeros((H, W), np.float64)
    out[r:H - r, r:W - r] = s
    return out


def disparity_kernel(a: np.ndarray, b: np.ndarray, nodata: float, *,
                     radius: int = 3, d_max: int = 8) -> np.ndarray:
    """Whole-array block-matching disparity plane (float32); same
    result tiled (halo = radius + d_max) or whole."""
    if d_max < 0:
        raise ValueError("d_max must be >= 0")
    a32 = np.asarray(a, np.float32)
    b32 = np.asarray(b, np.float32)
    if a32.shape != b32.shape:
        raise ValueError(f"shapes differ: {a32.shape} vs {b32.shape}")
    H, W = a32.shape
    nd = np.float32(nodata)
    va = a32 != nd
    vb = b32 != nd
    af = np.where(va, a32.astype(np.float64), 0.0)
    bf = np.where(vb, b32.astype(np.float64), 0.0)
    k = 2 * radius + 1

    best = np.full((H, W), np.inf)
    disp = np.full((H, W), -1, np.int64)
    for d in range(d_max + 1):
        # shift B right by d so column x aligns with B's x - d
        bs = np.zeros((H, W))
        ms = np.zeros((H, W), bool)
        if d < W:
            bs[:, d:] = bf[:, :W - d]
            ms[:, d:] = vb[:, :W - d]
        pairdef = va & ms
        sad = _box(np.where(pairdef, np.abs(af - bs), 0.0), radius)
        cnt = _box(pairdef.astype(np.float64), radius)
        ok = np.zeros((H, W), bool)
        ok[radius:H - radius, radius:W - radius] = True
        # the B window must also be fully inside: x - d - radius >= 0
        xs = np.arange(W)
        ok &= (xs[None, :] - d - radius) >= 0
        ok &= cnt > k * k - 0.5
        upd = ok & (sad < best)
        best[upd] = sad[upd]
        disp[upd] = d
    out = np.full((H, W), nd, np.float32)
    m = disp >= 0
    out[m] = disp[m].astype(np.float32)
    return out


def stereo_disparity(tiles_ds, spec: GridSpec, *, epoch_a: int,
                     epoch_b: int, layer: str = "dem", radius: int = 3,
                     d_max: int = 8, fmt: str = "npz"):
    """Temporal tile table -> image-table Dataset of ``disparity``
    tiles (one dual-plane halo shuffle, halo = radius + d_max)."""
    return dual_epoch_stage(
        tiles_ds, spec, epoch_a=epoch_a, epoch_b=epoch_b, layer=layer,
        radius=radius + d_max, out_layers=("disparity",),
        window_fn=lambda wa, wb, nd: (disparity_kernel(
            wa, wb, nd, radius=radius, d_max=d_max),),
        fmt=fmt)
