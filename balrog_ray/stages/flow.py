"""Dense Lucas-Kanade optical flow between two raster epochs -- the
per-pixel motion estimator (OpenCV ``calcOpticalFlowLK`` / classic
Lucas & Kanade 1981 role) over the engine's temporal tile table,
completing the two-epoch family (scalar delta: ``change_detection``,
structural: ``ssim_change``, motion: this).  Rides the shared
dual-plane halo pipeline -- ONE keyed shuffle carrying both epochs'
strips, vectorized window math per cell.

Deterministic semantics:

* spatial gradients Ix, Iy: Sobel 3x3 on epoch A, defined only where
  the 3x3 is fully inside the raster and valid in BOTH epochs (the
  position-independent rule every detection kernel here uses);
* temporal gradient It = B - A where both valid;
* over the ``(2r+1)^2`` window (fully-inside, all gradients defined):
  solve the 2x2 normal equations ``[Sxx Sxy; Sxy Syy] [u v]' =
  -[Sxt Syt]'``; a pixel is nodata when the window is not fully
  defined or ``det <= eps * trace^2`` (ill-conditioned aperture --
  a relative threshold, scale-free);
* float64 sums, float32 (u, v) out: tiled == whole-raster bit-exactly.

Output: TWO image-table rows per cell, layers ``flow_u`` (+x = east,
pixels/epoch) and ``flow_v`` (+y = south, row direction).
"""

from __future__ import annotations

import numpy as np

from .halo import GridSpec
from .ssim import dual_epoch_stage


def lk_flow_kernel(a: np.ndarray, b: np.ndarray, nodata: float, *,
                   radius: int = 3, eps: float = 1e-4):
    """Whole-array dense LK flow -> (u, v) float32 planes."""
    a32 = np.asarray(a, np.float32)
    b32 = np.asarray(b, np.float32)
    if a32.shape != b32.shape:
        raise ValueError(f"epoch shapes differ: {a32.shape} vs {b32.shape}")
    H, W = a32.shape
    nd = np.float32(nodata)
    both = (a32 != nd) & (b32 != nd)
    av = np.where(both, a32.astype(np.float64), 0.0)
    bv = np.where(both, b32.astype(np.float64), 0.0)

    gdef = np.zeros((H, W), bool)
    ix = np.zeros((H, W), np.float64)
    iy = np.zeros((H, W), np.float64)
    if H >= 3 and W >= 3:
        ok = both
        gdef[1:-1, 1:-1] = (ok[:-2, :-2] & ok[:-2, 1:-1] & ok[:-2, 2:]
                            & ok[1:-1, :-2] & ok[1:-1, 1:-1]
                            & ok[1:-1, 2:] & ok[2:, :-2] & ok[2:, 1:-1]
                            & ok[2:, 2:])
        ix[1:-1, 1:-1] = ((av[:-2, 2:] + 2.0 * av[1:-1, 2:]
                           + av[2:, 2:])
                          - (av[:-2, :-2] + 2.0 * av[1:-1, :-2]
                             + av[2:, :-2]))
        iy[1:-1, 1:-1] = ((av[2:, :-2] + 2.0 * av[2:, 1:-1]
                           + av[2:, 2:])
                          - (av[:-2, :-2] + 2.0 * av[:-2, 1:-1]
                             + av[:-2, 2:]))
    # normalize the Sobel response (weight sum 8) to a true unit-pixel
    # derivative so (u, v) comes out in pixels/epoch
    ix *= 0.125
    iy *= 0.125
    ix[~gdef] = 0.0
    iy[~gdef] = 0.0
    it = np.where(gdef, bv - av, 0.0)

    k = 2 * radius + 1

    def box(plane):
        ii = np.zeros((H + 1, W + 1), np.float64)
        np.cumsum(plane, axis=0, out=ii[1:, 1:])
        np.cumsum(ii[1:, 1:], axis=1, out=ii[1:, 1:])
        s = ii[k:, k:] - ii[:-k, k:] - ii[k:, :-k] + ii[:-k, :-k]
        out = np.zeros((H, W), np.float64)
        out[radius:H - radius, radius:W - radius] = s
        return out

    cnt = box(gdef.astype(np.float64))
    full = np.zeros((H, W), bool)
    full[radius:H - radius, radius:W - radius] = True
    full &= cnt > k * k - 0.5

    sxx = box(ix * ix)
    syy = box(iy * iy)
    sxy = box(ix * iy)
    sxt = box(ix * it)
    syt = box(iy * it)

    det = sxx * syy - sxy * sxy
    tr = sxx + syy
    ok = full & (det > eps * tr * tr) & (tr > 0.0)
    with np.errstate(invalid="ignore", divide="ignore"):
        u = (-(syy * sxt - sxy * syt)) / np.where(ok, det, 1.0)
        v = (-(sxx * syt - sxy * sxt)) / np.where(ok, det, 1.0)
    uo = np.where(ok, u, np.float64(nd)).astype(np.float32)
    vo = np.where(ok, v, np.float64(nd)).astype(np.float32)
    return uo, vo


def optical_flow(tiles_ds, spec: GridSpec, *, epoch_a: int, epoch_b: int,
                 layer: str = "dem", radius: int = 3, eps: float = 1e-4,
                 fmt: str = "npz"):
    """Temporal tile table -> image-table Dataset of ``flow_u`` /
    ``flow_v`` tiles between the two epochs (one dual-plane halo
    shuffle; halo = radius + 1 for the Sobel ring)."""
    return dual_epoch_stage(
        tiles_ds, spec, epoch_a=epoch_a, epoch_b=epoch_b, layer=layer,
        radius=radius + 1, out_layers=("flow_u", "flow_v"),
        window_fn=lambda wa, wb, nd: lk_flow_kernel(
            wa, wb, nd, radius=radius, eps=eps),
        fmt=fmt)
