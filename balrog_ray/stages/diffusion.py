"""Perona-Malik anisotropic diffusion over the tiled raster -- the
classic edge-preserving iterative smoother (Perona & Malik 1990;
``medpy.filter.smoothing.anisotropic_diffusion`` / GRASS r.smooth
role), completing the denoise family next to the bilateral filter
(its non-iterative cousin) and Gaussian blur (its isotropic limit).

Explicit 4-neighbor scheme, one radius-1 halo exchange per round:

* ``u' = u + lam * sum_d g(grad_d) * grad_d`` over the four axial
  neighbors, ``grad_d = u_d - u``;
* conductance ``g(x) = exp(-(x/kappa)^2)`` (option 1, favors
  high-contrast edges) or ``1 / (1 + (x/kappa)^2)`` (option 2, favors
  wide regions);
* ``0 < lam <= 0.25`` enforced -- the explicit-scheme stability bound
  for a 4-neighbor stencil;
* nodata / off-raster neighbors contribute NO flux (zero-flux /
  Neumann boundary), and nodata pixels stay nodata -- diffusion never
  bleeds across holes;
* float64 inner math in a FIXED accumulation order (N, S, W, E),
  float32 stored between rounds (the tile codec contract), so the
  tiled run is bit-identical to repeated whole-raster kernel steps.

Scale shape: per-round cost is exactly one ``windowed_stage`` halo
shuffle of the evolving plane; the round count is the only multiplier
-- same contract as Richardson-Lucy (stages/deconv.py).
"""

from __future__ import annotations

import numpy as np

from .filters import _shift
from .focal import windowed_stage
from .halo import GridSpec

_DIRS = ((-1, 0), (1, 0), (0, -1), (0, 1))      # N, S, W, E -- fixed


def pm_step_kernel(arr: np.ndarray, nodata: float, *, kappa: float,
                   lam: float, option: int = 1) -> np.ndarray:
    """One diffusion step on a whole array; same result tiled (radius-1
    halo) or whole."""
    a32 = np.asarray(arr, np.float32)
    nd = np.float32(nodata)
    valid = a32 != nd
    a = np.where(valid, a32.astype(np.float64), 0.0)
    out = a.copy()
    k2 = float(kappa) ** 2
    for dy, dx in _DIRS:
        nv = _shift(a, dy, dx, 0.0)
        nm = _shift(valid.astype(np.float64), dy, dx, 0.0) > 0.5
        grad = nv - a
        if option == 1:
            g = np.exp(-(grad * grad) / k2)
        else:
            g = 1.0 / (1.0 + (grad * grad) / k2)
        out += float(lam) * np.where(valid & nm, g * grad, 0.0)
    res = out.astype(np.float32)
    res[~valid] = nd
    return res


def pm_diffuse(tiles_ds, spec: GridSpec, *, layer: str = "dem",
               kappa: float = 10.0, lam: float = 0.2, n_iter: int = 5,
               option: int = 1, out_layer: str = "pm",
               fmt: str = "npz"):
    """Image-table Dataset -> diffused tiles (layer ``out_layer``)
    after ``n_iter`` rounds, one halo exchange per round."""
    if not 0.0 < lam <= 0.25:
        raise ValueError(f"lam {lam} outside the stable (0, 0.25] "
                         f"range for the 4-neighbor explicit scheme")
    if kappa <= 0:
        raise ValueError("kappa must be > 0")
    if option not in (1, 2):
        raise ValueError("option must be 1 or 2")

    def fn(window: np.ndarray, nd: float) -> np.ndarray:
        return pm_step_kernel(window, nd, kappa=kappa, lam=lam,
                              option=option)

    cur, cur_layer = tiles_ds, layer
    for _ in range(int(n_iter)):
        cur = windowed_stage(cur, spec, layer=cur_layer, radius=1,
                             out_layer=out_layer, window_fn=fn,
                             fmt=fmt).materialize()
        cur_layer = out_layer
    return cur
