"""GLCM texture metrics (Haralick 1973): per-pixel gray-level
co-occurrence statistics over a sliding window -- the classic
remote-sensing texture layer (GRASS ``r.texture`` / Orfeo
``HaralickTextureExtraction`` role; the reference's raster toolbox has
no texture op, this is a beyond-reference neighborhood stage riding the
same halo-window shuffle as focal/terrain, SURVEY op 13's family).

Definition used (deterministic, orientation-specific, asymmetric): for
center pixel p, collect all ordered pairs ``(a, b) = (q[y, x],
q[y+dy, x+dx])`` whose BASE pixel ``(y, x)`` lies in the ``(2r+1)^2``
window centered at p and whose both ends are valid in-raster pixels;
``q`` is the global linear quantization of the input into ``levels``
bins over a CALLER-SUPPLIED ``(vmin, vmax)`` range (a global contract,
never per-tile -- per-tile ranges would make seams).  With
``P = counts / total`` over the window:

* ``contrast``     = sum P[i,j] * (i-j)^2
* ``homogeneity``  = sum P[i,j] / (1 + (i-j)^2)
* ``energy``       = sum P[i,j]^2          (angular second moment)
* ``entropy``      = -sum P[i,j] * ln P[i,j]

Pixels whose window holds no valid pair (or that are nodata themselves)
are nodata.

Scale shape: one ``windowed_stage`` halo exchange with radius
``r + max(|dy|, |dx|)``; the kernel is ``levels^2`` integral-image
window sums (vectorized cumsum), never a per-pixel histogram loop."""

from __future__ import annotations

import numpy as np

from .focal import windowed_stage
from .halo import GridSpec


def _window_sum(plane: np.ndarray, r: int) -> np.ndarray:
    """Clipped-window box sum via a zero-padded integral image."""
    H, W = plane.shape
    ii = np.zeros((H + 1, W + 1), np.float64)
    np.cumsum(plane, axis=0, out=ii[1:, 1:])
    np.cumsum(ii[1:, 1:], axis=1, out=ii[1:, 1:])
    y0 = np.clip(np.arange(H) - r, 0, H)
    y1 = np.clip(np.arange(H) + r + 1, 0, H)
    x0 = np.clip(np.arange(W) - r, 0, W)
    x1 = np.clip(np.arange(W) + r + 1, 0, W)
    return (ii[y1][:, x1] - ii[y0][:, x1]
            - ii[y1][:, x0] + ii[y0][:, x0])


def glcm_kernel(arr: np.ndarray, nodata: float, *, metric: str,
                levels: int = 8, vmin: float, vmax: float,
                radius: int = 2, dy: int = 0, dx: int = 1) -> np.ndarray:
    """Whole-array GLCM texture; same result tiled or not (the parity
    contract windowed_stage enforces)."""
    if metric not in ("contrast", "homogeneity", "energy", "entropy"):
        raise ValueError(f"unknown GLCM metric {metric!r}")
    a = np.asarray(arr, np.float32)
    H, W = a.shape
    nd = np.float32(nodata)
    valid = a != nd
    span = max(vmax - vmin, 1e-30)
    q = np.clip(((a.astype(np.float64) - vmin) / span * levels).astype(
        np.int64), 0, levels - 1)

    # base-pixel pair code plane: -1 where the pair leaves the raster or
    # touches nodata
    code = np.full((H, W), -1, np.int64)
    ys = slice(max(0, -dy), min(H, H - dy))
    xs = slice(max(0, -dx), min(W, W - dx))
    ys2 = slice(ys.start + dy, ys.stop + dy)
    xs2 = slice(xs.start + dx, xs.stop + dx)
    pair_ok = valid[ys, xs] & valid[ys2, xs2]
    code[ys, xs] = np.where(pair_ok, q[ys, xs] * levels + q[ys2, xs2], -1)

    tot = np.zeros((H, W), np.float64)
    acc = np.zeros((H, W), np.float64)
    ent_n = np.zeros((H, W), np.float64)   # sum cnt*ln(cnt) for entropy
    for c in range(levels * levels):
        cnt = _window_sum(code == c, radius)
        if not cnt.any():
            continue
        tot += cnt
        i, j = divmod(c, levels)
        d2 = float((i - j) * (i - j))
        if metric == "contrast":
            acc += cnt * d2
        elif metric == "homogeneity":
            acc += cnt / (1.0 + d2)
        elif metric == "energy":
            acc += cnt * cnt
        else:                               # entropy
            with np.errstate(divide="ignore", invalid="ignore"):
                ent_n += np.where(cnt > 0, cnt * np.log(cnt), 0.0)

    ok = valid & (tot > 0)
    t = np.maximum(tot, 1.0)
    if metric == "contrast" or metric == "homogeneity":
        out = acc / t
    elif metric == "energy":
        out = acc / (t * t)
    else:
        out = np.log(t) - ent_n / t
    return np.where(ok, out, np.float64(nd)).astype(np.float32)


def glcm_texture(ds, spec: GridSpec, *, metric: str = "contrast",
                 levels: int = 8, vmin: float, vmax: float,
                 radius: int = 2, dy: int = 0, dx: int = 1,
                 layer: str = "dem", out_layer: str | None = None,
                 fmt: str = "npz"):
    """Image-table Dataset -> per-pixel GLCM texture layer."""
    def fn(window: np.ndarray, nd: float) -> np.ndarray:
        return glcm_kernel(window, nd, metric=metric, levels=levels,
                           vmin=vmin, vmax=vmax, radius=radius,
                           dy=dy, dx=dx)

    return windowed_stage(ds, spec, layer=layer,
                          radius=radius + max(abs(dy), abs(dx)),
                          out_layer=out_layer or f"glcm_{metric}",
                          window_fn=fn, fmt=fmt)
