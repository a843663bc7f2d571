"""Richardson-Lucy deconvolution over the tiled raster table -- the
classic iterative deblur (skimage ``restoration.richardson_lucy`` /
astronomy pipeline role): recover a sharper field from an observation
blurred by a known PSF.  Each iteration is one dual-plane halo exchange
(observation + current estimate co-shuffled, the same
``dual_epoch_stage`` plan as SSIM/flow/stereo); the iteration count is
the only multiplier on exchanges -- deconvolution is inherently
iterative, and each round's shuffle moves the estimate exactly once.

Deterministic semantics (zero-padding boundary model, position
-independent so the tiled run is bit-exact):

* ``valid = obs != nodata``; invalid/outside-raster pixels contribute 0
  to every convolution and stay nodata in the estimate;
* per iteration: ``fwd = est (*) psf``; ``ratio = obs / max(fwd, eps)``
  at valid pixels else 0; ``est' = est * (ratio (*) psf_flipped)``;
* float64 inner math, float32 stored estimate (the tile codec
  contract); halo = 2 * (psf_side // 2) so the double convolution
  resolves locally.

The PSF ships in the stage closure (once per task, never per row) and
must be square, odd-sided and sum to 1.
"""

from __future__ import annotations

import numpy as np

from .halo import GridSpec
from .ssim import dual_epoch_stage


def _conv_zero(plane: np.ndarray, psf: np.ndarray) -> np.ndarray:
    """Zero-padded correlation-style convolution: out[p] = sum_q
    psf[q] * plane[p + q - r] with outside-array treated as 0."""
    H, W = plane.shape
    k = psf.shape[0]
    r = k // 2
    pad = np.zeros((H + 2 * r, W + 2 * r), np.float64)
    pad[r:r + H, r:r + W] = plane
    out = np.zeros((H, W), np.float64)
    for i in range(k):
        for j in range(k):
            w = psf[i, j]
            if w != 0.0:
                out += w * pad[i:i + H, j:j + W]
    return out


def rl_step_kernel(obs: np.ndarray, est: np.ndarray, nodata: float, *,
                   psf: np.ndarray, eps: float = 1e-9) -> np.ndarray:
    """One RL iteration on whole arrays; same result tiled (halo =
    2 * (psf_side // 2)) or whole."""
    o32 = np.asarray(obs, np.float32)
    e32 = np.asarray(est, np.float32)
    nd = np.float32(nodata)
    valid = o32 != nd
    if bool((valid & (o32 < 0)).any()):
        raise ValueError("Richardson-Lucy requires nonnegative "
                         "intensities; offset the input first")
    o = np.where(valid, o32.astype(np.float64), 0.0)
    e = np.where(e32 != nd, e32.astype(np.float64), 0.0)
    fwd = _conv_zero(e, psf)
    # a vanished forward model contributes NO correction (ratio 0)
    # rather than an obs/eps explosion -- the stable fixed point for
    # zero-intensity regions
    ratio = np.where(valid & (fwd > eps), o / np.where(fwd > eps, fwd,
                                                       1.0), 0.0)
    back = _conv_zero(ratio, psf[::-1, ::-1])
    out = (e * back).astype(np.float32)
    out[~valid] = nd
    return out


def _check_psf(psf: np.ndarray) -> np.ndarray:
    p = np.asarray(psf, np.float64)
    if p.ndim != 2 or p.shape[0] != p.shape[1] or p.shape[0] % 2 != 1:
        raise ValueError(f"psf must be square odd-sided, got {p.shape}")
    if not np.isclose(p.sum(), 1.0, atol=1e-9):
        raise ValueError(f"psf must sum to 1, got {p.sum()}")
    if (p < 0).any():
        raise ValueError("psf must be non-negative")
    return p


def rl_deconvolve(tiles_ds, spec: GridSpec, *, layer: str = "dem",
                  psf: np.ndarray, n_iter: int = 5, eps: float = 1e-9,
                  fmt: str = "npz"):
    """Image-table Dataset -> deconvolved estimate tiles (layer
    ``rl_est``) after ``n_iter`` RL rounds (one dual-plane halo
    exchange per round; estimate materialized between rounds)."""
    import json

    import pyarrow as pa

    p = _check_psf(psf)
    r2 = 2 * (p.shape[0] // 2)
    if r2 < 1:
        raise ValueError("psf side must be >= 3")

    def tag(ds, epoch: int, relabel_from: str | None = None):
        def fn(b: pa.Table) -> pa.Table:
            caps = b.column("caption").to_pylist()
            if relabel_from is not None:
                out_caps = []
                for c in caps:
                    d = json.loads(c)
                    if d.get("layer") == relabel_from:
                        d["layer"] = layer
                    out_caps.append(json.dumps(d, sort_keys=True))
                b = b.drop_columns(["caption"]).append_column(
                    "caption", pa.array(out_caps, pa.string()))
            return b.append_column(
                "epoch", pa.array(np.full(b.num_rows, epoch, np.int64)))

        return ds.map_batches(fn, batch_format="pyarrow")

    obs = tiles_ds.materialize()
    est = obs
    est_layer = layer
    for _ in range(n_iter):
        pair = tag(obs, 0).union(tag(est, 1, relabel_from=est_layer))
        est = dual_epoch_stage(
            pair, spec, epoch_a=0, epoch_b=1, layer=layer, radius=r2,
            out_layers=("rl_est",),
            window_fn=lambda wo, we, nd: (
                rl_step_kernel(wo, we, nd, psf=p, eps=eps),),
            fmt=fmt).materialize()
        est_layer = "rl_est"
    return est
