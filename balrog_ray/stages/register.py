"""Phase-correlation image registration between two raster epochs --
the global-translation estimator (OpenCV ``phaseCorrelate`` / skimage
``registration.phase_cross_correlation`` role): the alignment step a
tile archive runs before temporal compositing or change detection when
acquisitions are shifted (the reference mosaics assume pre-registered
inputs; this is the beyond-reference step that checks/repairs that
assumption).

Distributed shape: per-tile estimates need NO halo -- each
``(layer, cell)`` group already carries both epochs' payloads through
the same single ``groupby`` exchange as ``temporal.change_detection``;
each group emits one integer (dy, dx) vote with a fixed-point response
weight; the global translation is a tiny ``groupby((dy, dx)).sum``
vote fold.  At archive scale the votes table is one row per tile --
nothing pixel-sized is exchanged twice.

Deterministic semantics:

* per tile: mean-center over valid pixels, zero-fill nodata, 2-D FFT,
  cross-power spectrum ``R = conj(Fa) * Fb / max(|conj(Fa) * Fb|,
  eps)``, ``r = real(ifft2(R))``; the estimate is ``argmax r`` (ties:
  first in row-major order -- a total order), wrapped to
  ``[-T/2, T/2)``; the weight is ``round(peak * 1e6)``;
* tiles with fewer than ``min_valid_frac`` valid pixels in either
  epoch abstain (clouds/nodata do not vote);
* the global estimate is the (dy, dx) with the largest summed weight,
  ties broken by (dy, dx) ascending.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .halo import GridSpec
from .temporal import _cell_key


def phase_shift_kernel(a: np.ndarray, b: np.ndarray, nodata: float, *,
                       eps: float = 1e-12):
    """One co-located pair -> (dy, dx, peak): the circular shift that
    best maps A onto B, by inverse cross-power spectrum."""
    a32 = np.asarray(a, np.float32)
    b32 = np.asarray(b, np.float32)
    if a32.shape != b32.shape:
        raise ValueError(f"shapes differ: {a32.shape} vs {b32.shape}")
    nd = np.float32(nodata)
    va = a32 != nd
    vb = b32 != nd
    af = np.where(va, a32.astype(np.float64), np.nan)
    bf = np.where(vb, b32.astype(np.float64), np.nan)
    am = np.nanmean(af) if va.any() else 0.0
    bm = np.nanmean(bf) if vb.any() else 0.0
    az = np.where(va, a32.astype(np.float64) - am, 0.0)
    bz = np.where(vb, b32.astype(np.float64) - bm, 0.0)
    fa = np.fft.fft2(az)
    fb = np.fft.fft2(bz)
    # conj(Fa) * Fb puts the correlation peak at +s for B = roll(A, s):
    # the returned (dy, dx) is the shift that maps A onto B
    cross = np.conj(fa) * fb
    r = np.fft.ifft2(cross / np.maximum(np.abs(cross), eps)).real
    idx = int(r.argmax())
    H, W = r.shape
    dy, dx = divmod(idx, W)
    if dy >= H // 2:
        dy -= H
    if dx >= W // 2:
        dx -= W
    return dy, dx, float(r.ravel()[idx])


def phase_votes(tiles_ds, spec: GridSpec, *, epoch_a: int, epoch_b: int,
                layer: str = "dem", min_valid_frac: float = 0.9):
    """Temporal tile table -> one ``(tx, ty, dy, dx, weight_u)`` vote
    row per tile where both epochs are sufficiently valid."""

    def per_cell(group: pa.Table) -> pa.Table:
        from ..tiles.codec import Caption, decode_tile

        g = group.to_pydict()
        empty = pa.table({"tx": pa.array([], pa.int64()),
                          "ty": pa.array([], pa.int64()),
                          "dy": pa.array([], pa.int64()),
                          "dx": pa.array([], pa.int64()),
                          "weight_u": pa.array([], pa.int64())})
        by_epoch = {e: i for i, e in enumerate(g["epoch"])}
        if epoch_a not in by_epoch or epoch_b not in by_epoch:
            return empty
        tiles = {}
        for e in (epoch_a, epoch_b):
            i = by_epoch[e]
            cap = Caption.from_json(g["caption"][i])
            tiles[e] = (decode_tile(g["bytes"][i], g["fmt"][i], cap), cap)
        a, cap = tiles[epoch_a]
        b, _ = tiles[epoch_b]
        nd = np.float32(cap.nodata)
        thr = min_valid_frac * a.size
        if (a != nd).sum() < thr or (b != nd).sum() < thr:
            return empty
        dy, dx, peak = phase_shift_kernel(a, b, float(cap.nodata))
        return pa.table({
            "tx": pa.array([cap.tx], pa.int64()),
            "ty": pa.array([cap.ty], pa.int64()),
            "dy": pa.array([dy], pa.int64()),
            "dx": pa.array([dx], pa.int64()),
            "weight_u": pa.array([int(np.rint(peak * 1_000_000))],
                                 pa.int64())})

    return (tiles_ds
            .filter(expr=f"epoch == {epoch_a} or epoch == {epoch_b}")
            .map_batches(lambda b: _cell_key(b, spec.tiles_x),
                         batch_format="pyarrow")
            .groupby(["layer", "cell"])
            .map_groups(per_cell, batch_format="pyarrow"))


def global_shift(votes_ds):
    """Vote rows -> the single winning ``(dy, dx, total_weight_u,
    n_tiles)`` row (weight-summed, deterministic tie order)."""
    from ray.data.aggregate import Count, Sum

    agg = (votes_ds.groupby(["dy", "dx"])
           .aggregate(Sum("weight_u", alias_name="total_weight_u"),
                      Count(alias_name="n_tiles")))
    return (agg.sort(["total_weight_u", "dy", "dx"],
                     descending=[True, False, False])
            .limit(1))
