"""Zhang-Suen skeletonization (thinning) over a tiled binary raster --
the morphological skeleton extractor (OpenCV ``ximgproc.thinning`` /
skimage ``morphology.skeletonize`` role), completing the engine's
morphology family (expand/shrink exist; thinning did not).  Natural
upstream: :mod:`.canny` edge masks or rasterized vectors.

Algorithm (Zhang & Suen 1984, deterministic): foreground pixels (value
``1``; nodata and everything else is background) are deleted in two
alternating sub-iterations; a pixel deletes when, over its frozen
8-neighborhood P2..P9 (clockwise from north, outside-raster = 0):

* ``2 <= B <= 6`` (foreground neighbor count),
* ``A == 1`` (0->1 circular transitions in P2..P9,P2),
* sub-iteration 0: ``P2*P4*P6 == 0`` and ``P4*P6*P8 == 0``;
  sub-iteration 1: ``P2*P4*P8 == 0`` and ``P2*P6*P8 == 0``.

All deletions in a sub-iteration are simultaneous (decided on the
frozen mask), so each sub-iteration is position-independent ->
bit-exact tiled parity on the radius-1 halo plan.

Scale shape: one halo exchange per sub-iteration plus a tiny global
foreground-count fold per round for convergence (counts are
monotonically decreasing; equality = converged).  Rounds scale with
maximum stroke half-width, not raster size -- the iterative-front
contract the hydrology stages established.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .focal import windowed_stage
from .halo import GridSpec


def zs_step_kernel(arr: np.ndarray, nodata: float,
                   sub: int) -> np.ndarray:
    """One Zhang-Suen sub-iteration on the whole array (float32 0/1
    out, nodata preserved as background 0 internally, re-emitted as
    nodata)."""
    a32 = np.asarray(arr, np.float32)
    H, W = a32.shape
    nd = np.float32(nodata)
    fg = a32 == np.float32(1.0)
    p = np.zeros((H + 2, W + 2), bool)
    p[1:-1, 1:-1] = fg

    # P2..P9 clockwise from north
    P = [p[0:H, 1:W + 1], p[0:H, 2:W + 2], p[1:H + 1, 2:W + 2],
         p[2:H + 2, 2:W + 2], p[2:H + 2, 1:W + 1], p[2:H + 2, 0:W],
         p[1:H + 1, 0:W], p[0:H, 0:W]]
    B = np.zeros((H, W), np.int64)
    for q in P:
        B += q
    A = np.zeros((H, W), np.int64)
    for i in range(8):
        A += (~P[i]) & P[(i + 1) % 8]
    if sub == 0:
        c1 = ~(P[0] & P[2] & P[4])
        c2 = ~(P[2] & P[4] & P[6])
    else:
        c1 = ~(P[0] & P[2] & P[6])
        c2 = ~(P[0] & P[4] & P[6])
    kill = fg & (B >= 2) & (B <= 6) & (A == 1) & c1 & c2
    out = np.where(fg & ~kill, np.float32(1.0), np.float32(0.0))
    out[a32 == nd] = nd
    return out


def skeleton_kernel(arr: np.ndarray, nodata: float, *,
                    max_rounds: int = 128) -> np.ndarray:
    """Whole-array skeleton: iterate sub-steps until stable."""
    cur = np.asarray(arr, np.float32)
    for _ in range(max_rounds):
        before = int((cur == np.float32(1.0)).sum())
        cur = zs_step_kernel(cur, nodata, 0)
        cur = zs_step_kernel(cur, nodata, 1)
        if int((cur == np.float32(1.0)).sum()) == before:
            return cur
    raise RuntimeError(f"skeleton did not stabilize in {max_rounds} "
                       f"rounds")


def _fg_count(ds) -> int:
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        from ..tiles.codec import Caption, decode_tile

        n = 0
        for i in range(b.num_rows):
            cap = Caption.from_json(b.column("caption")[i].as_py())
            arr = decode_tile(b.column("bytes")[i].as_py(),
                              b.column("fmt")[i].as_py(), cap)
            n += int((arr == np.float32(1.0)).sum())
        return pa.table({"n": pa.array([n], pa.int64())})

    row = (ds.map_batches(partial, batch_format="pyarrow")
           .aggregate(Sum("n", alias_name="n")))
    return int(row["n"] or 0)


def skeletonize(tiles_ds, spec: GridSpec, *, layer: str,
                max_rounds: int = 128, fmt: str = "npz"):
    """Image-table Dataset (binary layer) -> skeleton tiles (layer
    ``skeleton``).  Two halo exchanges per round + one count fold;
    stops on the first round that deletes nothing."""
    cur = tiles_ds.materialize()
    cur_layer = layer
    before = _fg_count(cur)
    for _ in range(max_rounds):
        for sub in (0, 1):
            cur = windowed_stage(
                cur, spec, layer=cur_layer, radius=1,
                out_layer="skeleton",
                window_fn=lambda w, nd, s=sub: zs_step_kernel(w, nd, s),
                fmt=fmt).materialize()
            cur_layer = "skeleton"
        after = _fg_count(cur)
        if after == before:
            return cur
        before = after
    raise RuntimeError(f"skeleton did not stabilize in {max_rounds} "
                       f"rounds")
