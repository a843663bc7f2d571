"""Grayscale morphology + reconstruction over the tiled raster -- the
focal min/max family (GRASS ``r.neighbors method=minimum/maximum``,
``scipy.ndimage.grey_erosion/dilation/opening/closing``,
``skimage.morphology.reconstruction``) that complements the categorical
Expand/Shrink pair (stages/morphology.py) and the rank/mean focal stats
(stages/focal.py) with the order-statistics operators image pipelines
lean on for despeckling, background removal and peak detection.

Operators, all nodata-aware (nodata cells are inert: never a candidate,
always nodata in the output; out-of-raster likewise contributes no
candidate -- the footprint is clipped, not padded):

* ``erode``  -- min over the structuring element (SE), origin included
* ``dilate`` -- max over the SE
* ``open``   -- dilate(erode(f)); ``close`` -- erode(dilate(f))
* ``white_tophat`` -- f - open(f)   (bright small-scale structure)
* ``black_tophat`` -- close(f) - f  (dark small-scale structure)
* ``gradient``     -- dilate(f) - erode(f)  (edge strength)
* ``reconstruct``  -- geodesic reconstruction by dilation of a marker
  plane under a mask plane: iterate ``marker = min(dilate3x3(marker),
  mask)`` to stability (Vincent 1993 semantics via the parallel
  iteration)
* ``h_maxima`` / ``h_minima`` -- peak/pit suppression by contrast
  ``h``: ``R_dil(f - h; f)`` and its dual by negation

SE shapes: ``"disk"`` (Euclidean, dy^2 + dx^2 <= n^2) or ``"square"``
(Chebyshev, max(|dy|, |dx|) <= n).  Both are symmetric, so the standard
anti-extensivity/extensivity properties hold on valid cells
(open(f) <= f <= close(f)) and the oracles in tests/test_gray_morph.py
pin them.

Distributed shape and exactness:

* erode / dilate / gradient ride :func:`..stages.focal.windowed_stage`
  with ``radius = n`` -- ONE keyed halo shuffle, bit-exact tiled ==
  whole because min/max are order-free.
* open / close / top-hats are FUSED into one exchange with
  ``radius = 2n``: the inner pass (erode for open) is computed over the
  assembled window, and every inner value within ``n`` of the core --
  the only ones the outer pass reads -- sees its full ``n``-footprint
  inside the window (window halo is ``2n``, and window edges coincide
  with true raster edges per ``GridSpec.assembled_window``), so the
  core crop is bit-identical to a whole-raster run.  Rim values beyond
  ``n`` of the core are computed with truncated context but are never
  read by the outer pass at core cells and are cropped away.  One
  shuffle instead of two.
* ``reconstruct`` is one radius-1 dual-plane exchange
  (:func:`..stages.ssim.dual_epoch_stage`, marker tagged epoch 1 / mask
  epoch 0) plus one changed-cell count fold per round; rounds scale
  with the geodesic diameter of the marker's flood region, and the
  shuffle each round carries only the two evolving planes' strips.
  Convergence is exact (changed == 0), with the post-loop re-check the
  round-2 advice prescribed for all iterative stages.

Per-cell compute is a vectorized shift-reduce over the <= (2n+1)^2 SE
offsets (no pixel loops), the same pattern as Expand/Shrink.
"""

from __future__ import annotations

import numpy as np

from .focal import windowed_stage
from .halo import GridSpec
from .ssim import dual_epoch_stage

_F32_INF = np.float32(np.inf)


def se_offsets(n: int, shape: str = "disk") -> list[tuple[int, int]]:
    """Structuring-element offsets including the origin, row-major
    deterministic order."""
    if n < 1:
        raise ValueError("n must be >= 1")
    if shape not in ("disk", "square"):
        raise ValueError(f"unknown SE shape {shape!r}")
    out = []
    for dy in range(-n, n + 1):
        for dx in range(-n, n + 1):
            if shape == "square" or dy * dy + dx * dx <= n * n:
                out.append((dy, dx))
    return out


def _shift_fill(a: np.ndarray, dy: int, dx: int,
                fill: np.float32) -> np.ndarray:
    """out[r, c] = a[r + dy, c + dx], ``fill`` where the source is
    outside the array."""
    H, W = a.shape
    out = np.full((H, W), fill, a.dtype)
    r0, r1 = max(0, -dy), min(H, H - dy)
    c0, c1 = max(0, -dx), min(W, W - dx)
    if r0 < r1 and c0 < c1:
        out[r0:r1, c0:c1] = a[r0 + dy:r1 + dy, c0 + dx:c1 + dx]
    return out


def _rank_pass(arr: np.ndarray, nodata: float, offsets, op: str
               ) -> np.ndarray:
    """min/max over the SE footprint, ignoring nodata and out-of-bounds
    candidates; nodata cells stay nodata.  Exact float32 (order-free
    min/max only)."""
    a = np.asarray(arr, np.float32)
    nd = np.float32(nodata)
    valid = a != nd
    sent = _F32_INF if op == "min" else -_F32_INF
    acc = np.full(a.shape, sent, np.float32)
    masked = np.where(valid, a, sent)
    for dy, dx in offsets:
        cand = _shift_fill(masked, dy, dx, sent)
        acc = np.minimum(acc, cand) if op == "min" else \
            np.maximum(acc, cand)
    # origin is in the SE and valid wherever we emit, so acc is finite
    # on every valid cell
    out = np.where(valid, acc, nd).astype(np.float32)
    return out


def erode_kernel(arr, nodata, *, n=1, shape="disk"):
    return _rank_pass(arr, nodata, se_offsets(n, shape), "min")


def dilate_kernel(arr, nodata, *, n=1, shape="disk"):
    return _rank_pass(arr, nodata, se_offsets(n, shape), "max")


def open_kernel(arr, nodata, *, n=1, shape="disk"):
    off = se_offsets(n, shape)
    return _rank_pass(_rank_pass(arr, nodata, off, "min"), nodata, off,
                      "max")


def close_kernel(arr, nodata, *, n=1, shape="disk"):
    off = se_offsets(n, shape)
    return _rank_pass(_rank_pass(arr, nodata, off, "max"), nodata, off,
                      "min")


def _residual(a: np.ndarray, b: np.ndarray, nodata: float) -> np.ndarray:
    """a - b on valid cells, nodata elsewhere (both inputs share the
    validity mask by construction)."""
    nd = np.float32(nodata)
    valid = np.asarray(a, np.float32) != nd
    out = (np.asarray(a, np.float32) - np.asarray(b, np.float32))
    out = out.astype(np.float32)
    out[~valid] = nd
    return out


def white_tophat_kernel(arr, nodata, *, n=1, shape="disk"):
    return _residual(arr, open_kernel(arr, nodata, n=n, shape=shape),
                     nodata)


def black_tophat_kernel(arr, nodata, *, n=1, shape="disk"):
    return _residual(close_kernel(arr, nodata, n=n, shape=shape), arr,
                     nodata)


def gradient_kernel(arr, nodata, *, n=1, shape="disk"):
    return _residual(dilate_kernel(arr, nodata, n=n, shape=shape),
                     erode_kernel(arr, nodata, n=n, shape=shape),
                     nodata)


_SINGLE = {"erode": (erode_kernel, 1), "dilate": (dilate_kernel, 1),
           "gradient": (gradient_kernel, 1)}
_FUSED = {"open": (open_kernel, 2), "close": (close_kernel, 2),
          "white_tophat": (white_tophat_kernel, 2),
          "black_tophat": (black_tophat_kernel, 2)}
KERNELS = {**_SINGLE, **_FUSED}


def gray_morph(tiles_ds, spec: GridSpec, *, op: str, layer: str = "dem",
               n: int = 1, shape: str = "disk",
               out_layer: str | None = None, fmt: str = "npz"):
    """Image-table Dataset -> morphology-result tiles (layer
    ``out_layer``, default the op name).  One halo exchange total:
    ``radius = n`` for erode/dilate/gradient, ``radius = 2n`` for the
    fused open/close/top-hat pairs (see module docstring for why the
    core crop stays bit-exact)."""
    if op not in KERNELS:
        raise ValueError(f"unknown op {op!r}; one of {sorted(KERNELS)}")
    kern, mult = KERNELS[op]
    se_offsets(n, shape)                    # validate n / shape early

    def fn(window: np.ndarray, nd: float) -> np.ndarray:
        return kern(window, nd, n=n, shape=shape)

    return windowed_stage(tiles_ds, spec, layer=layer, radius=mult * n,
                          out_layer=out_layer or op, window_fn=fn,
                          fmt=fmt)


# ---------------------------------------------------------------- #
# geodesic reconstruction by dilation                               #
# ---------------------------------------------------------------- #

_SE3 = se_offsets(1, "square")              # 8-connected unit SE


def reconstruct_step_kernel(mask: np.ndarray, marker: np.ndarray,
                            nodata: float, *,
                            mode: str = "dilation") -> tuple:
    """One parallel geodesic step: ``min(dilate3x3(marker), mask)``
    (mode="dilation") or ``max(erode3x3(marker), mask)``
    (mode="erosion") on valid cells; returns (new_marker, changed)
    where ``changed`` is a 0/1 float32 plane (nodata cells are 0)."""
    if mode == "dilation":
        new = np.minimum(_rank_pass(marker, nodata, _SE3, "max"),
                         np.asarray(mask, np.float32))
    elif mode == "erosion":
        new = np.maximum(_rank_pass(marker, nodata, _SE3, "min"),
                         np.asarray(mask, np.float32))
    else:
        raise ValueError(f"unknown mode {mode!r}")
    nd = np.float32(nodata)
    valid = np.asarray(mask, np.float32) != nd
    new = np.where(valid, new, nd).astype(np.float32)
    changed = (valid & (new != np.asarray(marker, np.float32))
               ).astype(np.float32)
    return new, changed


def reconstruct_whole(mask: np.ndarray, marker: np.ndarray,
                      nodata: float, *, mode: str = "dilation",
                      max_rounds: int = 100000) -> np.ndarray:
    """Single-array oracle: iterate the parallel step to stability.
    Requires marker <= mask (dilation) / marker >= mask (erosion) on
    valid cells."""
    cur = np.asarray(marker, np.float32)
    for _ in range(max_rounds):
        new, changed = reconstruct_step_kernel(mask, cur, nodata,
                                               mode=mode)
        cur = new
        if not changed.any():
            return cur
    raise RuntimeError("reconstruction did not converge")


def _tag_epoch(ds, epoch: int, layer: str,
               relabel_from: str | None = None):
    """Append an epoch column (and optionally rewrite the caption layer)
    so two planes ride one dual_epoch_stage shuffle."""
    import json

    import pyarrow as pa

    def fn(b):
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


def _keep_layer(ds, layer: str):
    """Batch-level layer filter over the image table."""
    import json

    import pyarrow as pa

    def fn(b):
        keep = [i for i, c in enumerate(b.column("caption").to_pylist())
                if json.loads(c)["layer"] == layer]
        return b.take(pa.array(keep, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")


def _changed_count(ds, layer: str) -> int:
    """Sum of the 0/1 change plane across all tiles -- the convergence
    fold (exact: the plane is 0.0/1.0 float32, summed as int64)."""
    import pyarrow as pa

    from ..tiles.codec import Caption, decode_tile

    def partial(b):
        tot = 0
        for payload, fmt, cap_json in zip(
                b.column("bytes").to_pylist(),
                b.column("fmt").to_pylist(),
                b.column("caption").to_pylist()):
            cap = Caption.from_json(cap_json)
            if cap.layer != layer:
                continue
            tot += int(np.rint(
                decode_tile(payload, fmt, cap).sum()))
        return pa.table({"n": pa.array([tot], pa.int64())})

    return int(ds.map_batches(partial, batch_format="pyarrow")
               .sum("n") or 0)


def reconstruct(tiles_ds, spec: GridSpec, *, mask_layer: str,
                marker_layer: str, out_layer: str = "recon",
                mode: str = "dilation", max_rounds: int = 10000,
                fmt: str = "npz"):
    """Image-table Dataset (carrying BOTH ``mask_layer`` and
    ``marker_layer`` tiles) -> reconstructed tiles (layer
    ``out_layer``).  One dual-plane radius-1 halo exchange + one count
    fold per round; stops when no cell changed."""
    mask = _keep_layer(tiles_ds, mask_layer).materialize()
    cur = _keep_layer(tiles_ds, marker_layer).materialize()
    cur_layer = marker_layer
    converged = False
    for _ in range(int(max_rounds)):
        pair = _tag_epoch(mask, 0, mask_layer).union(
            _tag_epoch(cur, 1, mask_layer, relabel_from=cur_layer))
        both = dual_epoch_stage(
            pair, spec, epoch_a=0, epoch_b=1, layer=mask_layer,
            radius=1, out_layers=(out_layer, f"{out_layer}@chg"),
            window_fn=lambda wm, wk, nd:
                reconstruct_step_kernel(wm, wk, nd, mode=mode),
            fmt=fmt).materialize()
        chg = _changed_count(both, f"{out_layer}@chg")
        cur = _keep_layer(both, out_layer).materialize()
        cur_layer = out_layer
        if chg == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"reconstruct did not converge in {max_rounds} rounds")
    return cur


def _offset_layer(ds, layer: str, delta: float, out_layer: str,
                  nodata_aware: bool = True, fmt: str = "npz"):
    """Re-emit ``layer`` tiles with ``delta`` added to valid cells,
    relabelled ``out_layer`` (tile-local, no shuffle)."""
    import pyarrow as pa

    from ..tiles.codec import Caption, decode_tile, encode_tile, phash64
    from ..tiles.synth import TILES_SCHEMA

    def fn(b):
        cols = {c: [] for c in TILES_SCHEMA.names}
        for i in range(b.num_rows):
            cap = Caption.from_json(b.column("caption")[i].as_py())
            if cap.layer != layer:
                continue
            arr = decode_tile(b.column("bytes")[i].as_py(),
                              b.column("fmt")[i].as_py(), cap)
            nd = np.float32(cap.nodata)
            out = np.where(arr != nd,
                           (arr + np.float32(delta)).astype(np.float32),
                           nd)
            ocap = Caption(layer=out_layer, x0=cap.x0, y0=cap.y0,
                           pixel_size=cap.pixel_size, crs=cap.crs,
                           nodata=cap.nodata, edge=dict(cap.edge),
                           tx=cap.tx, ty=cap.ty)
            payload, ocap = encode_tile(out, fmt, ocap)
            h, w = out.shape
            cols["image_id"].append(f"{out_layer}/{cap.tx}/{cap.ty}")
            cols["bytes"].append(payload)
            cols["w"].append(np.int32(w))
            cols["h"].append(np.int32(h))
            cols["fmt"].append(fmt)
            cols["caption"].append(ocap.to_json())
            cols["phash"].append(np.int64(phash64(out)))
        return pa.table(cols, schema=TILES_SCHEMA)

    return ds.map_batches(fn, batch_format="pyarrow")


def h_maxima(tiles_ds, spec: GridSpec, *, layer: str = "dem",
             h: float, out_layer: str = "hmax",
             max_rounds: int = 10000, fmt: str = "npz"):
    """Suppress maxima shallower than ``h``: ``R_dil(f - h; f)``.
    Peaks that rise less than ``h`` above their surroundings are
    flattened; taller peaks lose exactly ``h`` of their summit."""
    if h <= 0:
        raise ValueError("h must be > 0")
    marker = _offset_layer(tiles_ds, layer, -float(h),
                           f"{layer}@marker", fmt=fmt)
    both = _keep_layer(tiles_ds, layer).union(marker)
    return reconstruct(both, spec, mask_layer=layer,
                       marker_layer=f"{layer}@marker",
                       out_layer=out_layer, max_rounds=max_rounds,
                       fmt=fmt)


def h_minima(tiles_ds, spec: GridSpec, *, layer: str = "dem",
             h: float, out_layer: str = "hmin",
             max_rounds: int = 10000, fmt: str = "npz"):
    """Suppress minima shallower than ``h``: ``R_ero(f + h; f)`` --
    the dual of :func:`h_maxima` (pit filling by contrast, the
    morphological cousin of hydrology's fill_sinks)."""
    if h <= 0:
        raise ValueError("h must be > 0")
    marker = _offset_layer(tiles_ds, layer, float(h),
                           f"{layer}@marker", fmt=fmt)
    both = _keep_layer(tiles_ds, layer).union(marker)
    return reconstruct(both, spec, mask_layer=layer,
                       marker_layer=f"{layer}@marker",
                       out_layer=out_layer, mode="erosion",
                       max_rounds=max_rounds, fmt=fmt)
