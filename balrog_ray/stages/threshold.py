"""Image thresholding over the tile table -- the classic binarization
pair (OpenCV ``threshold(THRESH_OTSU)`` and
``adaptiveThreshold(ADAPTIVE_THRESH_MEAN_C)`` roles; the reference's
raster side bins continuous layers the same way before class logic,
``reclassify`` SURVEY op 3's automatic cousin).

**Otsu (global)**: a documented global quantization contract -- pixel
bin = ``floor((v - lo) / (hi - lo) * bins)`` clipped to ``[0, bins-1]``
with (lo, hi) the EXACT global valid min/max from the ordered
layer-statistics fold -- makes the histogram integer, so the
distributed ``groupby(bin).sum`` fold is exact and the inter-class
variance argmax (first max wins) is deterministic.  Foreground is
``bin > t*`` decided in BIN domain, so the mask pass is a pure
per-pixel map: tiled == whole bit-exact by construction.  Scale shape:
two tiny folds (6-scalar stats, <= ``bins`` histogram rows) + one
stateless map -- pixels never shuffle.

**Adaptive mean (local)**: foreground where
``v > mean(valid window) - c``.  The predicate is evaluated in a
fixed-point integer domain (``v_u = rint(v * 1e6)`` micros,
``v_u * n_win > sum_u - c_u * n_win``) so the integral-image window
sums are integer-exact and the tiled run is bit-identical to the
whole-raster kernel -- the documented deviation is that the decision
uses micro-quantized values.  One halo shuffle sized to the window
radius.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .focal import _winsum, windowed_stage
from .halo import GridSpec

HIST_SCHEMA = pa.schema([("bin", pa.int64()), ("n", pa.int64())])


def otsu_from_hist(counts: np.ndarray) -> int:
    """Threshold bin t* maximizing inter-class variance
    ``w0 w1 (mu0 - mu1)^2`` over splits ``bin <= t`` / ``bin > t``;
    first (smallest) argmax wins.  Pure function of the integer
    histogram -- the single-process oracle and the driver-side step of
    the distributed pipeline are this same code."""
    c = np.asarray(counts, np.float64)
    bins = len(c)
    idx = np.arange(bins, dtype=np.float64)
    w0 = np.cumsum(c)
    total = w0[-1]
    if total <= 0:
        return 0
    s0 = np.cumsum(c * idx)
    w1 = total - w0
    with np.errstate(invalid="ignore", divide="ignore"):
        mu0 = s0 / w0
        mu1 = (s0[-1] - s0) / w1
        var_b = w0 * w1 * (mu0 - mu1) ** 2
    var_b = np.nan_to_num(var_b[:-1], nan=-1.0)
    return int(np.argmax(var_b))


def bin_index(arr: np.ndarray, lo: float, hi: float, bins: int,
              nodata: float) -> np.ndarray:
    """Global-contract bin of each pixel (int64; -1 where nodata).
    Degenerate rasters (hi <= lo) put every valid pixel in bin 0."""
    a = np.asarray(arr, np.float32)
    valid = a != np.float32(nodata)
    if hi <= lo:
        b = np.zeros(a.shape, np.int64)
    else:
        b = np.clip(((a.astype(np.float64) - lo) / (hi - lo)
                     * bins).astype(np.int64), 0, bins - 1)
    b[~valid] = -1
    return b


def otsu_threshold(tiles_ds, *, layer: str = "dem", bins: int = 256,
                   out_layer: str = "otsu", fmt: str = "npz"):
    """Image-table Dataset -> ``(mask_ds, info)``: binary mask tiles
    (1.0 foreground where ``bin > t*``, 0.0 background, nodata
    preserved) plus ``info = {"thr_bin", "lo", "hi", "bins"}``.  The
    two driver-side materializations are O(1) and O(bins) rows."""
    from .stats import layer_statistics

    stats = [r for r in layer_statistics(
        tiles_ds, layers=(layer,)).take_all() if r["layer"] == layer]
    if not stats:
        raise ValueError(f"no '{layer}' tiles in the input")
    lo, hi = float(stats[0]["min"]), float(stats[0]["max"])

    def hist_partial(b: pa.Table) -> pa.Table:
        from ..tiles.codec import Caption, decode_tile

        acc = np.zeros(bins, np.int64)
        for i in range(b.num_rows):
            cap = Caption.from_json(b.column("caption")[i].as_py())
            if cap.layer != layer:
                continue
            arr = decode_tile(b.column("bytes")[i].as_py(),
                              b.column("fmt")[i].as_py(), cap)
            bi = bin_index(arr, lo, hi, bins, cap.nodata)
            acc += np.bincount(bi[bi >= 0], minlength=bins)
        nz = np.nonzero(acc)[0]
        return pa.table({"bin": pa.array(nz, pa.int64()),
                         "n": pa.array(acc[nz], pa.int64())},
                        schema=HIST_SCHEMA)

    hist_rows = (tiles_ds.map_batches(hist_partial,
                                      batch_format="pyarrow")
                 .groupby("bin").sum("n").take_all())
    counts = np.zeros(bins, np.int64)
    for r in hist_rows:
        counts[int(r["bin"])] = int(r["sum(n)"])
    t = otsu_from_hist(counts)
    info = {"thr_bin": t, "lo": lo, "hi": hi, "bins": bins}

    def mask(b: pa.Table) -> pa.Table:
        import dataclasses

        from ..tiles.codec import Caption, decode_tile, encode_tile, \
            phash64
        from ..tiles.synth import TILES_SCHEMA

        cols = {c: [] for c in TILES_SCHEMA.names}
        for i in range(b.num_rows):
            cap = Caption.from_json(b.column("caption")[i].as_py())
            if cap.layer != layer:
                continue
            arr = decode_tile(b.column("bytes")[i].as_py(),
                              b.column("fmt")[i].as_py(), cap)
            bi = bin_index(arr, lo, hi, bins, cap.nodata)
            out = np.where(bi < 0, np.float32(cap.nodata),
                           (bi > t).astype(np.float32))
            ocap = dataclasses.replace(cap, layer=out_layer)
            payload, ocap = encode_tile(out, fmt, ocap)
            cols["image_id"].append(f"{out_layer}/{cap.tx}/{cap.ty}")
            cols["bytes"].append(payload)
            cols["w"].append(np.int32(out.shape[1]))
            cols["h"].append(np.int32(out.shape[0]))
            cols["fmt"].append(fmt)
            cols["caption"].append(ocap.to_json())
            cols["phash"].append(np.int64(phash64(out)))
        return pa.table(cols, schema=TILES_SCHEMA)

    return tiles_ds.map_batches(mask, batch_format="pyarrow"), info


def otsu_kernel(arr: np.ndarray, bins: int, nodata: float):
    """Whole-array single-process Otsu (the test oracle): same global
    contract, same tie rule.  Returns ``(mask, thr_bin)``."""
    a = np.asarray(arr, np.float32)
    v = a[a != np.float32(nodata)]
    if v.size == 0:
        raise ValueError("no valid pixels")
    lo, hi = float(v.min()), float(v.max())
    bi = bin_index(arr, lo, hi, bins, nodata)
    counts = np.bincount(bi[bi >= 0], minlength=bins)
    t = otsu_from_hist(counts)
    mask = np.where(bi < 0, np.float32(nodata),
                    (bi > t).astype(np.float32))
    return mask, t


def adaptive_mean_kernel(arr: np.ndarray, radius: int, c: float,
                         nodata: float) -> np.ndarray:
    """Whole-array adaptive mean threshold (the test oracle path too):
    foreground where ``v > mean(valid window) - c``, decided on
    micro-quantized (1e-6) values with integer window sums; nodata
    where the center is nodata."""
    a = np.asarray(arr, np.float32)
    valid = a != np.float32(nodata)
    vu = np.rint(a.astype(np.float64) * 1e6)
    vu[~valid] = 0.0
    cu = float(np.rint(c * 1e6))
    n_win = _winsum(valid.astype(np.float64), radius)
    sum_u = _winsum(vu, radius)
    # v_u * n > sum_u - c_u * n  (all terms integer-valued float64)
    fg = vu * n_win > sum_u - cu * n_win
    out = np.where(valid, fg.astype(np.float32), np.float32(nodata))
    return out


def adaptive_threshold(ds, spec: GridSpec, *, layer: str = "dem",
                       radius: int = 8, c: float = 2.0,
                       out_layer: str = "adaptive",
                       fmt: str = "npz"):
    """Distributed adaptive mean threshold: one radius-sized halo
    shuffle; integer-domain predicate makes the tiled output
    bit-identical to :func:`adaptive_mean_kernel`."""

    def fn(window: np.ndarray, nd: float) -> np.ndarray:
        return adaptive_mean_kernel(window, radius, c, nd)

    return windowed_stage(ds, spec, layer=layer, radius=radius,
                          out_layer=out_layer, window_fn=fn, fmt=fmt)
