"""Global raster enhancement: histogram equalization and percentile
contrast stretch over the tile table -- the ``gdal_translate -scale``
/ image-normalization step of an imagery ingestion pipeline, and the
engine's canonical GLOBAL-STATISTIC -> BROADCAST -> MAP shape (the
reference's dynamic slope remap computes a global raster max the same
way, ``bal.py:110-114``).

Semantics (pinned by the whole-raster oracle in tests/test_enhance.py):
statistics are HISTOGRAM-based with ``bins`` equal-width bins over the
global [min, max] -- the standard approximate-percentile definition
GDAL's utilities use -- and both the tiled pipeline and a whole-raster
run bin pixels with identical arithmetic, so parity is exact, not just
close:

* ``equalize``: ``out = floor(255 * cdf_excl(bin(v)) / n_valid)`` where
  ``cdf_excl`` counts pixels in strictly lower bins (a step function;
  no within-bin interpolation);
* ``percentile_stretch``: cut values are the left edges of the first
  bins whose inclusive CDF reaches p_lo / p_hi, then a linear ramp to
  [0, 255], clipped.

Scale shape: two tiny statistics passes (per-tile min/max rows, then
per-tile histogram rows summed by ONE ``bins``-row groupby), a
driver-side LUT of ``bins`` scalars broadcast through the UDF closure,
and one stateless ``map_batches`` remap.  No shuffle ever carries
pixels; the histogram reduce moves ``bins x tiles`` ints.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from ..tiles.codec import Caption, decode_tile, encode_tile, phash64
from ..tiles.synth import TILES_SCHEMA


def _layer_filter(layer: str):
    def keep(b: pa.Table) -> pa.Table:
        caps = b.column("caption").to_pylist()
        idx = [i for i, c in enumerate(caps)
               if json.loads(c)["layer"] == layer]
        return b.take(pa.array(idx, pa.int64()))

    return keep


def global_min_max(ds, layer: str) -> tuple[float, float]:
    """Valid-pixel (min, max) of a layer: per-tile partials, one tiny
    aggregate."""
    import ray.data.aggregate as agg

    def partial(b: pa.Table) -> pa.Table:
        lo, hi = [], []
        for i in range(b.num_rows):
            cap = Caption.from_json(b.column("caption")[i].as_py())
            arr = decode_tile(b.column("bytes")[i].as_py(),
                              b.column("fmt")[i].as_py(), cap)
            ok = arr != np.float32(cap.nodata)
            if ok.any():
                lo.append(float(arr[ok].min()))
                hi.append(float(arr[ok].max()))
        return pa.table({"lo": pa.array(lo, pa.float64()),
                         "hi": pa.array(hi, pa.float64())})

    row = (ds.map_batches(_layer_filter(layer), batch_format="pyarrow")
           .map_batches(partial, batch_format="pyarrow")
           .aggregate(agg.Min("lo", alias_name="lo"),
                      agg.Max("hi", alias_name="hi")))
    if row["lo"] is None:
        raise ValueError(f"layer {layer!r} has no valid pixels")
    return float(row["lo"]), float(row["hi"])


def _bin(arr: np.ndarray, vmin: float, vmax: float,
         bins: int) -> np.ndarray:
    """Shared binning rule: identical arithmetic in the tiled pipeline,
    the whole-raster path and the oracle, or parity breaks."""
    span = vmax - vmin
    if span <= 0:
        return np.zeros(arr.shape, np.int64)
    idx = np.floor((arr.astype(np.float64) - vmin)
                   / span * bins).astype(np.int64)
    return np.clip(idx, 0, bins - 1)


def global_histogram(ds, layer: str, vmin: float, vmax: float,
                     bins: int = 256) -> np.ndarray:
    """Valid-pixel histogram over ``bins`` equal-width bins: per-tile
    partial counts, ONE groupby(bin) sum, driver gets ``bins`` ints."""
    import ray.data.aggregate as agg

    def partial(b: pa.Table) -> pa.Table:
        out_bin, out_n = [], []
        for i in range(b.num_rows):
            cap = Caption.from_json(b.column("caption")[i].as_py())
            arr = decode_tile(b.column("bytes")[i].as_py(),
                              b.column("fmt")[i].as_py(), cap)
            ok = arr != np.float32(cap.nodata)
            if not ok.any():
                continue
            counts = np.bincount(_bin(arr[ok], vmin, vmax, bins),
                                 minlength=bins)
            nz = np.flatnonzero(counts)
            out_bin.extend(nz.tolist())
            out_n.extend(counts[nz].tolist())
        return pa.table({"bin": pa.array(out_bin, pa.int64()),
                         "n": pa.array(out_n, pa.int64())})

    rows = (ds.map_batches(_layer_filter(layer), batch_format="pyarrow")
            .map_batches(partial, batch_format="pyarrow")
            .groupby("bin")
            .aggregate(agg.Sum("n", alias_name="n"))
            .take_all())
    hist = np.zeros(bins, np.int64)
    for r in rows:
        hist[int(r["bin"])] = int(r["n"])
    return hist


def _remap_stage(ds, layer: str, out_layer: str, lut: np.ndarray,
                 vmin: float, vmax: float, bins: int, fmt: str):
    lut = np.asarray(lut, np.float32)

    def remap(b: pa.Table) -> pa.Table:
        rows = {n: [] for n in TILES_SCHEMA.names}
        for i in range(b.num_rows):
            cap = Caption.from_json(b.column("caption")[i].as_py())
            arr = decode_tile(b.column("bytes")[i].as_py(),
                              b.column("fmt")[i].as_py(), cap)
            ok = arr != np.float32(cap.nodata)
            out = np.full(arr.shape, np.float32(cap.nodata), np.float32)
            out[ok] = lut[_bin(arr[ok], vmin, vmax, bins)]
            ocap = Caption(layer=out_layer, x0=cap.x0, y0=cap.y0,
                           pixel_size=cap.pixel_size, crs=cap.crs,
                           nodata=cap.nodata, edge=dict(cap.edge),
                           tx=cap.tx, ty=cap.ty)
            payload, ocap = encode_tile(out, fmt, ocap)
            rows["image_id"].append(f"{out_layer}/{cap.tx}/{cap.ty}")
            rows["bytes"].append(payload)
            rows["w"].append(np.int32(out.shape[1]))
            rows["h"].append(np.int32(out.shape[0]))
            rows["fmt"].append(fmt)
            rows["caption"].append(ocap.to_json())
            rows["phash"].append(np.int64(phash64(out)))
        return pa.table(rows, schema=TILES_SCHEMA)

    return (ds.map_batches(_layer_filter(layer), batch_format="pyarrow")
            .map_batches(remap, batch_format="pyarrow"))


def equalize_lut(hist: np.ndarray) -> np.ndarray:
    """bin -> equalized value in [0, 255] (exclusive-CDF step map)."""
    n = int(hist.sum())
    if n == 0:
        return np.zeros(len(hist), np.float32)
    cdf_excl = np.concatenate([[0], np.cumsum(hist)[:-1]])
    return np.floor(255.0 * cdf_excl / n).astype(np.float32)


def stretch_lut(hist: np.ndarray, vmin: float, vmax: float,
                p_lo: float, p_hi: float) -> np.ndarray:
    """bin -> linearly stretched value: cuts at the left edges of the
    first bins whose inclusive CDF reaches p_lo / p_hi."""
    if not 0.0 <= p_lo < p_hi <= 100.0:
        raise ValueError("need 0 <= p_lo < p_hi <= 100")
    bins = len(hist)
    n = int(hist.sum())
    edges = vmin + (vmax - vmin) * np.arange(bins) / bins
    if n == 0:
        return np.zeros(bins, np.float32)
    cdf = np.cumsum(hist) / n * 100.0
    lo_edge = edges[min(bins - 1,
                        int(np.searchsorted(cdf, p_lo, side="left")))]
    hi_edge = edges[min(bins - 1,
                        int(np.searchsorted(cdf, p_hi, side="left")))]
    if hi_edge <= lo_edge:
        return np.full(bins, 127.5, np.float32)
    centers = edges + 0.5 * (vmax - vmin) / bins
    out = (centers - lo_edge) / (hi_edge - lo_edge) * 255.0
    return np.clip(out, 0.0, 255.0).astype(np.float32)


def equalize(ds, layer: str = "dem", *, bins: int = 256,
             fmt: str = "npz"):
    """Histogram-equalize a layer to [0, 255] (layer ``eq_<layer>``)."""
    vmin, vmax = global_min_max(ds, layer)
    hist = global_histogram(ds, layer, vmin, vmax, bins)
    return _remap_stage(ds, layer, f"eq_{layer}", equalize_lut(hist),
                        vmin, vmax, bins, fmt)


def percentile_stretch(ds, layer: str = "dem", *, p_lo: float = 2.0,
                       p_hi: float = 98.0, bins: int = 256,
                       fmt: str = "npz"):
    """Percentile contrast stretch to [0, 255] (layer
    ``stretch_<layer>``)."""
    vmin, vmax = global_min_max(ds, layer)
    hist = global_histogram(ds, layer, vmin, vmax, bins)
    return _remap_stage(ds, layer, f"stretch_{layer}",
                        stretch_lut(hist, vmin, vmax, p_lo, p_hi),
                        vmin, vmax, bins, fmt)


def match_lut(src_hist: np.ndarray, ref_hist: np.ndarray,
              ref_vmin: float, ref_vmax: float) -> np.ndarray:
    """source bin -> reference-domain value: classic CDF matching.  Each
    source bin maps to the CENTER of the first reference bin whose
    inclusive CDF reaches the source bin's inclusive CDF (a step
    function -- no interpolation, so the rule is exactly reproducible
    whole-raster)."""
    bins = len(src_hist)
    if len(ref_hist) != bins:
        raise ValueError("histograms must share a bin count")
    ns, nr = int(src_hist.sum()), int(ref_hist.sum())
    centers = (ref_vmin + (ref_vmax - ref_vmin)
               * (np.arange(bins) + 0.5) / bins)
    if ns == 0 or nr == 0:
        return centers.astype(np.float32)
    src_cdf = np.cumsum(src_hist) / ns
    ref_cdf = np.cumsum(ref_hist) / nr
    j = np.searchsorted(ref_cdf, src_cdf, side="left")
    return centers[np.minimum(j, bins - 1)].astype(np.float32)


def histogram_match(src_ds, ref_ds, layer: str = "dem", *,
                    bins: int = 256, fmt: str = "npz"):
    """Match ``src_ds``'s value distribution to ``ref_ds``'s -- the
    radiometric-alignment step run on each acquisition before feathered
    mosaicking (GDAL ecosystem: ``rio hist``/histogram-matching scripts;
    no core gdal utility, which is why pipelines hand-roll it).

    Same GLOBAL-STATISTIC -> BROADCAST -> MAP shape as
    :func:`equalize`: two tiny min/max + histogram aggregates per side,
    a ``bins``-entry LUT in the closure, one stateless remap over the
    source tiles (layer ``match_<layer>``).  Pixels never shuffle."""
    svmin, svmax = global_min_max(src_ds, layer)
    rvmin, rvmax = global_min_max(ref_ds, layer)
    src_hist = global_histogram(src_ds, layer, svmin, svmax, bins)
    ref_hist = global_histogram(ref_ds, layer, rvmin, rvmax, bins)
    return _remap_stage(src_ds, layer, f"match_{layer}",
                        match_lut(src_hist, ref_hist, rvmin, rvmax),
                        svmin, svmax, bins, fmt)
