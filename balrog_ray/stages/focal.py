"""Generic focal (moving-window) statistics over a tiled raster layer --
the FocalStatistics / gdaldem neighborhood-op surface of the ecosystem
the reference toolbox lives in (its ``convo`` directional scan,
``calculate_bal.py:169-214``, is a special-cased focal op; this stage is
the user-facing general form for mean / sum / min / max / std / count
over a square (2r+1)^2 window).

Shape: the BAL pipeline's halo machinery, re-parameterized -- a
:class:`FocalGridSpec` sizes the halo to the window radius, the shared
strip emitter fans each tile into <=9 keyed contributions, and ONE
``groupby(cell_id)`` shuffle co-locates everything a tile's windows can
see.  Per-cell compute is pure vectorized numpy: clipped-window sums via
a padded integral image (O(1) per pixel for mean/sum/std/count) and a
separable shift-reduce for min/max.  Edge semantics match a whole-raster
run exactly: windows clip at true raster edges (the assembled canvas is
clipped there), and nodata cells are ignored -- a window with zero valid
cells emits nodata in every stat, including count.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from .halo import GridSpec, assemble_window, make_strip_emitter_batch

STATS = ("mean", "sum", "count", "std", "min", "max")


@dataclass(frozen=True)
class FocalGridSpec(GridSpec):
    """A GridSpec whose halo is the focal window radius instead of the
    BAL scan reach -- shuffle volume scales with the radius asked for,
    not with the worst case."""
    radius: int = 1

    @property
    def halo(self) -> int:          # noqa: D401 - property override
        return self.radius


def _winsum(a: np.ndarray, r: int) -> np.ndarray:
    """Sum over the (2r+1)^2 window around each pixel, clipped at array
    edges, via a zero-padded double cumsum (integral image)."""
    c = np.cumsum(np.cumsum(a, axis=0, dtype=np.float64), axis=1)
    c = np.pad(c, ((1, 0), (1, 0)))
    H, W = a.shape
    r0 = np.clip(np.arange(H) - r, 0, H)
    r1 = np.clip(np.arange(H) + r + 1, 0, H)
    c0 = np.clip(np.arange(W) - r, 0, W)
    c1 = np.clip(np.arange(W) + r + 1, 0, W)
    return (c[np.ix_(r1, c1)] - c[np.ix_(r0, c1)]
            - c[np.ix_(r1, c0)] + c[np.ix_(r0, c0)])


def _slide_extreme(a: np.ndarray, r: int, op, fill: float) -> np.ndarray:
    """Separable windowed min/max: shift-reduce along rows then columns
    ((4r+2) vectorized ops total); out-of-array cells contribute the
    identity ``fill``."""
    out = a
    for axis in (0, 1):
        pad = [(0, 0), (0, 0)]
        pad[axis] = (r, r)
        p = np.pad(out, pad, constant_values=fill)
        n = out.shape[axis]
        acc = None
        for s in range(2 * r + 1):
            sl = [slice(None), slice(None)]
            sl[axis] = slice(s, s + n)
            v = p[tuple(sl)]
            acc = v if acc is None else op(acc, v)
        out = acc
    return out


def focal_kernel(arr: np.ndarray, radius: int, stat: str,
                 nodata: float) -> np.ndarray:
    """Whole-array focal statistic (float32 out).  Nodata cells are
    excluded from every window; windows with no valid cell emit nodata.
    ``std`` is the population standard deviation (ddof=0)."""
    if stat not in STATS:
        raise ValueError(f"focal stat must be one of {STATS}, got {stat!r}")
    valid = arr != np.float32(nodata)
    n = _winsum(valid.astype(np.float64), radius)
    if stat in ("min", "max"):
        fill = np.inf if stat == "min" else -np.inf
        p = np.where(valid, arr.astype(np.float64), fill)
        out = _slide_extreme(p, radius, np.minimum if stat == "min"
                             else np.maximum, fill)
    elif stat == "count":
        out = n
    else:
        vals = np.where(valid, arr.astype(np.float64), 0.0)
        s = _winsum(vals, radius)
        if stat == "sum":
            out = s
        else:
            with np.errstate(invalid="ignore", divide="ignore"):
                m = s / n
            if stat == "mean":
                out = m
            else:                                   # std
                s2 = _winsum(vals * vals, radius)
                with np.errstate(invalid="ignore", divide="ignore"):
                    out = np.sqrt(np.maximum(s2 / n - m * m, 0.0))
    out = out.astype(np.float32)
    out[n == 0] = np.float32(nodata)
    return out


def windowed_stage(ds, spec: GridSpec, *, layer: str, radius: int,
                   out_layer: str, window_fn, fmt: str = "npz"):
    """The shared halo-window pipeline every neighborhood raster op rides
    (focal stats, proximity, hillshade): filter to ``layer``, fan edge
    strips sized to ``radius``, ONE ``groupby(cell_id)`` shuffle,
    assemble the (tile + radius) window, run
    ``window_fn(window, nodata) -> ndarray`` over it, crop the core tile
    and re-encode as an image-table row of ``out_layer``.

    The completeness gate mirrors the BAL pipeline: a cell only computes
    when every in-grid neighbour delivered its strip, so a partial input
    can never silently degrade a window to nodata padding."""
    if radius < 1:
        raise ValueError("radius must be >= 1")
    if radius >= spec.tile_px:
        raise ValueError(
            f"radius {radius} >= tile_px {spec.tile_px}: strips would need "
            f"multi-hop neighbours (halo); re-tile coarser or lower the "
            f"radius")
    fspec = FocalGridSpec(spec.tiles_x, spec.tiles_y, spec.tile_px,
                          spec.pixel_size, spec.y_north, radius=radius)
    T = fspec.tile_px

    def keep_layer(b: pa.Table) -> pa.Table:
        import json

        caps = b.column("caption").to_pylist()
        keep = [i for i, c in enumerate(caps)
                if json.loads(c)["layer"] == layer]
        return b.take(pa.array(keep, pa.int64()))

    emit = make_strip_emitter_batch(fspec)

    def compute(group: pa.Table) -> pa.Table:
        from ..tiles.codec import Caption, encode_tile, phash64
        from ..tiles.synth import TILES_SCHEMA

        g = group.to_pydict()
        cell = int(g["cell_id"][0])
        tx, ty = cell % fspec.tiles_x, cell // fspec.tiles_x
        neigh = sum(1 for dy in (-1, 0, 1) for dx in (-1, 0, 1)
                    if 0 <= tx + dx < fspec.tiles_x
                    and 0 <= ty + dy < fspec.tiles_y)
        window = (assemble_window(g, fspec, layer, tx, ty)
                  if g["layer"].count(layer) == neigh else None)
        if window is None:
            return pa.table({c: [] for c in TILES_SCHEMA.names},
                            schema=TILES_SCHEMA)
        ref = next(Caption.from_json(g["caption"][i])
                   for i in range(len(g["is_core"])) if g["is_core"][i])
        out_full = np.asarray(window_fn(window, float(ref.nodata)),
                              dtype=np.float32)
        r0, _, c0, _ = fspec.assembled_window(tx, ty)
        rs, cs = ty * T - r0, tx * T - c0
        core = np.ascontiguousarray(out_full[rs:rs + T, cs:cs + T])
        ocap = Caption(layer=out_layer, x0=ref.x0, y0=ref.y0,
                       pixel_size=ref.pixel_size, crs=ref.crs,
                       nodata=ref.nodata, edge=dict(ref.edge),
                       tx=ref.tx, ty=ref.ty)
        payload, ocap = encode_tile(core, fmt, ocap)
        h, w = core.shape
        return pa.table({
            "image_id": pa.array([f"{out_layer}/{tx}/{ty}"], pa.string()),
            "bytes": pa.array([payload], pa.binary()),
            "w": pa.array([w], pa.int32()),
            "h": pa.array([h], pa.int32()),
            "fmt": pa.array([fmt], pa.string()),
            "caption": pa.array([ocap.to_json()], pa.string()),
            "phash": pa.array([phash64(core)], pa.int64())},
            schema=TILES_SCHEMA)

    return (ds.map_batches(keep_layer, batch_format="pyarrow")
            .map_batches(emit, batch_format="pyarrow")
            .groupby("cell_id")
            .map_groups(compute, batch_format="pyarrow"))


def focal_stats(ds, spec: GridSpec, *, layer: str = "dem",
                stat: str = "mean", radius: int = 3, fmt: str = "npz"):
    """Image-table Dataset -> image-table Dataset of per-tile focal-stat
    tiles (layer ``focal_<stat>``), exact parity with a whole-raster run.
    One keyed shuffle; per-cell work is O(tile) integral-image math."""
    if stat not in STATS:
        raise ValueError(f"focal stat must be one of {STATS}, got {stat!r}")

    def fn(window: np.ndarray, nodata: float) -> np.ndarray:
        return focal_kernel(window, radius, stat, nodata)

    return windowed_stage(ds, spec, layer=layer, radius=radius,
                          out_layer=f"focal_{stat}", window_fn=fn, fmt=fmt)
