"""Overview-pyramid builder: the reference's ``BuildPyramidsandStatistics``
(``calculate_bal.py:89-91``, SURVEY op 20) made a real multi-level operator
instead of a metrics side-table.

Level ``l+1`` tile ``(tx, ty)`` is the 2x downsample of the four level-``l``
tiles ``(2tx+i, 2ty+j)``.  Each level is ONE ``groupby(layer, parent_cell)``
shuffle whose volume is 1/4 of the previous level (all levels together move
under 1/3 of the base layer's bytes), and no task ever holds more than four
tiles -- the shape scales to any raster size.

Downsample kernels, both nodata-aware per 2x2 block:

* ``mean`` -- mean of the valid cells (continuous rasters: DEM, slope;
  GDAL's ``average`` overview resampler);
* ``mode`` -- majority class among valid cells, ties broken toward the
  smallest value so results are deterministic (categorical rasters: veg
  class, BAL bands; GDAL's ``mode`` resampler).

A block with no valid cell stays nodata, and parent tiles extending past an
odd-sized grid edge are nodata-padded -- identical to downsampling the
whole padded raster at once, which is exactly what the parity tests assert.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..tiles.codec import NODATA, Caption, decode_tile, encode_tile, phash64
from ..tiles.synth import TILES_SCHEMA
from .halo import GridSpec

#: default per-layer kernel: veg classes are categorical, everything else
#: (dem/slope/aspect/BAL numeric bands) downsamples by valid-cell mean.
DEFAULT_METHODS = {"veg": "mode"}


def downsample2x(arr: np.ndarray, nodata: float = NODATA,
                 method: str = "mean") -> np.ndarray:
    """Halve both dimensions of ``arr`` (even-sized) with a nodata-aware
    2x2 block kernel.  Fully vectorized; float32 out."""
    a = np.asarray(arr, dtype=np.float32)
    h, w = a.shape
    if h % 2 or w % 2:
        raise ValueError(f"downsample2x needs even dims, got {h}x{w}")
    nd = np.float32(nodata)
    blocks = (a.reshape(h // 2, 2, w // 2, 2)
               .transpose(0, 2, 1, 3).reshape(-1, 4))
    valid = blocks != nd
    if method == "mean":
        n = valid.sum(axis=1)
        s = np.where(valid, blocks, 0.0).sum(axis=1, dtype=np.float64)
        out = np.where(n > 0, (s / np.maximum(n, 1)).astype(np.float32), nd)
    elif method == "mode":
        # count, per candidate cell j, how many valid cells equal it;
        # invalid candidates count 0.  majority = max count; ties resolve
        # to the smallest candidate value (deterministic).
        eq = blocks[:, :, None] == blocks[:, None, :]
        cnt = (eq & valid[:, None, :] & valid[:, :, None]).sum(axis=2)
        maxc = cnt.max(axis=1)
        cand = (cnt == maxc[:, None]) & valid
        vals = np.where(cand, blocks, np.inf).min(axis=1)
        out = np.where(maxc > 0, vals, np.float64(nd)).astype(np.float32)
    else:
        raise ValueError(f"unknown downsample method {method!r}")
    return out.reshape(h // 2, w // 2)


def next_spec(spec: GridSpec) -> GridSpec:
    """Grid geometry of the next pyramid level: half the tiles (rounded
    up), double the pixel size, same tile size and north edge."""
    return GridSpec(tiles_x=-(-spec.tiles_x // 2),
                    tiles_y=-(-spec.tiles_y // 2),
                    tile_px=spec.tile_px,
                    pixel_size=spec.pixel_size * 2.0,
                    y_north=spec.y_north)


def _make_parent_fn(spec: GridSpec, level: int, methods, fmt: str):
    """Per-parent-cell group fn: decode <=4 children, downsample each into
    its quadrant of a nodata canvas, encode one parent tile."""
    up = next_spec(spec)
    T = spec.tile_px

    def fn(group: pa.Table) -> pa.Table:
        g = group.to_pydict()
        layer = g["layer"][0]
        method = methods.get(layer, "mean")
        cell = int(g["parent_cell"][0])
        ptx, pty = cell % up.tiles_x, cell // up.tiles_x
        nodata = Caption.from_json(g["caption"][0]).nodata
        canvas = np.full((T, T), np.float32(nodata), dtype=np.float32)
        for payload, f, cap_json in zip(g["bytes"], g["fmt"], g["caption"]):
            cap = Caption.from_json(cap_json)
            child = decode_tile(payload, f, cap)
            half = downsample2x(child, nodata, method)
            r0 = (cap.ty % 2) * (T // 2)
            c0 = (cap.tx % 2) * (T // 2)
            canvas[r0:r0 + T // 2, c0:c0 + T // 2] = half
        ps = up.pixel_size
        cap = Caption(layer=layer, x0=ptx * T * ps,
                      y0=up.y_north - pty * T * ps, pixel_size=ps,
                      nodata=nodata,
                      edge={"n": pty == 0, "s": pty == up.tiles_y - 1,
                            "w": ptx == 0, "e": ptx == up.tiles_x - 1},
                      tx=ptx, ty=pty)
        payload, cap = encode_tile(canvas, fmt, cap)
        return pa.table({
            "image_id": [f"{layer}/L{level}/{ptx}/{pty}"],
            "bytes": [payload], "w": [np.int32(T)], "h": [np.int32(T)],
            "fmt": [fmt], "caption": [cap.to_json()],
            "phash": [np.int64(phash64(canvas))],
        }, schema=TILES_SCHEMA)

    return fn


def pyramid_level(tiles_ds, spec: GridSpec, *, level: int = 1,
                  methods=None, fmt: str = "npz"):
    """One pyramid step: level ``level-1`` tile Dataset -> level ``level``
    tile Dataset (1/4 the tiles) plus its :class:`GridSpec`.

    The only exchange is ``groupby(layer, parent_cell)`` -- tile payloads
    ship once, straight to the task that consumes them."""
    if spec.tile_px % 2:
        raise ValueError("pyramid needs an even tile_px")
    methods = DEFAULT_METHODS if methods is None else methods
    up = next_spec(spec)

    def key(batch: pa.Table) -> pa.Table:
        caps = [Caption.from_json(c)
                for c in batch.column("caption").to_pylist()]
        layer = pa.array([c.layer for c in caps], pa.string())
        parent = pa.array(
            [(c.ty // 2) * up.tiles_x + (c.tx // 2) for c in caps],
            pa.int64())
        return (batch.append_column("layer", layer)
                     .append_column("parent_cell", parent))

    out = (tiles_ds
           .map_batches(key, batch_format="pyarrow")
           .groupby(["layer", "parent_cell"])
           .map_groups(_make_parent_fn(spec, level, methods, fmt),
                       batch_format="pyarrow"))
    return out, up


def build_overviews(tiles_ds, spec: GridSpec, levels: int, *,
                    methods=None, fmt: str = "npz"):
    """Build ``levels`` pyramid levels; returns
    ``[(level, GridSpec, Dataset), ...]`` for levels ``1..levels``.

    Each intermediate level is materialized because it feeds two consumers
    (the caller and the next level) -- re-deriving it would re-run every
    level below.  The held bytes shrink geometrically (level ``l`` is
    ``4^-l`` of the base), so the total pin is under 1/3 of the base
    layer, which the object store spills if needed."""
    out = []
    ds, sp = tiles_ds, spec
    for lv in range(1, levels + 1):
        ds, sp = pyramid_level(ds, sp, level=lv, methods=methods, fmt=fmt)
        if lv < levels and (sp.tiles_x > 1 or sp.tiles_y > 1):
            ds = ds.materialize()
        out.append((lv, sp, ds))
        if sp.tiles_x == 1 and sp.tiles_y == 1:
            break
    return out


def write_overviews(tiles_ds, spec: GridSpec, out_dir: str, levels: int,
                    *, methods=None, fmt: str = "npz"):
    """Build and persist a pyramid, one partition directory per level
    (``out_dir/level=<l>/``) so a failed run resumes per level."""
    built = build_overviews(tiles_ds, spec, levels, methods=methods,
                            fmt=fmt)
    for lv, _, ds in built:
        ds.write_parquet(f"{out_dir}/level={lv}")
    return [(lv, sp) for lv, sp, _ in built]
