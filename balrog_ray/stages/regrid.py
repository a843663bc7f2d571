"""Grid alignment: resample a tile layer from its own grid onto a target
GridSpec (nearest neighbour).

The reference re-projects/resamples the vegetation raster onto the DEM grid
before classification (``/root/reference/bal.py:55-57`` -- arcpy
``ProjectRaster`` with NEAREST resampling); without it the engine can only
ingest vegetation born on the DEM grid.  Ray-Data shape: one ``flat_map``
(as a batched ``map_batches``) splits every source tile into per-target-tile
patches sampled at the target pixel centers, then one ``groupby(cell_id)``
assembles complete target tiles -- the same emit/assemble pattern as the
halo exchange, keyed by the *target* grid.

Nearest-neighbour rule: target pixel center (x, y) reads source pixel
``col = floor((x - x0_src) / ps_src)``, ``row = floor((y0_src - y) / ps_src)``
-- the arcpy NEAREST convention.  Source tiles partition the world, so each
target center maps into exactly one source tile: patches never overlap and
their union is exact.  Target pixels with no source coverage become nodata.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from ..tiles.codec import Caption, decode_tile, encode_tile, phash64
from ..tiles.synth import TILES_SCHEMA
from .halo import GridSpec

NODATA = -99.0

_PATCH_SCHEMA = pa.schema([
    ("cell_id", pa.int64()),
    ("row0", pa.int32()), ("col0", pa.int32()),   # global target px
    ("h", pa.int32()), ("w", pa.int32()),
    ("payload", pa.binary()),                     # raw deflated float32
])


def _target_index_range(lo: float, hi: float, ps: float) -> tuple[int, int]:
    """[first, last] target pixel indices whose centers fall in [lo, hi)."""
    first = int(np.ceil(lo / ps - 0.5))
    last = int(np.floor((hi - 1e-9) / ps - 0.5))
    return first, last


def target_pixel_span(spec: GridSpec, sx0: float, sy0: float,
                      sh: int, sw: int, ps_s: float):
    """Clipped [r_first, r_last] x [c_first, c_last] target pixel span
    whose centers fall inside a source tile (top-left ``(sx0, sy0)``,
    shape ``(sh, sw)``, pixel ``ps_s``).  THE single source of truth for
    'which target pixels does a source tile cover' -- the patch emitter
    and the pipeline's completeness gate must agree exactly, or partial
    coverage turns into silently dropped cells.  Empty when
    first > last."""
    T, ps_t = spec.tile_px, spec.pixel_size
    c_first, c_last = _target_index_range(sx0, sx0 + sw * ps_s, ps_t)
    r_first = int(np.ceil((spec.y_north - sy0) / ps_t - 0.5))
    r_last = int(np.floor(
        (spec.y_north - (sy0 - sh * ps_s) - 1e-9) / ps_t - 0.5))
    c_first, r_first = max(c_first, 0), max(r_first, 0)
    c_last = min(c_last, spec.tiles_x * T - 1)
    r_last = min(r_last, spec.tiles_y * T - 1)
    return r_first, r_last, c_first, c_last


def covered_target_cells(spec: GridSpec, tiles_ds) -> np.ndarray:
    """Target cells receiving >= 1 resampled pixel from ``tiles_ds`` --
    computed from the ACTUAL source tile captions (a hole in a
    non-rectangular mosaic counts as uncovered, a hull bbox would not),
    with :func:`target_pixel_span`'s exact pixel-center rule.  One
    column-pruned metadata pass; result bounded by the grid cell count."""
    import pyarrow as _pa

    T = spec.tile_px

    def cover(b: _pa.Table) -> _pa.Table:
        cells: set[int] = set()
        for cap_json, h, w in zip(b.column("caption").to_pylist(),
                                  b.column("h").to_pylist(),
                                  b.column("w").to_pylist()):
            cap = Caption.from_json(cap_json)
            r0, r1, c0, c1 = target_pixel_span(
                spec, cap.x0, cap.y0, int(h), int(w), cap.pixel_size)
            if r0 > r1 or c0 > c1:
                continue
            for ty in range(r0 // T, r1 // T + 1):
                for tx in range(c0 // T, c1 // T + 1):
                    cells.add(int(spec.cell_id(tx, ty)))
        return _pa.table({"cell_id": _pa.array(sorted(cells),
                                               _pa.int64())})

    # Driver pull is metadata-scale by construction: the RESULT is
    # <= grid cell count (8 B/cell; ~80 MB at a 10^7-tile world) and
    # callers consume it as a driver-side mask, so that floor is
    # inherent.  What take_all() additionally multiplies is per-batch
    # DUPLICATION (each batch re-emits cells its tiles touch); past the
    # gate a distributed unique collapses duplicates remotely first so
    # the pull is exactly result-sized.
    cover_ds = (tiles_ds.select_columns(["caption", "h", "w"])
                .map_batches(cover, batch_format="pyarrow"))
    if spec.tiles_x * spec.tiles_y > 5_000_000:
        return np.unique(np.asarray(cover_ds.unique("cell_id"),
                                    dtype=np.int64))
    parts = cover_ds.take_all()
    return np.unique(np.array([r["cell_id"] for r in parts],
                              dtype=np.int64))


def make_patch_emitter(spec: GridSpec):
    """Source tile rows -> nearest-neighbour patches keyed by target cell."""
    T, ps_t = spec.tile_px, spec.pixel_size

    def fn(batch: pa.Table) -> pa.Table:
        cols = {n: [] for n in _PATCH_SCHEMA.names}
        for row in batch.to_pylist():
            cap = Caption.from_json(row["caption"])
            src = np.asarray(decode_tile(row["bytes"], row["fmt"], cap),
                             dtype=np.float32)
            sh, sw = src.shape
            ps_s = cap.pixel_size
            sx0, sy0 = cap.x0, cap.y0            # top-left corner
            # global target pixel span covered by this source tile
            # (shared with the completeness gate -- see target_pixel_span)
            r_first, r_last, c_first, c_last = target_pixel_span(
                spec, sx0, sy0, sh, sw, ps_s)
            if c_first > c_last or r_first > r_last:
                continue
            for ty in range(r_first // T, r_last // T + 1):
                for tx in range(c_first // T, c_last // T + 1):
                    pr0 = max(r_first, ty * T)
                    pr1 = min(r_last, ty * T + T - 1)
                    pc0 = max(c_first, tx * T)
                    pc1 = min(c_last, tx * T + T - 1)
                    xs = (np.arange(pc0, pc1 + 1) + 0.5) * ps_t
                    ys = spec.y_north - (np.arange(pr0, pr1 + 1) + 0.5) * ps_t
                    sc = np.floor((xs - sx0) / ps_s).astype(np.int64)
                    sr = np.floor((sy0 - ys) / ps_s).astype(np.int64)
                    sc = np.clip(sc, 0, sw - 1)
                    sr = np.clip(sr, 0, sh - 1)
                    patch = src[np.ix_(sr, sc)]
                    cols["cell_id"].append(spec.cell_id(tx, ty))
                    cols["row0"].append(pr0)
                    cols["col0"].append(pc0)
                    cols["h"].append(patch.shape[0])
                    cols["w"].append(patch.shape[1])
                    cols["payload"].append(zlib.compress(
                        np.ascontiguousarray(patch).tobytes(), 1))
        return pa.table(
            {n: pa.array(cols[n], _PATCH_SCHEMA.field(n).type)
             for n in _PATCH_SCHEMA.names}, schema=_PATCH_SCHEMA)

    return fn


def make_tile_assembler(spec: GridSpec, layer: str, fmt: str = "npy"):
    """Patch group (one target cell) -> one TILES_SCHEMA row."""
    T, ps = spec.tile_px, spec.pixel_size

    def fn(group: pa.Table) -> pa.Table:
        g = group.to_pydict()
        cell = int(g["cell_id"][0])
        tx, ty = cell % spec.tiles_x, cell // spec.tiles_x
        canvas = np.full((T, T), NODATA, dtype=np.float32)
        for i in range(len(g["payload"])):
            patch = np.frombuffer(
                zlib.decompress(g["payload"][i]),
                dtype=np.float32).reshape(int(g["h"][i]), int(g["w"][i]))
            rr = int(g["row0"][i]) - ty * T
            cc = int(g["col0"][i]) - tx * T
            canvas[rr:rr + patch.shape[0], cc:cc + patch.shape[1]] = patch
        cap = Caption(layer=layer, x0=tx * T * ps,
                      y0=spec.y_north - ty * T * ps, pixel_size=ps,
                      edge={"n": ty == 0, "s": ty == spec.tiles_y - 1,
                            "w": tx == 0, "e": tx == spec.tiles_x - 1},
                      tx=tx, ty=ty)
        payload, cap = encode_tile(canvas, fmt, cap)
        return pa.table({
            "image_id": [f"{layer}/{tx}/{ty}"],
            "bytes": [payload], "w": [np.int32(T)], "h": [np.int32(T)],
            "fmt": [fmt], "caption": [cap.to_json()],
            "phash": [np.int64(phash64(canvas))]}, schema=TILES_SCHEMA)

    return fn


def regrid_to_grid(tiles_ds, spec: GridSpec, layer: str = "veg",
                   fmt: str = "npy"):
    """Resample a tile Dataset (any source grid) onto ``spec``.

    Returns a TILES_SCHEMA Dataset on the target grid whose ``layer`` is
    relabelled to ``layer`` -- union it with the DEM tile table and feed
    ``bal_pipeline``.  One emit pass + one keyed shuffle; patches carry
    only the resampled pixels (<= one target tile each), so shuffle volume
    is O(target raster), independent of the source/target grid ratio.
    """
    return (tiles_ds
            .map_batches(make_patch_emitter(spec), batch_format="pyarrow")
            .groupby("cell_id")
            .map_groups(make_tile_assembler(spec, layer, fmt),
                        batch_format="pyarrow"))
