"""Re-tiling (re-blocking) of an image table: change the tile size of a
tiled raster without touching pixel values -- the ``gdal_translate -co
BLOCKXSIZE/-co BLOCKYSIZE`` / ``gdal_retile.py`` role (the reference
retiles its mosaics once, serially, inside
``ga_5m/01_mosaic_and_transform_images_in_one_go.py``; here it is the
general block-layout primitive every downstream stage's halo economics
depend on -- e.g. ``viewshed``/``focal`` demand ``radius < tile_px`` and
tell the user to "re-tile coarser").

Shape: each source tile decodes once and emits at most
``(ceil(T_in/T_out)+1)^2`` rectangular patches keyed by the target cell
that owns them, then ONE ``groupby(layer, cell)`` assembles each target
tile from its own patches.  Shuffle volume = raster bytes exactly once
(patches are zlib-compressed float32, no overlap, no halo), so the
exchange is a straight re-bucketing at any raster size.  Target tiles
past the source extent are nodata-padded, identical to padding the
whole mosaic first.
"""

from __future__ import annotations

import io
import zlib

import numpy as np
import pyarrow as pa

from ..tiles.codec import Caption, decode_tile, encode_tile, phash64
from ..tiles.synth import TILES_SCHEMA
from .halo import GridSpec

_PATCH_SCHEMA = pa.schema([
    ("layer", pa.string()),
    ("cell", pa.int64()),
    ("r0", pa.int32()),          # placement row in the target tile
    ("c0", pa.int32()),
    ("patch", pa.binary()),      # zlib(np.save(float32 window))
    ("nodata", pa.float64()),
])


def retiled_spec(spec: GridSpec, out_tile_px: int) -> GridSpec:
    """Target grid: same origin / pixel size, ceil-covering tile count."""
    w_px = spec.tiles_x * spec.tile_px
    h_px = spec.tiles_y * spec.tile_px
    return GridSpec(tiles_x=-(-w_px // out_tile_px),
                    tiles_y=-(-h_px // out_tile_px),
                    tile_px=out_tile_px,
                    pixel_size=spec.pixel_size,
                    y_north=spec.y_north)


def retile(tiles_ds, spec: GridSpec, out_tile_px: int, *,
           fmt: str = "npz"):
    """Image-table Dataset -> re-blocked image-table Dataset on the
    ``retiled_spec`` grid; returns ``(Dataset, GridSpec)``."""
    if out_tile_px < 1:
        raise ValueError("out_tile_px must be positive")
    out = retiled_spec(spec, out_tile_px)
    T_in, T_out = spec.tile_px, out_tile_px

    def emit(b: pa.Table) -> pa.Table:
        cols = {n: [] for n in _PATCH_SCHEMA.names}
        for i in range(b.num_rows):
            cap = Caption.from_json(b.column("caption")[i].as_py())
            arr = decode_tile(b.column("bytes")[i].as_py(),
                              b.column("fmt")[i].as_py(), cap
                              ).astype(np.float32)
            py0, px0 = cap.ty * T_in, cap.tx * T_in   # global px origin
            ty0, ty1 = py0 // T_out, (py0 + T_in - 1) // T_out
            tx0, tx1 = px0 // T_out, (px0 + T_in - 1) // T_out
            for ty in range(ty0, ty1 + 1):
                rs = max(py0, ty * T_out)
                re_ = min(py0 + T_in, (ty + 1) * T_out)
                for tx in range(tx0, tx1 + 1):
                    cs = max(px0, tx * T_out)
                    ce = min(px0 + T_in, (tx + 1) * T_out)
                    win = arr[rs - py0:re_ - py0, cs - px0:ce - px0]
                    buf = io.BytesIO()
                    np.save(buf, win)
                    cols["layer"].append(cap.layer)
                    cols["cell"].append(ty * out.tiles_x + tx)
                    cols["r0"].append(rs - ty * T_out)
                    cols["c0"].append(cs - tx * T_out)
                    cols["patch"].append(zlib.compress(buf.getvalue(), 1))
                    cols["nodata"].append(float(cap.nodata))
        return pa.table(cols, schema=_PATCH_SCHEMA)

    def paint(group: pa.Table) -> pa.Table:
        g = group.to_pydict()
        layer = g["layer"][0]
        cell = int(g["cell"][0])
        tx, ty = cell % out.tiles_x, cell // out.tiles_x
        nodata = float(g["nodata"][0])
        canvas = np.full((T_out, T_out), np.float32(nodata), np.float32)
        for r0, c0, blob in zip(g["r0"], g["c0"], g["patch"]):
            win = np.load(io.BytesIO(zlib.decompress(blob)))
            canvas[r0:r0 + win.shape[0], c0:c0 + win.shape[1]] = win
        ps = out.pixel_size
        cap = Caption(layer=layer, x0=tx * T_out * ps,
                      y0=out.y_north - ty * T_out * ps, pixel_size=ps,
                      nodata=nodata,
                      edge={"n": ty == 0, "s": ty == out.tiles_y - 1,
                            "w": tx == 0, "e": tx == out.tiles_x - 1},
                      tx=tx, ty=ty)
        payload, cap = encode_tile(canvas, fmt, cap)
        return pa.table({
            "image_id": [f"{layer}/{tx}/{ty}"],
            "bytes": [payload],
            "w": [np.int32(T_out)], "h": [np.int32(T_out)],
            "fmt": [fmt], "caption": [cap.to_json()],
            "phash": [np.int64(phash64(canvas))]}, schema=TILES_SCHEMA)

    res = (tiles_ds.map_batches(emit, batch_format="pyarrow")
           .groupby(["layer", "cell"])
           .map_groups(paint, batch_format="pyarrow"))
    return res, out
