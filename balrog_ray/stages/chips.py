"""Training-chip extraction: cut every tile into fixed-size patches with
a stride -- the patch-sampling stage a vision-training pipeline runs over
an image table (and the tile-granularity analogue of the reference's
window clip, ``sa_tools.py:20-45``, applied many-per-tile).

A ``flat_map``-shaped ``map_batches`` (1 tile row in -> K chip rows out):
decode once, slice views (no copies until encode), re-encode each chip
with a correctly shifted caption so every chip is itself a valid,
self-describing image-table row (chips compose with every downstream
stage: phash dedup, quarantine, pyramid, BAL-on-chips).

Chips are cut within tiles (``chip_px + k*stride <= tile_px``); a
cross-tile chip grid would ride the halo exchange instead -- out of scope
here because training chips never need seam-exact continuity the way the
convo kernel does.  Chips whose pixels are ALL nodata are dropped
(configurable): at corpus scale the empty-ocean chips are most of the
data and carry zero training signal.

Grid composability: when ``stride == chip_px`` and the tile size divides
evenly, chip ``tx/ty`` are recomputed on the CHIP grid, so the output
table satisfies the caption grid invariant (unique (tx, ty); ``y0 ==
y_north - ty*chip_px*ps``) and composes with the pyramid / zonal / BAL
stages.  Overlapping chips (``stride < chip_px``) are not a grid -- they
keep the parent's tx/ty and are for training sampling only.  A tile
smaller than ``chip_px`` raises (a silent zero-chip drop would violate
the every-row-accounted-for rule the quarantine stage exists to enforce;
trailing strips narrower than ``chip_px`` are ordinary stride semantics
and are intentionally not emitted).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def extract_chips(ds, *, chip_px: int, stride: int | None = None,
                  fmt: str = "npz", drop_empty: bool = True):
    """Image-table Dataset -> image-table Dataset of chips.

    Output rows keep the input schema (image_id, bytes, w, h, fmt,
    caption, phash); ``image_id`` becomes ``{parent}#r{row}c{col}`` and
    captions carry the chip's own georeferencing.
    """
    if stride is None:
        stride = chip_px
    if chip_px <= 0 or stride <= 0:
        raise ValueError("chip_px and stride must be positive")

    def chips(batch: pa.Table) -> pa.Table:
        from ..tiles.codec import Caption, decode_tile, encode_tile, phash64

        out = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt",
                               "caption", "phash")}
        ids = batch.column("image_id").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        caps = batch.column("caption").to_pylist()
        payloads = batch.column("bytes").to_pylist()
        for i in range(batch.num_rows):
            cap = Caption.from_json(caps[i])
            arr = decode_tile(payloads[i], fmts[i], cap)
            h, w = arr.shape
            if h < chip_px or w < chip_px:
                raise ValueError(
                    f"tile {ids[i]} is {h}x{w} px, smaller than "
                    f"chip_px={chip_px}; quarantine or filter undersized "
                    "tiles before chipping")
            gridded = (stride == chip_px
                       and h % chip_px == 0 and w % chip_px == 0)
            nodata = np.float32(cap.nodata)
            for r0 in range(0, h - chip_px + 1, stride):
                for c0 in range(0, w - chip_px + 1, stride):
                    win = arr[r0:r0 + chip_px, c0:c0 + chip_px]
                    if drop_empty and bool((win == nodata).all()):
                        continue
                    ccap = Caption(
                        layer=cap.layer,
                        x0=cap.x0 + c0 * cap.pixel_size,
                        y0=cap.y0 - r0 * cap.pixel_size,
                        pixel_size=cap.pixel_size, crs=cap.crs,
                        nodata=cap.nodata,
                        # a chip edge is a TRUE raster boundary only when
                        # it coincides with a parent-tile true boundary
                        edge={"n": cap.edge["n"] and r0 == 0,
                              "s": cap.edge["s"] and r0 + chip_px == h,
                              "w": cap.edge["w"] and c0 == 0,
                              "e": cap.edge["e"] and c0 + chip_px == w},
                        tx=(cap.tx * (w // chip_px) + c0 // chip_px
                            if gridded else cap.tx),
                        ty=(cap.ty * (h // chip_px) + r0 // chip_px
                            if gridded else cap.ty))
                    payload, ccap = encode_tile(win, fmt, ccap)
                    out["image_id"].append(f"{ids[i]}#r{r0}c{c0}")
                    out["bytes"].append(payload)
                    out["w"].append(chip_px)
                    out["h"].append(chip_px)
                    out["fmt"].append(fmt)
                    out["caption"].append(ccap.to_json())
                    out["phash"].append(phash64(win))
        return pa.table({
            "image_id": pa.array(out["image_id"], pa.string()),
            "bytes": pa.array(out["bytes"], pa.binary()),
            "w": pa.array(out["w"], pa.int32()),
            "h": pa.array(out["h"], pa.int32()),
            "fmt": pa.array(out["fmt"], pa.string()),
            "caption": pa.array(out["caption"], pa.string()),
            "phash": pa.array(out["phash"], pa.int64())})

    return ds.map_batches(chips, batch_format="pyarrow", batch_size=16)
