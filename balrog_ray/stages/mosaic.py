"""Feathered mosaic blend of overlapping grid-aligned acquisitions.

The reference mosaics per-capture-area rasters into one national table
(``/root/reference/data_prep/images/ga_5m/01_mosaic_and_transform_images_
in_one_go.py`` -- ``gdal.Warp`` over the tile list, last-valid-wins) and
its ``temporal`` composites already cover the last/first/median mosaic
rules.  This stage adds the production seamline alternative: FEATHERED
blending, where overlap zones cross-fade instead of hard-cutting, the
``gdal_merge``-with-alpha / satellite-mosaic-seamline role.

Per pixel::

    w_s  = clip(dist_to_footprint_edge_px(s), 0, feather_px)   (0 if nodata)
    out  = sum_s w_s * v_s / sum_s w_s        (nodata where sum_s w_s == 0)

so deep inside an acquisition its weight saturates at ``feather_px`` and
decays linearly to the footprint edge -- the standard distance-feather.

Ray-Data shape: acquisition footprints are a TINY metadata aggregate
(groupby(source) min/max over caption extents -- bytes per source, never
pixels), broadcast into the blend closure; then ONE ``groupby(cell)``
exchange ships each encoded tile straight to the task that decodes it
(the BAL pipeline's keying).  Weights derive from footprint geometry
alone, so nothing but the input payloads moves.  Per-group memory is
``n_overlapping_sources x tile_px^2`` floats.

Determinism: the per-pixel fold runs in float64 in source-id order
(groups are re-sorted after the shuffle), so a tiled run is bit-identical
to a whole-raster fold in the same order -- the parity tests rely on it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..tiles.codec import Caption, decode_tile, encode_tile, phash64
from ..tiles.synth import TILES_SCHEMA
from .halo import GridSpec


def acquisition_footprints(tiles_ds) -> dict[int, tuple]:
    """source id -> (xmin, ymin, xmax, ymax) world-coordinate rect from
    the tile captions.  Per-batch partials then a source-keyed groupby:
    the collected table is #sources rows -- metadata, not pixels."""
    import ray.data.aggregate as agg

    def extents(b: pa.Table) -> pa.Table:
        xmin, ymin, xmax, ymax = [], [], [], []
        for cap_json, w, h in zip(b.column("caption").to_pylist(),
                                  b.column("w").to_pylist(),
                                  b.column("h").to_pylist()):
            cap = Caption.from_json(cap_json)
            xmin.append(cap.x0)
            xmax.append(cap.x0 + w * cap.pixel_size)
            ymax.append(cap.y0)
            ymin.append(cap.y0 - h * cap.pixel_size)
        return pa.table({"source": b.column("source"),
                         "xmin": pa.array(xmin, pa.float64()),
                         "ymin": pa.array(ymin, pa.float64()),
                         "xmax": pa.array(xmax, pa.float64()),
                         "ymax": pa.array(ymax, pa.float64())})

    rows = (tiles_ds.map_batches(extents, batch_format="pyarrow")
            .groupby("source")
            .aggregate(agg.Min("xmin", alias_name="xmin"),
                       agg.Min("ymin", alias_name="ymin"),
                       agg.Max("xmax", alias_name="xmax"),
                       agg.Max("ymax", alias_name="ymax"))
            .take_all())
    return {int(r["source"]): (float(r["xmin"]), float(r["ymin"]),
                               float(r["xmax"]), float(r["ymax"]))
            for r in rows}


def weight_plane(x0: float, y0: float, ps: float, h: int, w: int,
                 footprint: tuple, feather_px: float) -> np.ndarray:
    """Float64 feather weights for a tile window: per pixel CENTER, the
    distance (in pixels) to the nearest footprint edge, clipped to
    [0, feather_px].  The single source of truth for the weight rule --
    the whole-raster oracle calls it too, so tiled-vs-whole parity is
    about the fold, not the geometry."""
    xmin, ymin, xmax, ymax = footprint
    xs = x0 + (np.arange(w, dtype=np.float64) + 0.5) * ps
    ys = y0 - (np.arange(h, dtype=np.float64) + 0.5) * ps
    dx = np.minimum(xs - xmin, xmax - xs) / ps
    dy = np.minimum(ys - ymin, ymax - ys) / ps
    d = np.minimum(dy[:, None], dx[None, :])
    return np.clip(d, 0.0, float(feather_px))


def feather_blend(tiles_ds, spec: GridSpec, *, feather_px: float = 32.0,
                  fmt: str = "npz", footprints: dict | None = None,
                  layer_out: str = "blend"):
    """Blend overlapping acquisitions (tile table + ``source`` int64
    column, all grid-aligned to ``spec``) into one feathered mosaic tile
    per cell, ``TILES_SCHEMA`` out.  ``footprints`` overrides the
    metadata-derived rects (e.g. when an acquisition's nominal extent
    exceeds its delivered tiles)."""
    if footprints is None:
        footprints = acquisition_footprints(tiles_ds)
    fps = dict(sorted(footprints.items()))

    def key(batch: pa.Table) -> pa.Table:
        caps = [Caption.from_json(c)
                for c in batch.column("caption").to_pylist()]
        cell = pa.array([c.ty * spec.tiles_x + c.tx for c in caps],
                        pa.int64())
        return batch.append_column("cell", cell)

    def blend(group: pa.Table) -> pa.Table:
        g = group.to_pydict()
        order = np.argsort(np.asarray(g["source"]), kind="stable")
        cap0 = Caption.from_json(g["caption"][order[0]])
        nodata = cap0.nodata
        num = np.zeros((g["h"][order[0]], g["w"][order[0]]), np.float64)
        den = np.zeros_like(num)
        for i in order:
            cap = Caption.from_json(g["caption"][i])
            arr = decode_tile(g["bytes"][i], g["fmt"][i], cap)
            wgt = weight_plane(cap.x0, cap.y0, cap.pixel_size,
                               arr.shape[0], arr.shape[1],
                               fps[int(g["source"][i])], feather_px)
            wgt = np.where(arr != np.float32(cap.nodata), wgt, 0.0)
            num += wgt * arr.astype(np.float64)
            den += wgt
        out = np.where(den > 0.0, (num / np.where(den > 0.0, den, 1.0))
                       .astype(np.float32), np.float32(nodata))
        cap = Caption(layer=layer_out, x0=cap0.x0, y0=cap0.y0,
                      pixel_size=cap0.pixel_size, crs=cap0.crs,
                      nodata=nodata, edge=cap0.edge, tx=cap0.tx,
                      ty=cap0.ty)
        payload, cap = encode_tile(out, fmt, cap)
        return pa.table({
            "image_id": [f"{layer_out}/{cap0.tx}/{cap0.ty}"],
            "bytes": [payload],
            "w": [np.int32(out.shape[1])], "h": [np.int32(out.shape[0])],
            "fmt": [fmt], "caption": [cap.to_json()],
            "phash": [np.int64(phash64(out))],
        }, schema=TILES_SCHEMA)

    return (tiles_ds.map_batches(key, batch_format="pyarrow")
            .groupby("cell")
            .map_groups(blend, batch_format="pyarrow"))
