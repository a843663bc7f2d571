"""Distributed attribute-burn rasterization (the ``gdal_rasterize -a``
role, and the inverse of :mod:`polygonize`): a polygon table
``(gid, <value>, geom WKB)`` painted onto a :class:`GridSpec` tile grid
by pixel-center test -- the same paint rule as the synthetic generator's
``veg_window`` (reference analogue: ``reclass_veg``'s
vector-to-raster step, ``bal.py:26-73``, done by arcpy on one machine).

Paint semantics (deterministic): a pixel whose CENTER lies inside a
polygon takes that polygon's value; overlaps resolve by gid order --
the HIGHEST gid wins (polygons are painted in ascending gid order,
later paints overwrite).  Pixels covered by no polygon are ``fill``.

Scale shape: one emit pass fans each polygon row to the tile cells its
bbox intersects (bbox-bounded replication, the spatial-join cell-cover
rule -- subdivide giant polygons upstream with
``geo.geometry.subdivide`` exactly as the partitioned join does), then
ONE ``groupby(cell_id)`` paints each tile from its own candidates.
Only covered cells emit rows (resume-friendly partitioned output)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geo.geometry import Polygon, rasterize
from ..geo.wkb import from_wkb
from .halo import GridSpec

NODATA = -99.0

_BURN_SCHEMA = pa.schema([
    ("cell_id", pa.int64()),
    ("gid", pa.int64()),
    ("val", pa.float64()),
    ("geom", pa.binary()),
])


def rasterize_polygons(polys_ds, spec: GridSpec, *,
                       value_col: str = "bal_number",
                       layer: str = "burn", fill: float = NODATA,
                       fmt: str = "npz"):
    """Polygon Dataset -> image-table Dataset of burned tiles."""
    T, ps = spec.tile_px, spec.pixel_size
    tiles_x, tiles_y = spec.tiles_x, spec.tiles_y
    cell_w = T * ps

    def emit(b: pa.Table) -> pa.Table:
        out = {n: [] for n in _BURN_SCHEMA.names}
        for gid, val, geom in zip(
                b.column("gid").to_pylist(),
                b.column(value_col).to_pylist(),
                b.column("geom").to_pylist()):
            obj = from_wkb(geom)
            parts = obj if isinstance(obj, list) else [obj]
            if not parts:
                continue
            bbs = np.array([p.bbox for p in parts])
            xmin, ymin = bbs[:, 0].min(), bbs[:, 1].min()
            xmax, ymax = bbs[:, 2].max(), bbs[:, 3].max()
            c0 = max(0, int(np.floor(xmin / cell_w)))
            c1 = min(tiles_x - 1, int(np.floor(xmax / cell_w)))
            r0 = max(0, int(np.floor((spec.y_north - ymax) / cell_w)))
            r1 = min(tiles_y - 1,
                     int(np.floor((spec.y_north - ymin) / cell_w)))
            for ty in range(r0, r1 + 1):
                for tx in range(c0, c1 + 1):
                    out["cell_id"].append(spec.cell_id(tx, ty))
                    out["gid"].append(int(gid))
                    out["val"].append(float(val))
                    out["geom"].append(geom)
        return pa.table(out, schema=_BURN_SCHEMA)

    def paint(group: pa.Table) -> pa.Table:
        from ..tiles.codec import Caption, encode_tile, phash64
        from ..tiles.synth import TILES_SCHEMA

        g = group.to_pydict()
        cell = int(g["cell_id"][0])
        tx, ty = cell % tiles_x, cell // tiles_x
        order = np.argsort(np.asarray(g["gid"], np.int64), kind="stable")
        polys: list[Polygon] = []
        vals: list[float] = []
        for i in order:
            obj = from_wkb(g["geom"][i])
            parts = obj if isinstance(obj, list) else [obj]
            polys.extend(parts)
            vals.extend([g["val"][i]] * len(parts))
        x0 = tx * cell_w
        y0 = spec.y_north - ty * cell_w
        arr = rasterize(polys, vals, x0, y0, ps, T, T,
                        fill=fill).astype(np.float32)
        cap = Caption(layer=layer, x0=x0, y0=y0, pixel_size=ps,
                      nodata=fill,
                      edge={"n": ty == 0, "s": ty == tiles_y - 1,
                            "w": tx == 0, "e": tx == tiles_x - 1},
                      tx=tx, ty=ty)
        payload, cap = encode_tile(arr, fmt, cap)
        return pa.table({
            "image_id": [f"{layer}/{tx}/{ty}"],
            "bytes": [payload], "w": [np.int32(T)], "h": [np.int32(T)],
            "fmt": [fmt], "caption": [cap.to_json()],
            "phash": [np.int64(phash64(arr))]}, schema=TILES_SCHEMA)

    return (polys_ds.map_batches(emit, batch_format="pyarrow")
            .groupby("cell_id")
            .map_groups(paint, batch_format="pyarrow"))
