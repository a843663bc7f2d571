"""Point-sample a tiled raster at site locations -- the raster-value
lookup that turns BAL band tiles into the reference's end product, a
per-address BAL rating (Gen-2's goal; the per-site window read at
``testing/02_get_slope_from_buffer.py:204-251`` is the same access
pattern with a 0 m buffer).

Scale shape: ONE co-keyed shuffle, no broadcast of the raster.  Sites
hash to the cell whose tile contains them; tiles of the requested layer
key by their own cell; ``groupby(cell)`` meets each tile with exactly
the sites that need it, and the per-group lookup is one decode plus a
vectorized integer gather.  Sites outside the grid (or on a missing /
nodata pixel) emit ``OUT_OF_AREA`` (-9999, the reference's outside-raster
sentinel, ``02_get_slope_from_buffer.py:266-273``) -- never dropped, so
row counts are conserved.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .halo import GridSpec

OUT_OF_AREA = -9999.0

_UNION_SCHEMA = pa.schema([
    ("cell_id", pa.int64()), ("side", pa.int8()),
    ("site_id", pa.string()), ("x", pa.float64()), ("y", pa.float64()),
    ("bytes", pa.binary()), ("fmt", pa.string()),
    ("caption", pa.string())])


def sample_raster(sites_ds, tiles_ds, spec: GridSpec, *, layer: str,
                  value_col: str = "value"):
    """``(site_id, x, y)`` Dataset x image-table Dataset ->
    ``(site_id, x, y, value_col)`` Dataset."""
    T, ps, y_north = spec.tile_px, spec.pixel_size, spec.y_north
    tiles_x, tiles_y = spec.tiles_x, spec.tiles_y

    def key_sites(b: pa.Table) -> pa.Table:
        xs = b.column("x").to_numpy()
        ys = b.column("y").to_numpy()
        tx = np.floor(xs / (T * ps)).astype(np.int64)
        ty = np.floor((y_north - ys) / (T * ps)).astype(np.int64)
        inside = (tx >= 0) & (tx < tiles_x) & (ty >= 0) & (ty < tiles_y)
        # out-of-grid sites key to cell -1: they meet no tile and emit
        # the sentinel from the group fn below
        cell = np.where(inside, ty * tiles_x + tx, -1)
        n = len(xs)
        return pa.table({
            "cell_id": pa.array(cell, pa.int64()),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "site_id": b.column("site_id"),
            "x": b.column("x"), "y": b.column("y"),
            "bytes": pa.nulls(n, pa.binary()),
            "fmt": pa.nulls(n, pa.string()),
            "caption": pa.nulls(n, pa.string())}, schema=_UNION_SCHEMA)

    def key_tiles(b: pa.Table) -> pa.Table:
        import json

        caps = b.column("caption").to_pylist()
        keep, cells = [], []
        for i, c in enumerate(caps):
            d = json.loads(c)
            if d["layer"] == layer:
                keep.append(i)
                cells.append(int(d["ty"]) * tiles_x + int(d["tx"]))
        t = b.take(pa.array(keep, pa.int64()))
        n = t.num_rows
        return pa.table({
            "cell_id": pa.array(cells, pa.int64()),
            "side": pa.array(np.ones(n, dtype=np.int8)),
            "site_id": pa.nulls(n, pa.string()),
            "x": pa.nulls(n, pa.float64()),
            "y": pa.nulls(n, pa.float64()),
            "bytes": t.column("bytes"), "fmt": t.column("fmt"),
            "caption": t.column("caption")}, schema=_UNION_SCHEMA)

    def lookup(group: pa.Table) -> pa.Table:
        from ..tiles.codec import Caption, decode_tile

        side = group.column("side").to_numpy()
        is_site = side == 0
        sites = group.filter(pa.array(is_site))
        if sites.num_rows == 0:
            return pa.table({"site_id": pa.array([], pa.string()),
                             "x": pa.array([], pa.float64()),
                             "y": pa.array([], pa.float64()),
                             value_col: pa.array([], pa.float64())})
        xs = sites.column("x").to_numpy()
        ys = sites.column("y").to_numpy()
        vals = np.full(len(xs), OUT_OF_AREA)
        tiles = group.filter(pa.array(~is_site))
        if tiles.num_rows:
            cap = Caption.from_json(tiles.column("caption")[0].as_py())
            arr = decode_tile(tiles.column("bytes")[0].as_py(),
                              tiles.column("fmt")[0].as_py(), cap)
            col = np.floor(xs / ps).astype(np.int64) - cap.tx * T
            row = np.floor((y_north - ys) / ps).astype(np.int64) \
                - cap.ty * T
            ok = (col >= 0) & (col < arr.shape[1]) \
                & (row >= 0) & (row < arr.shape[0])
            v = arr[row[ok], col[ok]].astype(np.float64)
            v[v == float(cap.nodata)] = OUT_OF_AREA
            vals[ok] = v
        return pa.table({"site_id": sites.column("site_id"),
                         "x": sites.column("x"), "y": sites.column("y"),
                         value_col: pa.array(vals, pa.float64())})

    both = (sites_ds.map_batches(key_sites, batch_format="pyarrow")
            .union(tiles_ds.map_batches(key_tiles,
                                        batch_format="pyarrow")))
    return (both.groupby("cell_id")
            .map_groups(lookup, batch_format="pyarrow"))
