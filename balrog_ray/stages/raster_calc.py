"""Generic map algebra: a user-supplied pointwise expression over
co-registered raster layers -- the ArcGIS Raster-Calculator surface
(the reference's toolbox lives inside exactly this ecosystem; its
closest concrete uses are the slope-in-aspect select at
calculate_bal.py:119-142 and the elementwise max at :104-116, both
special cases of this op).  This is the engine's pluggable
user-extension point for raster math (SURVEY §2.3).

Shape: tiles of all requested layers co-key by (tx, ty) and meet in ONE
``groupby(cell).map_groups`` shuffle (pointwise algebra needs no halo);
the user function receives ``{layer: float32 ndarray}`` plus the nodata
sentinel and returns one ndarray.  Cells missing any requested layer are
dropped (the find_common_area intersection semantics, bal.py:146-199).
Nodata handling is the user fn's contract -- ``apply_masked`` wraps a
plain formula so nodata in ANY input propagates to the output, matching
the reference's -99 discipline.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def apply_masked(fn):
    """Lift a plain array formula into one that propagates nodata: cells
    where ANY input layer is nodata come out nodata.  The sentinel is the
    RUNTIME ``nd`` the engine reads from the tiles' captions -- never a
    wrap-time constant, which would silently mis-mask layers carrying a
    different sentinel."""
    def wrapped(layers: dict, nd: float) -> np.ndarray:
        bad = None
        for a in layers.values():
            m = a == np.float32(nd)
            bad = m if bad is None else (bad | m)
        out = np.asarray(fn(layers, nd), dtype=np.float32)
        out[bad] = np.float32(nd)
        return out
    return wrapped


def raster_calc(ds, layers: list[str], fn, *, out_layer: str,
                fmt: str = "npz"):
    """Image-table Dataset (mixed layers) -> image-table Dataset of
    ``out_layer`` tiles, one per cell where every requested layer exists.

    ``fn(layers: dict[str, ndarray], nodata: float) -> ndarray`` runs
    per tile; wrap it with :func:`apply_masked` unless it handles the
    sentinel itself."""
    want = set(layers)

    def keyed(b: pa.Table) -> pa.Table:
        import json

        caps = b.column("caption").to_pylist()
        keep, cells = [], []
        for i, c in enumerate(caps):
            d = json.loads(c)
            if d["layer"] in want:
                keep.append(i)
                cells.append((int(d["tx"]) << 32) | int(d["ty"]))
        t = b.take(pa.array(keep, pa.int64()))
        return t.append_column("__cell", pa.array(cells, pa.int64()))

    def calc(group: pa.Table) -> pa.Table:
        from ..tiles.codec import Caption, decode_tile, encode_tile, phash64

        caps = [Caption.from_json(s)
                for s in group.column("caption").to_pylist()]
        by_layer = {}
        for i, cap in enumerate(caps):
            by_layer[cap.layer] = (i, cap)
        empty = pa.table({c: pa.array([], group.schema.field(c).type)
                          for c in group.column_names
                          if c != "__cell"})
        if set(by_layer) != want:
            return empty              # find_common_area intersection
        arrays = {}
        for layer, (i, cap) in by_layer.items():
            arrays[layer] = decode_tile(
                group.column("bytes")[i].as_py(), group.column("fmt")[i]
                .as_py(), cap)
        ref = by_layer[layers[0]][1]
        nodata = float(ref.nodata)
        out = np.asarray(fn(arrays, nodata), dtype=np.float32)
        if out.shape != next(iter(arrays.values())).shape:
            raise ValueError(
                f"raster_calc fn returned shape {out.shape}, input is "
                f"{next(iter(arrays.values())).shape}")
        ocap = Caption(layer=out_layer, x0=ref.x0, y0=ref.y0,
                       pixel_size=ref.pixel_size, crs=ref.crs,
                       nodata=ref.nodata, edge=dict(ref.edge),
                       tx=ref.tx, ty=ref.ty)
        payload, ocap = encode_tile(out, fmt, ocap)
        h, w = out.shape
        return pa.table({
            "image_id": pa.array([f"{out_layer}/{ref.tx}/{ref.ty}"],
                                 pa.string()),
            "bytes": pa.array([payload], pa.binary()),
            "w": pa.array([w], pa.int32()),
            "h": pa.array([h], pa.int32()),
            "fmt": pa.array([fmt], pa.string()),
            "caption": pa.array([ocap.to_json()], pa.string()),
            "phash": pa.array([phash64(out)], pa.int64())})

    return (ds.map_batches(keyed, batch_format="pyarrow")
            .groupby("__cell")
            .map_groups(calc, batch_format="pyarrow"))
