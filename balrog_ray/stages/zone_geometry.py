"""Zonal geometry -- per-zone shape descriptors over a categorical
raster layer (ArcGIS Spatial Analyst ``ZonalGeometry`` / skimage
``regionprops`` role): area, perimeter, centroid, central second
moments, orientation, eccentricity and the isoperimetric compactness,
for every zone VALUE of a layer (e.g. the AS 3959 veg classes).

Exactness contract (distributed == whole-raster bit-exact):

* per-tile partials are INTEGER sums over global pixel coordinates --
  ``n, sum(x), sum(y), sum(x^2), sum(y^2), sum(x*y)`` as int64 (safe
  for worlds up to ~2^21 px per side: a 256-px tile's worst
  sum(x^2) is 256^2 * (2^21)^2 ~ 2.9e17 < 2^63; the stage raises
  loudly beyond that);
* the final per-zone fold runs in PYTHON INTS (arbitrary precision),
  so central moments are exact rationals evaluated as
  ``mu20 = (n * Sxx - Sx^2) / n^2`` etc. -- one float64 division at
  the very end, identical in any partial order;
* perimeter is the count of exposed 4-neighbour FACES (neighbour has a
  different value, is nodata, or is off-raster), each face counted by
  its owner pixel, so tile sums add exactly; cross-tile faces see the
  true neighbour via a radius-1 halo exchange (the shared strip plan);
* orientation = 0.5 * atan2(2 * mu11, mu20 - mu02) (radians, image
  row/col frame), eccentricity from the central-moment eigenvalues,
  compactness = 4 * pi * area / perimeter^2 -- all derived from the
  exact integers by one shared function, so the oracle and the
  distributed path cannot diverge.

Distributed shape: ONE radius-1 ``groupby(cell_id)`` halo exchange
(strips only) emitting O(zones-per-tile) tabular partial rows, then
ONE tiny ``groupby(zone)`` fold -- nothing pixel-sized leaves the
tiles, and the fold table is bounded by |zones| x |tiles|.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .focal import FocalGridSpec
from .halo import GridSpec, assemble_window, make_strip_emitter_batch

_PARTIAL_SCHEMA = pa.schema([
    ("zone", pa.float64()), ("n", pa.int64()),
    ("sx", pa.int64()), ("sy", pa.int64()),
    ("sxx", pa.int64()), ("syy", pa.int64()), ("sxy", pa.int64()),
    ("perim", pa.int64()),
])

RESULT_FIELDS = ("zone", "area_px", "perimeter_px", "centroid_x",
                 "centroid_y", "mu20", "mu02", "mu11", "orientation",
                 "eccentricity", "compactness")

_MAX_COORD = 1 << 21


def zone_partials(arr: np.ndarray, nodata: float, *, x0: int, y0: int,
                  core: tuple | None = None) -> dict:
    """Integer partial sums per zone value over ``arr`` whose top-left
    pixel sits at global (row y0, col x0).  ``core`` restricts the
    accounted pixels to a (rs, re, cs, ce) window while perimeter
    faces still see the full array (the halo)."""
    a = np.asarray(arr, np.float32)
    nd = np.float32(nodata)
    H, W = a.shape
    rs, re, cs, ce = core if core is not None else (0, H, 0, W)
    if y0 + re > _MAX_COORD or x0 + ce > _MAX_COORD:
        raise ValueError("world exceeds the 2^21-px coordinate bound "
                         "of the int64 moment partials")
    sub = a[rs:re, cs:ce]
    valid = sub != nd
    ys = (y0 + np.arange(rs, re, dtype=np.int64))[:, None]
    xs = (x0 + np.arange(cs, ce, dtype=np.int64))[None, :]
    ys = np.broadcast_to(ys, sub.shape)
    xs = np.broadcast_to(xs, sub.shape)

    # exposed 4-neighbour faces, owner = the core pixel
    exposed = np.zeros(sub.shape, np.int64)
    for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        nr0, nc0 = rs + dy, cs + dx
        nbr = np.full(sub.shape, nd, np.float32)
        r0, r1 = max(0, -nr0), min(re - rs, H - nr0)
        c0, c1 = max(0, -nc0), min(ce - cs, W - nc0)
        if r0 < r1 and c0 < c1:
            nbr[r0:r1, c0:c1] = a[nr0 + r0:nr0 + r1, nc0 + c0:nc0 + c1]
        exposed += (valid & (nbr != sub)).astype(np.int64)

    out: dict = {}
    for z in np.unique(sub[valid]):
        m = valid & (sub == z)
        x = xs[m]
        y = ys[m]
        out[float(z)] = (
            int(m.sum()), int(x.sum()), int(y.sum()),
            int((x * x).sum()), int((y * y).sum()),
            int((x * y).sum()), int(exposed[m].sum()))
    return out


def derive_descriptors(zone: float, n: int, sx: int, sy: int, sxx: int,
                       syy: int, sxy: int, perim: int) -> dict:
    """Shape descriptors from exact integer sums -- shared by the
    distributed fold and the whole-raster oracle so they cannot
    diverge.  Central moments are exact rationals
    ``(n * Sab - Sa * Sb) / n^2`` evaluated with one float64 division
    each."""
    n2 = n * n
    mu20 = (n * sxx - sx * sx) / n2
    mu02 = (n * syy - sy * sy) / n2
    mu11 = (n * sxy - sx * sy) / n2
    # eigenvalues of [[mu20, mu11], [mu11, mu02]]
    tr = mu20 + mu02
    det = math.sqrt(max(0.0, (mu20 - mu02) ** 2 + 4.0 * mu11 * mu11))
    lam1 = (tr + det) / 2.0
    lam2 = (tr - det) / 2.0
    ecc = math.sqrt(1.0 - lam2 / lam1) if lam1 > 0 else 0.0
    return {
        "zone": float(zone), "area_px": n, "perimeter_px": perim,
        "centroid_x": sx / n, "centroid_y": sy / n,
        "mu20": mu20, "mu02": mu02, "mu11": mu11,
        "orientation": 0.5 * math.atan2(2.0 * mu11, mu20 - mu02),
        "eccentricity": ecc,
        "compactness": (4.0 * math.pi * n / (perim * perim)
                        if perim else 0.0),
    }


def zone_geometry_whole(arr: np.ndarray, nodata: float) -> pa.Table:
    """Whole-raster oracle: one partial pass over the full array."""
    parts = zone_partials(arr, nodata, x0=0, y0=0)
    rows = [derive_descriptors(z, *v)
            for z, v in sorted(parts.items())]
    return pa.table({f: pa.array([r[f] for r in rows])
                     for f in RESULT_FIELDS})


def zone_geometry(tiles_ds, spec: GridSpec, *, layer: str = "veg",
                  num_fold_partitions: int | None = None) -> "object":
    """Image-table Dataset -> per-zone shape-descriptor table (one row
    per zone value, sorted).  One radius-1 halo exchange + one tiny
    zone fold."""
    import json

    fspec = FocalGridSpec(spec.tiles_x, spec.tiles_y, spec.tile_px,
                          spec.pixel_size, spec.y_north, radius=1)
    T = fspec.tile_px

    def keep_layer(b: pa.Table) -> pa.Table:
        keep = [i for i, c in enumerate(b.column("caption").to_pylist())
                if json.loads(c)["layer"] == layer]
        return b.take(pa.array(keep, pa.int64()))

    emit = make_strip_emitter_batch(fspec)

    def partials(group: pa.Table) -> pa.Table:
        g = group.to_pydict()
        cell = int(g["cell_id"][0])
        tx, ty = cell % fspec.tiles_x, cell // fspec.tiles_x
        neigh = sum(1 for dy in (-1, 0, 1) for dx in (-1, 0, 1)
                    if 0 <= tx + dx < fspec.tiles_x
                    and 0 <= ty + dy < fspec.tiles_y)
        empty = pa.table({c: [] for c in _PARTIAL_SCHEMA.names},
                         schema=_PARTIAL_SCHEMA)
        if g["layer"].count(layer) != neigh:
            return empty
        window = assemble_window(g, fspec, layer, tx, ty)
        if window is None:
            return empty
        r0, _, c0, _ = fspec.assembled_window(tx, ty)
        rs, cs = ty * T - r0, tx * T - c0
        from ..tiles.codec import Caption

        ref = next(Caption.from_json(g["caption"][i])
                   for i in range(len(g["is_core"])) if g["is_core"][i])
        parts = zone_partials(window, float(ref.nodata), x0=c0, y0=r0,
                              core=(rs, rs + T, cs, cs + T))
        cols = {n: [] for n in _PARTIAL_SCHEMA.names}
        for z, (n, sx, sy, sxx, syy, sxy, perim) in parts.items():
            cols["zone"].append(z)
            cols["n"].append(n)
            cols["sx"].append(sx)
            cols["sy"].append(sy)
            cols["sxx"].append(sxx)
            cols["syy"].append(syy)
            cols["sxy"].append(sxy)
            cols["perim"].append(perim)
        return pa.table(
            {n: pa.array(cols[n], _PARTIAL_SCHEMA.field(n).type)
             for n in _PARTIAL_SCHEMA.names}, schema=_PARTIAL_SCHEMA)

    def fold(group: pa.Table) -> pa.Table:
        g = group.to_pydict()
        # python-int fold: exact at any world size
        n = sum(g["n"])
        sx = sum(int(v) for v in g["sx"])
        sy = sum(int(v) for v in g["sy"])
        sxx = sum(int(v) for v in g["sxx"])
        syy = sum(int(v) for v in g["syy"])
        sxy = sum(int(v) for v in g["sxy"])
        perim = sum(int(v) for v in g["perim"])
        r = derive_descriptors(g["zone"][0], n, sx, sy, sxx, syy, sxy,
                               perim)
        return pa.table({f: pa.array([r[f]]) for f in RESULT_FIELDS})

    return (tiles_ds
            .map_batches(keep_layer, batch_format="pyarrow")
            .map_batches(emit, batch_format="pyarrow")
            .groupby("cell_id")
            .map_groups(partials, batch_format="pyarrow")
            .groupby("zone")
            .map_groups(fold, batch_format="pyarrow")
            .sort("zone"))
