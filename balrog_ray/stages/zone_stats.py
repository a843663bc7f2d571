"""Zonal statistics by RASTER zone: aggregate a value layer grouped by
the integer ids of a co-registered zone layer (the ArcGIS ZonalStatistics
/ QGIS "zonal statistics (raster zones)" shape -- the polygon-zone
variant lives in :mod:`.zonal`).  The natural consumer of the engine's
own raster outputs: watershed basins, sieve regions, BAL bands.

Scale shape: pure two-level aggregate, NO halo and NO pixel shuffle --
each cell pairs its zone+value tiles in ONE ``groupby(cell_id)``, emits
per-zone partials (n, sum, min, max), and a tiny ``groupby(zone)``
combines them.  Partial volume is #distinct-zones-per-tile rows, not
pixels."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .front import make_keyed
from .halo import GridSpec

_PARTIAL = pa.schema([
    ("zone", pa.int64()),
    ("n_px", pa.int64()),
    ("total", pa.float64()),
    ("vmin", pa.float64()),
    ("vmax", pa.float64()),
])


def zonal_by_zone_raster(ds, spec: GridSpec, *, zone_layer: str,
                         value_layer: str):
    """Image-table Dataset (zone + value layers on one grid) -> Dataset
    of per-zone rows ``(zone, n_px, total, vmin, vmax, mean)``.  Zone
    ids are read as int64 (float tiles must carry integral ids, e.g.
    watershed basins); pixels where EITHER layer is nodata are skipped."""

    keyed = make_keyed(spec, (zone_layer, value_layer))

    def partials(group: pa.Table) -> pa.Table:
        from ..tiles.codec import Caption, decode_tile

        g = group.to_pydict()
        arrs = {}
        for i in range(len(g["layer"])):
            cap = Caption.from_json(g["caption"][i])
            arrs[g["layer"][i]] = (decode_tile(g["bytes"][i],
                                               g["fmt"][i], cap), cap)
        if zone_layer not in arrs or value_layer not in arrs:
            return pa.table({c: [] for c in _PARTIAL.names},
                            schema=_PARTIAL)
        zarr, zcap = arrs[zone_layer]
        varr, vcap = arrs[value_layer]
        ok = ((zarr != np.float32(zcap.nodata))
              & (varr != np.float32(vcap.nodata)))
        if not ok.any():
            return pa.table({c: [] for c in _PARTIAL.names},
                            schema=_PARTIAL)
        z = zarr[ok].astype(np.int64)
        v = varr[ok].astype(np.float64)
        order = np.argsort(z, kind="stable")
        z, v = z[order], v[order]
        starts = np.flatnonzero(np.r_[True, z[1:] != z[:-1]])
        ends = np.r_[starts[1:], len(z)]
        sums = np.add.reduceat(v, starts)
        mins = np.minimum.reduceat(v, starts)
        maxs = np.maximum.reduceat(v, starts)
        return pa.table({
            "zone": pa.array(z[starts], pa.int64()),
            "n_px": pa.array((ends - starts).astype(np.int64), pa.int64()),
            "total": pa.array(sums, pa.float64()),
            "vmin": pa.array(mins, pa.float64()),
            "vmax": pa.array(maxs, pa.float64())},
            schema=_PARTIAL)

    from ray.data.aggregate import Max, Min, Sum

    agg = (ds.map_batches(keyed, batch_format="pyarrow")
           .groupby("cell_id")
           .map_groups(partials, batch_format="pyarrow")
           .groupby("zone")
           .aggregate(Sum("n_px", alias_name="n_px"),
                      Sum("total", alias_name="total"),
                      Min("vmin", alias_name="vmin"),
                      Max("vmax", alias_name="vmax")))

    def finalize(b: pa.Table) -> pa.Table:
        n = b.column("n_px").to_numpy(zero_copy_only=False)
        s = b.column("total").to_numpy(zero_copy_only=False)
        return b.append_column(
            "mean", pa.array(s / np.maximum(n, 1), pa.float64()))

    return agg.map_batches(finalize, batch_format="pyarrow")


def zonal_category_stats(ds, spec: GridSpec, *, zone_layer: str,
                         value_layer: str):
    """Categorical zonal statistics -- ArcGIS ZonalStatistics MAJORITY /
    MINORITY / VARIETY over an integer-class value layer: per zone, the
    most and least frequent class (ties -> smallest class id, a total
    documented order) and the distinct-class count.

    Same two-level shape as :func:`zonal_by_zone_raster`, with
    (zone, class) -> count partials: ONE ``groupby(cell_id)`` pairs the
    co-registered tiles, a ``groupby(zone, value)`` combines counts
    (volume bounded by #zones x #classes, never pixels), and the final
    per-zone ``map_groups`` is a vectorized argmax over that tiny
    table."""
    from ray.data.aggregate import Sum

    keyed = make_keyed(spec, (zone_layer, value_layer))
    pair_schema = pa.schema([("zone", pa.int64()),
                             ("value", pa.int64()),
                             ("n_px", pa.int64())])

    def partials(group: pa.Table) -> pa.Table:
        from ..tiles.codec import Caption, decode_tile

        g = group.to_pydict()
        arrs = {}
        for i in range(len(g["layer"])):
            cap = Caption.from_json(g["caption"][i])
            arrs[g["layer"][i]] = (decode_tile(g["bytes"][i],
                                               g["fmt"][i], cap), cap)
        if zone_layer not in arrs or value_layer not in arrs:
            return pa.table({c: [] for c in pair_schema.names},
                            schema=pair_schema)
        zarr, zcap = arrs[zone_layer]
        varr, vcap = arrs[value_layer]
        ok = ((zarr != np.float32(zcap.nodata))
              & (varr != np.float32(vcap.nodata)))
        if not ok.any():
            return pa.table({c: [] for c in pair_schema.names},
                            schema=pair_schema)
        pairs = np.stack([zarr[ok].astype(np.int64),
                          varr[ok].astype(np.int64)], axis=1)
        uniq, cnt = np.unique(pairs, axis=0, return_counts=True)
        return pa.table({"zone": pa.array(uniq[:, 0], pa.int64()),
                         "value": pa.array(uniq[:, 1], pa.int64()),
                         "n_px": pa.array(cnt.astype(np.int64),
                                          pa.int64())}, schema=pair_schema)

    counts = (ds.map_batches(keyed, batch_format="pyarrow")
              .groupby("cell_id")
              .map_groups(partials, batch_format="pyarrow")
              .groupby(["zone", "value"])
              .aggregate(Sum("n_px", alias_name="n_px")))

    def per_zone(group: pa.Table) -> pa.Table:
        v = group.column("value").to_numpy()
        n = group.column("n_px").to_numpy()
        order = np.lexsort((v,))           # ties resolve to smallest id
        v, n = v[order], n[order]
        hi = int(np.argmax(n))             # first max in id order
        lo = int(np.argmin(n))             # first min in id order
        return pa.table({
            "zone": pa.array([group.column("zone")[0].as_py()],
                             pa.int64()),
            "variety": pa.array([len(v)], pa.int64()),
            "majority": pa.array([int(v[hi])], pa.int64()),
            "majority_n": pa.array([int(n[hi])], pa.int64()),
            "minority": pa.array([int(v[lo])], pa.int64()),
            "minority_n": pa.array([int(n[lo])], pa.int64())})

    return counts.groupby("zone").map_groups(per_zone,
                                             batch_format="pyarrow")
