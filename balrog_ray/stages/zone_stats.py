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
