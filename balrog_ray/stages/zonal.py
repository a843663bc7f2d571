"""Per-site zonal statistics over derived rasters (Gen-2's hot loop).

Mirrors ``testing/02_get_slope_from_buffer.py:193-286``: for each site, a
circular buffer window over the slope raster -> min/max/mean/std/median/
pixel_count, with the out-of-area sentinel -9999 and the reference's
circular-median fix for aspect values straddling north
(``testing/test_gdal.py:233-245``).

Physical plan: an actor pool whose ``__init__`` decodes the DEM tile table
once (the broadcast side rides the object store via ``ray.put``) and derives
slope/aspect -- the open-the-raster-once-per-worker pattern
(``02_get_slope_from_buffer.py:204-206``).  At continental scale the same
``__call__`` body runs per cell-keyed group with halo'd windows instead of a
whole-raster mosaic; the broadcast variant is the dimension-sized case.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core.kernels import slope_aspect
from ..tiles.codec import Caption, decode_tile

OUT_OF_AREA = -9999.0

ZONAL_SCHEMA = pa.schema([
    ("site_id", pa.string()),
    ("buffer_m", pa.float64()),
    ("slope_min", pa.float64()),
    ("slope_max", pa.float64()),
    ("slope_avg", pa.float64()),
    ("slope_std", pa.float64()),
    ("slope_med", pa.float64()),
    ("aspect_med", pa.float64()),
    ("pixel_count", pa.int64()),
])


def circular_median(values: np.ndarray) -> float:
    """Median of compass angles with the reference's 0/360 wraparound fix:
    if the window spans north (min < 90 and max > 270), rotate the small
    angles by +360 before taking the median, then mod back."""
    if len(values) == 0:
        return OUT_OF_AREA
    if values.min() < 90.0 and values.max() > 270.0:
        values = np.where(values < 90.0, values + 360.0, values)
        return float(np.median(values) % 360.0)
    return float(np.median(values))


class ZonalStatsActor:
    def __init__(self, dem_tiles_ref, spec, buffer_m: float = 100.0):
        import ray

        table = dem_tiles_ref if isinstance(dem_tiles_ref, pa.Table) \
            else ray.get(dem_tiles_ref)
        self.spec = spec
        self.buffer_m = buffer_m
        T = spec.tile_px
        dem = np.full((spec.tiles_y * T, spec.tiles_x * T), -99.0)
        for row in table.to_pylist():
            cap = Caption.from_json(row["caption"])
            if cap.layer != "dem":
                continue
            dem[cap.ty * T:(cap.ty + 1) * T,
                cap.tx * T:(cap.tx + 1) * T] = \
                decode_tile(row["bytes"], row["fmt"], cap)
        self.slope, self.aspect = slope_aspect(dem, spec.pixel_size,
                                               spec.pixel_size)

    def __call__(self, batch: pa.Table) -> pa.Table:
        spec = self.spec
        ps = spec.pixel_size
        rows_total = self.slope.shape[0]
        cols_total = self.slope.shape[1]
        out = {name: [] for name in ZONAL_SCHEMA.names}
        ids = batch.column("site_id").to_pylist()
        xs = batch.column("x").to_numpy()
        ys = batch.column("y").to_numpy()
        r_px = self.buffer_m / ps
        for sid, x, y in zip(ids, xs, ys):
            col = (x / ps)
            row = ((spec.y_north - y) / ps)
            c0 = int(np.floor(col - r_px))
            c1 = int(np.ceil(col + r_px)) + 1
            r0 = int(np.floor(row - r_px))
            r1 = int(np.ceil(row + r_px)) + 1
            c0c, c1c = max(0, c0), min(cols_total, c1)
            r0c, r1c = max(0, r0), min(rows_total, r1)
            vals = np.empty(0)
            if c0c < c1c and r0c < r1c:
                window = self.slope[r0c:r1c, c0c:c1c]
                awin = self.aspect[r0c:r1c, c0c:c1c]
                cc = (np.arange(c0c, c1c) + 0.5) - col
                rr = (np.arange(r0c, r1c) + 0.5) - row
                gx, gy = np.meshgrid(cc, rr)
                mask = (gx * gx + gy * gy) <= r_px * r_px
                mask &= window != -99.0
                vals = window[mask]
                avals = awin[mask]
            out["site_id"].append(sid)
            out["buffer_m"].append(self.buffer_m)
            if len(vals) == 0:
                for k in ("slope_min", "slope_max", "slope_avg", "slope_std",
                          "slope_med", "aspect_med"):
                    out[k].append(OUT_OF_AREA)
                out["pixel_count"].append(0)
            else:
                out["slope_min"].append(float(vals.min()))
                out["slope_max"].append(float(vals.max()))
                out["slope_avg"].append(float(vals.mean()))
                out["slope_std"].append(float(vals.std()))
                out["slope_med"].append(float(np.median(vals)))
                out["aspect_med"].append(circular_median(avals))
                out["pixel_count"].append(int(len(vals)))
        return pa.table(out, schema=ZONAL_SCHEMA)


def zonal_stats(sites_ds, dem_tiles: pa.Table, spec, buffer_m: float = 100.0,
                concurrency=(1, 4), batch_size: int = 2048):
    import ray

    ref = ray.put(dem_tiles)
    return sites_ds.map_batches(
        ZonalStatsActor, fn_constructor_args=(ref, spec, buffer_m),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
