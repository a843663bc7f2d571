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
    """Holds the ENCODED tile dictionary plus a bounded LRU of decoded
    tiles; each site decodes only the tiles its buffer window touches.
    Memory is O(cache_tiles x tile), not O(mosaic) -- the whole-mosaic
    decode of a naive broadcast would be gigabytes per actor at the bench
    grid and impossible at continental scale, while the reference's own
    pattern is open-once + window-reads-per-feature
    (``02_get_slope_from_buffer.py:204-206``).  Slope/aspect are derived
    per window with a 1-px pad, so centered differences (and the one-sided
    ones at true mosaic borders) match a whole-mosaic computation exactly
    (caveat: interior NODATA regions wider than a window fill from
    window-local neighbours rather than mosaic-global ones -- raise the pad
    if an input carries such gaps).
    """

    def __init__(self, dem_tiles_ref, spec, buffer_m: float = 100.0,
                 cache_tiles: int = 256):
        import ray

        table = dem_tiles_ref if isinstance(dem_tiles_ref, pa.Table) \
            else ray.get(dem_tiles_ref)
        self.spec = spec
        self.buffer_m = buffer_m
        self.cache_tiles = cache_tiles
        self.tiles = {}
        for row in table.to_pylist():
            cap = Caption.from_json(row["caption"])
            if cap.layer != "dem":
                continue
            self.tiles[(cap.tx, cap.ty)] = (row["bytes"], row["fmt"], cap)
        from collections import OrderedDict

        self._cache: "OrderedDict[tuple, np.ndarray]" = OrderedDict()

    def _tile(self, tx: int, ty: int) -> np.ndarray | None:
        key = (tx, ty)
        if key in self._cache:
            self._cache.move_to_end(key)
            return self._cache[key]
        ent = self.tiles.get(key)
        if ent is None:
            return None
        arr = decode_tile(ent[0], ent[1], ent[2])
        self._cache[key] = arr
        if len(self._cache) > self.cache_tiles:
            self._cache.popitem(last=False)
        return arr

    def _dem_window(self, r0: int, r1: int, c0: int, c1: int) -> np.ndarray:
        """Assemble [r0:r1, c0:c1) of the mosaic from cached tiles."""
        T = self.spec.tile_px
        out = np.full((r1 - r0, c1 - c0), -99.0)
        for ty in range(r0 // T, (r1 - 1) // T + 1):
            for tx in range(c0 // T, (c1 - 1) // T + 1):
                arr = self._tile(tx, ty)
                if arr is None:
                    continue
                tr0, tc0 = ty * T, tx * T
                ir0, ir1 = max(r0, tr0), min(r1, tr0 + T)
                ic0, ic1 = max(c0, tc0), min(c1, tc0 + T)
                if ir0 < ir1 and ic0 < ic1:
                    out[ir0 - r0:ir1 - r0, ic0 - c0:ic1 - c0] = \
                        arr[ir0 - tr0:ir1 - tr0, ic0 - tc0:ic1 - tc0]
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        spec = self.spec
        ps = spec.pixel_size
        rows_total = spec.tiles_y * spec.tile_px
        cols_total = spec.tiles_x * spec.tile_px
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
                # 1-px pad (clipped at mosaic borders) so the gradient's
                # centered/one-sided choice per cell matches a whole-mosaic
                # computation
                p_r0, p_r1 = max(0, r0c - 1), min(rows_total, r1c + 1)
                p_c0, p_c1 = max(0, c0c - 1), min(cols_total, c1c + 1)
                dem = self._dem_window(p_r0, p_r1, p_c0, p_c1)
                sw, aw = slope_aspect(dem, ps, ps)
                window = sw[r0c - p_r0:r1c - p_r0, c0c - p_c0:c1c - p_c0]
                awin = aw[r0c - p_r0:r1c - p_r0, c0c - p_c0:c1c - p_c0]
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
