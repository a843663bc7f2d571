"""Affine raster warp with bilinear, nearest or Keys-cubic resampling
(GDAL's three standard kernels): the full
``gdal.Warp`` role (reference mosaics + reprojects with
``gdal.Warp -t_srs EPSG:4283 -of COG``,
``data_prep/images/ga_5m/01_mosaic_and_transform_images_in_one_go.py:245-266``)
for any invertible affine world transform -- rotation, anisotropic
scale, shear, shift.  ``stages/regrid.py`` covers the axis-aligned
nearest-neighbour case; this stage is the general resampler.

Semantics (shared with the test oracle): for a target pixel center
``p_t``, map to source world via the supplied TARGET->SOURCE affine,
convert to fractional source pixel coords (pixel-center convention),
and blend the 2x2 bilinear stencil::

    value = sum(w_i * v_i over VALID stencil pixels)
          / sum(w_i over VALID stencil pixels)

nodata / out-of-source stencil pixels are excluded and the weights
renormalized (GDAL's nodata-aware bilinear); a pixel with zero valid
weight is nodata.  ``nearest`` picks round-half-up of the fractional
coords.  ``cubic`` is the 4x4 Keys kernel (a = -0.5); its weights can be
negative, so a pixel needs NET positive valid weight, and the emitter
dilates the source bbox by 2 px instead of 1.

Scale shape -- one emit pass + ONE groupby(target cell) shuffle, no
halo: a stencil can straddle source-tile seams, so each SOURCE tile
emits, per overlapped target cell, two dense partial planes -- ``sum(w*v)``
and ``sum(w)`` over the stencil pixels THIS tile owns -- and the
assembler adds planes and divides.  Every contribution is computed
exactly once (source tiles partition the source raster), so the sum
over tiles equals the whole-raster stencil sum; seam pixels may differ
from a whole-raster run only by float-summation order (test asserts
allclose + exact nodata mask).  Shuffle volume is ~2x the target
raster, independent of the transform.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from ..tiles.codec import Caption, decode_tile, encode_tile, phash64
from ..tiles.synth import TILES_SCHEMA
from .halo import GridSpec

NODATA = -99.0


@dataclass(frozen=True)
class Affine:
    """2-D affine world transform ``x' = a x + b y + c``,
    ``y' = d x + e y + f``.  For :func:`warp_to_grid` it maps TARGET
    world coords to SOURCE world coords (the inverse mapping, which is
    what resampling evaluates)."""
    a: float
    b: float
    c: float
    d: float
    e: float
    f: float

    def apply(self, x: np.ndarray, y: np.ndarray):
        return (self.a * x + self.b * y + self.c,
                self.d * x + self.e * y + self.f)

    def inverse(self) -> "Affine":
        det = self.a * self.e - self.b * self.d
        if abs(det) < 1e-12:
            raise ValueError("affine transform is singular")
        ia, ib = self.e / det, -self.b / det
        id_, ie = -self.d / det, self.a / det
        return Affine(ia, ib, -(ia * self.c + ib * self.f),
                      id_, ie, -(id_ * self.c + ie * self.f))

    @staticmethod
    def identity() -> "Affine":
        return Affine(1.0, 0.0, 0.0, 0.0, 1.0, 0.0)

    @staticmethod
    def rotation(deg: float, cx: float = 0.0, cy: float = 0.0,
                 scale: float = 1.0, dx: float = 0.0,
                 dy: float = 0.0) -> "Affine":
        """Rotate by ``deg`` around ``(cx, cy)``, scale, then shift."""
        t = np.deg2rad(deg)
        co, si = float(np.cos(t)) * scale, float(np.sin(t)) * scale
        return Affine(co, -si, cx - co * cx + si * cy + dx,
                      si, co, cy - si * cx - co * cy + dy)


# ---------------------------------------------------------------------------
# CRS bridge transforms: true projected <-> geographic reprojection
# (the reference's ``gdal.Warp -t_srs EPSG:4283``,
# ``data_prep/images/ga_5m/01_mosaic_and_transform_images_in_one_go.py:245-266``
# and ``data_prep/03_create_dem_aspect_slope_rasters.sh:24-33``).  The
# projected frame is the equirectangular (plate-carree) local-metre frame
# shared with ``geo.geodesic.local_meter_frame``: ``x = (lon - lon0) * k *
# cos(lat_ts)``, ``y = (lat - lat0) * k`` with ``k`` = metres per degree on
# the mean sphere and ``lat_ts`` the standard parallel.  Both directions
# satisfy the warp emitter's transform protocol (``apply`` = target world
# -> source world, ``inverse`` = the opposite bridge), are monotone per
# axis (so the emitter's corner-mapped bbox is exact), and compose with the
# weighted-stencil resampler unchanged.

_K_M_PER_DEG = 6371008.8 * np.pi / 180.0      # IUGG mean-sphere metres/deg


@dataclass(frozen=True)
class ProjToGeo:
    """TARGET projected-metre world -> SOURCE degree world: regrid
    degree-CRS tiles (the reference's EPSG:4283 COGs) onto the engine's
    metre grid."""
    lon0: float = 0.0
    lat0: float = 0.0
    lat_ts: float | None = None       # standard parallel; default lat0

    def apply(self, x: np.ndarray, y: np.ndarray):
        ts = self.lat0 if self.lat_ts is None else self.lat_ts
        kx = _K_M_PER_DEG * np.cos(np.deg2rad(ts))
        return (self.lon0 + np.asarray(x, np.float64) / kx,
                self.lat0 + np.asarray(y, np.float64) / _K_M_PER_DEG)

    def inverse(self) -> "GeoToProj":
        return GeoToProj(self.lon0, self.lat0, self.lat_ts)


@dataclass(frozen=True)
class GeoToProj:
    """TARGET degree world -> SOURCE projected-metre world: produce a
    geographic (EPSG:4283-style) output grid from a projected raster --
    the ``-t_srs EPSG:4283`` direction itself."""
    lon0: float = 0.0
    lat0: float = 0.0
    lat_ts: float | None = None

    def apply(self, lon: np.ndarray, lat: np.ndarray):
        ts = self.lat0 if self.lat_ts is None else self.lat_ts
        kx = _K_M_PER_DEG * np.cos(np.deg2rad(ts))
        return ((np.asarray(lon, np.float64) - self.lon0) * kx,
                (np.asarray(lat, np.float64) - self.lat0)
                * _K_M_PER_DEG)

    def inverse(self) -> "ProjToGeo":
        return ProjToGeo(self.lon0, self.lat0, self.lat_ts)


_PATCH_SCHEMA = pa.schema([
    ("cell_id", pa.int64()),
    ("row0", pa.int32()), ("col0", pa.int32()),   # global target px
    ("h", pa.int32()), ("w", pa.int32()),
    ("wv", pa.binary()), ("wsum", pa.binary()),   # deflated float64
])


def _keys_cubic(s: np.ndarray) -> np.ndarray:
    """Keys cubic-convolution kernel, a = -0.5 (Catmull-Rom; GDAL's
    ``cubic``).  Exact polynomial evaluation in float64."""
    a = -0.5
    t = np.abs(s)
    t2 = t * t
    t3 = t2 * t
    near = (a + 2.0) * t3 - (a + 3.0) * t2 + 1.0
    far = a * t3 - 5.0 * a * t2 + 8.0 * a * t - 4.0 * a
    return np.where(t <= 1.0, near, np.where(t < 2.0, far, 0.0))


def _stencil_partials(src: np.ndarray, nodata: float, cf: np.ndarray,
                      rf: np.ndarray, mode: str):
    """Partial (sum w*v, sum w) for fractional source coords (cf, rf)
    counting ONLY stencil pixels inside ``src`` (this tile's pixels).
    Fixed accumulation order (row-major over the stencil) so interior
    pixels match a whole-raster run bit-for-bit."""
    sh, sw = src.shape
    c0 = np.floor(cf).astype(np.int64)
    r0 = np.floor(rf).astype(np.int64)
    fc = cf - c0
    fr = rf - r0
    wv = np.zeros(cf.shape, np.float64)
    ws = np.zeros(cf.shape, np.float64)
    if mode == "cubic":
        # 4x4 Keys stencil: taps r0-1..r0+2 x c0-1..c0+2; weights can be
        # negative, so a valid pixel needs NET positive weight (the
        # assembler's ws > 0 test) -- full stencils sum to exactly 1
        for dr in (-1, 0, 1, 2):
            wr = _keys_cubic(fr - dr)
            rr = r0 + dr
            for dc in (-1, 0, 1, 2):
                cc = c0 + dc
                w = wr * _keys_cubic(fc - dc)
                inb = (rr >= 0) & (rr < sh) & (cc >= 0) & (cc < sw)
                if not inb.any():
                    continue
                v = np.zeros(cf.shape, np.float64)
                v[inb] = src[rr[inb], cc[inb]].astype(np.float64)
                valid = inb & (v != float(np.float32(nodata)))
                wv += np.where(valid, w * v, 0.0)
                ws += np.where(valid, w, 0.0)
        return wv, ws
    if mode == "nearest":
        # nearest = the stencil corner closest to the point
        # (round-half-up of the fractional coords)
        rn = np.where(fr >= 0.5, r0 + 1, r0)
        cn = np.where(fc >= 0.5, c0 + 1, c0)
        inb = (rn >= 0) & (rn < sh) & (cn >= 0) & (cn < sw)
        v = np.zeros(cf.shape, np.float64)
        v[inb] = src[rn[inb], cn[inb]].astype(np.float64)
        valid = inb & (v != float(np.float32(nodata)))
        return np.where(valid, v, 0.0), np.where(valid, 1.0, 0.0)
    for dr, dc in ((0, 0), (0, 1), (1, 0), (1, 1)):
        rr = r0 + dr
        cc = c0 + dc
        w = ((fr if dr else 1.0 - fr) * (fc if dc else 1.0 - fc))
        inb = (rr >= 0) & (rr < sh) & (cc >= 0) & (cc < sw)
        if not inb.any():
            continue
        v = np.zeros(cf.shape, np.float64)
        v[inb] = src[rr[inb], cc[inb]].astype(np.float64)
        valid = inb & (v != float(np.float32(nodata)))
        wv += np.where(valid, w * v, 0.0)
        ws += np.where(valid, w, 0.0)
    return wv, ws


def make_warp_emitter(spec: GridSpec, transform,
                      resampling: str = "bilinear"):
    """Source tile rows -> partial-stencil patches keyed by target cell.
    ``transform`` maps target world -> source world (``Affine``,
    ``ProjToGeo`` or ``GeoToProj`` -- anything with per-axis-monotone
    ``apply`` and an ``inverse()``)."""
    if resampling not in ("bilinear", "nearest", "cubic"):
        raise ValueError(
            "resampling must be 'bilinear', 'nearest' or 'cubic'")
    T, ps_t = spec.tile_px, spec.pixel_size
    fwd = transform.inverse()         # source world -> target world
    reach = 2 if resampling == "cubic" else 1   # stencil radius in src px

    def fn(batch: pa.Table) -> pa.Table:
        cols = {n: [] for n in _PATCH_SCHEMA.names}
        for row in batch.to_pylist():
            cap = Caption.from_json(row["caption"])
            src = np.asarray(decode_tile(row["bytes"], row["fmt"], cap),
                             dtype=np.float32)
            sh, sw = src.shape
            ps_s = cap.pixel_size
            sx0, sy0 = cap.x0, cap.y0
            # target-space bbox of the source tile dilated by the
            # stencil reach in source px: corners forward-mapped, then
            # clipped to the target raster
            xs = np.array([sx0 - reach * ps_s,
                           sx0 + (sw + reach) * ps_s])
            ys = np.array([sy0 + reach * ps_s,
                           sy0 - (sh + reach) * ps_s])
            cx = np.array([xs[0], xs[1], xs[0], xs[1]])
            cy = np.array([ys[0], ys[0], ys[1], ys[1]])
            tx_, ty_ = fwd.apply(cx, cy)
            c_first = max(0, int(np.ceil(tx_.min() / ps_t - 0.5)))
            c_last = min(spec.tiles_x * T - 1,
                         int(np.floor(tx_.max() / ps_t - 0.5)))
            r_first = max(0, int(np.ceil(
                (spec.y_north - ty_.max()) / ps_t - 0.5)))
            r_last = min(spec.tiles_y * T - 1,
                         int(np.floor(
                             (spec.y_north - ty_.min()) / ps_t - 0.5)))
            if c_first > c_last or r_first > r_last:
                continue
            for ty in range(r_first // T, r_last // T + 1):
                for tx in range(c_first // T, c_last // T + 1):
                    pr0 = max(r_first, ty * T)
                    pr1 = min(r_last, ty * T + T - 1)
                    pc0 = max(c_first, tx * T)
                    pc1 = min(c_last, tx * T + T - 1)
                    gx = (np.arange(pc0, pc1 + 1) + 0.5) * ps_t
                    gy = spec.y_north - (np.arange(pr0, pr1 + 1) + 0.5) * ps_t
                    X, Y = np.meshgrid(gx, gy)
                    sx, sy = transform.apply(X, Y)
                    cf = (sx - sx0) / ps_s - 0.5
                    rf = (sy0 - sy) / ps_s - 0.5
                    wv, ws = _stencil_partials(src, cap.nodata, cf, rf,
                                               resampling)
                    # skip only truly zero patches: cubic partials can
                    # be NEGATIVE (outer Keys taps), and a seam patch
                    # whose every pixel is net-negative still carries
                    # real contributions the assembler must add
                    if not (ws != 0).any():
                        continue
                    cols["cell_id"].append(spec.cell_id(tx, ty))
                    cols["row0"].append(pr0)
                    cols["col0"].append(pc0)
                    cols["h"].append(wv.shape[0])
                    cols["w"].append(wv.shape[1])
                    cols["wv"].append(zlib.compress(
                        np.ascontiguousarray(wv).tobytes(), 1))
                    cols["wsum"].append(zlib.compress(
                        np.ascontiguousarray(ws).tobytes(), 1))
        return pa.table(
            {n: pa.array(cols[n], _PATCH_SCHEMA.field(n).type)
             for n in _PATCH_SCHEMA.names}, schema=_PATCH_SCHEMA)

    return fn


def make_warp_assembler(spec: GridSpec, layer: str, fmt: str = "npz"):
    """Patch group (one target cell) -> blended TILES_SCHEMA row."""
    T, ps = spec.tile_px, spec.pixel_size

    def fn(group: pa.Table) -> pa.Table:
        g = group.to_pydict()
        cell = int(g["cell_id"][0])
        tx, ty = cell % spec.tiles_x, cell // spec.tiles_x
        wv = np.zeros((T, T), np.float64)
        ws = np.zeros((T, T), np.float64)
        for i in range(len(g["wv"])):
            h, w = int(g["h"][i]), int(g["w"][i])
            rr = int(g["row0"][i]) - ty * T
            cc = int(g["col0"][i]) - tx * T
            wv[rr:rr + h, cc:cc + w] += np.frombuffer(
                zlib.decompress(g["wv"][i]), np.float64).reshape(h, w)
            ws[rr:rr + h, cc:cc + w] += np.frombuffer(
                zlib.decompress(g["wsum"][i]), np.float64).reshape(h, w)
        with np.errstate(invalid="ignore", divide="ignore"):
            canvas = np.where(ws > 0, wv / ws, NODATA).astype(np.float32)
        cap = Caption(layer=layer, x0=tx * T * ps,
                      y0=spec.y_north - ty * T * ps, pixel_size=ps,
                      edge={"n": ty == 0, "s": ty == spec.tiles_y - 1,
                            "w": tx == 0, "e": tx == spec.tiles_x - 1},
                      tx=tx, ty=ty)
        payload, cap = encode_tile(canvas, fmt, cap)
        return pa.table({
            "image_id": [f"{layer}/{tx}/{ty}"],
            "bytes": [payload], "w": [np.int32(T)], "h": [np.int32(T)],
            "fmt": [fmt], "caption": [cap.to_json()],
            "phash": [np.int64(phash64(canvas))]}, schema=TILES_SCHEMA)

    return fn


def overlap_matrix(t_start: float, ps_t: float, n_t: int,
                   s_start: float, ps_s: float, n_s: int) -> np.ndarray:
    """(n_t, n_s) exact 1-D interval overlap lengths between target
    cells ``[t_start + i*ps_t, +ps_t)`` and source cells
    ``[s_start + j*ps_s, +ps_s)`` -- the single source of truth for the
    area-average weights (the test oracle builds its global matrices
    with the same function)."""
    te0 = t_start + np.arange(n_t, dtype=np.float64) * ps_t
    se0 = s_start + np.arange(n_s, dtype=np.float64) * ps_s
    lo = np.maximum(te0[:, None], se0[None, :])
    hi = np.minimum(te0[:, None] + ps_t, se0[None, :] + ps_s)
    return np.clip(hi - lo, 0.0, None)


def make_area_average_emitter(spec: GridSpec):
    """Source tile rows -> partial area-weighted sums keyed by target
    cell: the ``gdalwarp -r average`` kernel for axis-aligned regrids
    (the correct way to COARSEN a raster -- point-sampling kernels alias
    when ps_target > ps_source).  Per target pixel::

        value = sum(area(src px  target px) * v) / sum(area * valid)

    over the source pixels overlapping its footprint, nodata excluded.
    Separable: the 2-D area weights factor into 1-D column/row overlap
    matrices, so each source tile's whole contribution is two matmuls
    (``MY @ V @ MX.T``), not a pixel loop.  Same one-emit +
    one-groupby(cell) shape and `_PATCH_SCHEMA` as the warp emitter;
    source tiles partition the source raster, so every source pixel
    contributes exactly once and the assembler's patch sum equals the
    whole-raster weighted sum up to float addition order."""
    T, ps_t = spec.tile_px, spec.pixel_size
    nx, ny = spec.tiles_x * T, spec.tiles_y * T

    def fn(batch: pa.Table) -> pa.Table:
        cols = {n: [] for n in _PATCH_SCHEMA.names}
        for row in batch.to_pylist():
            cap = Caption.from_json(row["caption"])
            src = np.asarray(decode_tile(row["bytes"], row["fmt"], cap),
                             dtype=np.float32)
            sh, sw = src.shape
            ps_s, sx0 = cap.pixel_size, cap.x0
            d0 = spec.y_north - cap.y0          # source top, depth coords
            c_first = max(0, int(np.floor(sx0 / ps_t + 1e-9)))
            c_last = min(nx - 1, int(np.ceil(
                (sx0 + sw * ps_s) / ps_t - 1e-9)) - 1)
            r_first = max(0, int(np.floor(d0 / ps_t + 1e-9)))
            r_last = min(ny - 1, int(np.ceil(
                (d0 + sh * ps_s) / ps_t - 1e-9)) - 1)
            if c_first > c_last or r_first > r_last:
                continue
            mx = overlap_matrix(c_first * ps_t, ps_t,
                                c_last - c_first + 1, sx0, ps_s, sw)
            my = overlap_matrix(r_first * ps_t, ps_t,
                                r_last - r_first + 1, d0, ps_s, sh)
            valid = src != np.float32(cap.nodata)
            v = np.where(valid, src.astype(np.float64), 0.0)
            wv_full = my @ v @ mx.T
            ws_full = my @ valid.astype(np.float64) @ mx.T
            for ty in range(r_first // T, r_last // T + 1):
                for tx in range(c_first // T, c_last // T + 1):
                    pr0 = max(r_first, ty * T)
                    pr1 = min(r_last, ty * T + T - 1)
                    pc0 = max(c_first, tx * T)
                    pc1 = min(c_last, tx * T + T - 1)
                    wv = wv_full[pr0 - r_first:pr1 - r_first + 1,
                                 pc0 - c_first:pc1 - c_first + 1]
                    ws = ws_full[pr0 - r_first:pr1 - r_first + 1,
                                 pc0 - c_first:pc1 - c_first + 1]
                    if not (ws != 0).any():
                        continue
                    cols["cell_id"].append(spec.cell_id(tx, ty))
                    cols["row0"].append(pr0)
                    cols["col0"].append(pc0)
                    cols["h"].append(wv.shape[0])
                    cols["w"].append(wv.shape[1])
                    cols["wv"].append(zlib.compress(
                        np.ascontiguousarray(wv).tobytes(), 1))
                    cols["wsum"].append(zlib.compress(
                        np.ascontiguousarray(ws).tobytes(), 1))
        return pa.table(
            {n: pa.array(cols[n], _PATCH_SCHEMA.field(n).type)
             for n in _PATCH_SCHEMA.names}, schema=_PATCH_SCHEMA)

    return fn


def area_average_to_grid(tiles_ds, spec: GridSpec, *,
                         layer: str = "avg", fmt: str = "npz"):
    """Area-weighted average regrid of an axis-aligned tile Dataset onto
    ``spec`` (``gdalwarp -r average``): one emit pass, ONE
    groupby(target cell), the shared warp assembler."""
    return (tiles_ds
            .map_batches(make_area_average_emitter(spec),
                         batch_format="pyarrow")
            .groupby("cell_id")
            .map_groups(make_warp_assembler(spec, layer, fmt),
                        batch_format="pyarrow"))


_MODE_PATCH_SCHEMA = pa.schema([
    ("cell_id", pa.int64()),
    ("row0", pa.int32()), ("col0", pa.int32()),   # global target px
    ("h", pa.int32()), ("w", pa.int32()),
    ("cls", pa.float64()),                        # categorical value
    ("area", pa.binary()),                        # deflated float64
])

#: mode-resample area quantum: per-class areas are normalized to
#: fraction-of-target-pixel and snapped to 2^-20 before the argmax, so
#: the winner is immune to float summation-order noise between the
#: tiled engine and a whole-raster oracle (exact geometric ties resolve
#: to the SMALLEST class value on both sides).
MODE_QUANTUM = 1 << 20


def make_mode_emitter(spec: GridSpec):
    """Source tile rows -> per-class partial overlap areas keyed by
    target cell: the ``gdalwarp -r mode`` (majority) kernel for
    coarsening CATEGORICAL rasters, where averaging kernels would
    invent classes that don't exist.  Per (target pixel, class)::

        area(class) = sum over source px of that class of
                      overlap(src px footprint, target px footprint)

    and the assembled winner is the class with max area.  Separable
    like the average kernel: one pair of matmuls per DISTINCT class in
    the tile (class domains are small for categorical rasters -- veg
    classes 1..7 in the reference), never a pixel loop.  Source nodata
    contributes no area."""
    T, ps_t = spec.tile_px, spec.pixel_size
    nx, ny = spec.tiles_x * T, spec.tiles_y * T

    def fn(batch: pa.Table) -> pa.Table:
        cols = {n: [] for n in _MODE_PATCH_SCHEMA.names}
        for row in batch.to_pylist():
            cap = Caption.from_json(row["caption"])
            src = np.asarray(decode_tile(row["bytes"], row["fmt"], cap),
                             dtype=np.float32)
            sh, sw = src.shape
            ps_s, sx0 = cap.pixel_size, cap.x0
            d0 = spec.y_north - cap.y0
            c_first = max(0, int(np.floor(sx0 / ps_t + 1e-9)))
            c_last = min(nx - 1, int(np.ceil(
                (sx0 + sw * ps_s) / ps_t - 1e-9)) - 1)
            r_first = max(0, int(np.floor(d0 / ps_t + 1e-9)))
            r_last = min(ny - 1, int(np.ceil(
                (d0 + sh * ps_s) / ps_t - 1e-9)) - 1)
            if c_first > c_last or r_first > r_last:
                continue
            mx = overlap_matrix(c_first * ps_t, ps_t,
                                c_last - c_first + 1, sx0, ps_s, sw)
            my = overlap_matrix(r_first * ps_t, ps_t,
                                r_last - r_first + 1, d0, ps_s, sh)
            valid = src != np.float32(cap.nodata)
            for cls in np.unique(src[valid]):
                ind = (src == cls).astype(np.float64)
                a_full = my @ ind @ mx.T
                for ty in range(r_first // T, r_last // T + 1):
                    for tx in range(c_first // T, c_last // T + 1):
                        pr0 = max(r_first, ty * T)
                        pr1 = min(r_last, ty * T + T - 1)
                        pc0 = max(c_first, tx * T)
                        pc1 = min(c_last, tx * T + T - 1)
                        a = a_full[pr0 - r_first:pr1 - r_first + 1,
                                   pc0 - c_first:pc1 - c_first + 1]
                        if not (a > 0).any():
                            continue
                        cols["cell_id"].append(spec.cell_id(tx, ty))
                        cols["row0"].append(pr0)
                        cols["col0"].append(pc0)
                        cols["h"].append(a.shape[0])
                        cols["w"].append(a.shape[1])
                        cols["cls"].append(float(cls))
                        cols["area"].append(zlib.compress(
                            np.ascontiguousarray(a).tobytes(), 1))
        return pa.table(
            {n: pa.array(cols[n], _MODE_PATCH_SCHEMA.field(n).type)
             for n in _MODE_PATCH_SCHEMA.names},
            schema=_MODE_PATCH_SCHEMA)

    return fn


def make_mode_assembler(spec: GridSpec, layer: str, fmt: str = "npz"):
    """Patch group (one target cell) -> majority-class TILES_SCHEMA row.
    Areas are accumulated per class, normalized to target-pixel
    fractions, snapped to the MODE_QUANTUM grid, and the argmax runs
    over classes sorted ascending -- so exact ties pick the smallest
    class value, deterministically."""
    T, ps = spec.tile_px, spec.pixel_size

    def fn(group: pa.Table) -> pa.Table:
        g = group.to_pydict()
        cell = int(g["cell_id"][0])
        tx, ty = cell % spec.tiles_x, cell // spec.tiles_x
        planes: dict[float, np.ndarray] = {}
        for i in range(len(g["cls"])):
            h, w = int(g["h"][i]), int(g["w"][i])
            rr = int(g["row0"][i]) - ty * T
            cc = int(g["col0"][i]) - tx * T
            plane = planes.setdefault(
                float(g["cls"][i]), np.zeros((T, T), np.float64))
            plane[rr:rr + h, cc:cc + w] += np.frombuffer(
                zlib.decompress(g["area"][i]), np.float64).reshape(h, w)
        clss = np.array(sorted(planes), np.float64)
        stack = np.stack([planes[c] for c in clss])
        q = np.rint(stack / (ps * ps) * MODE_QUANTUM).astype(np.int64)
        tot = q.sum(axis=0)
        best = q.argmax(axis=0)           # first max = smallest class
        canvas = np.where(tot > 0, clss[best].astype(np.float32),
                          np.float32(NODATA))
        cap = Caption(layer=layer, x0=tx * T * ps,
                      y0=spec.y_north - ty * T * ps, pixel_size=ps,
                      edge={"n": ty == 0, "s": ty == spec.tiles_y - 1,
                            "w": tx == 0, "e": tx == spec.tiles_x - 1},
                      tx=tx, ty=ty)
        payload, cap = encode_tile(canvas.astype(np.float32), fmt, cap)
        return pa.table({
            "image_id": [f"{layer}/{tx}/{ty}"],
            "bytes": [payload], "w": [np.int32(T)], "h": [np.int32(T)],
            "fmt": [fmt], "caption": [cap.to_json()],
            "phash": [np.int64(phash64(canvas.astype(np.float32)))]},
            schema=TILES_SCHEMA)

    return fn


def mode_resample_to_grid(tiles_ds, spec: GridSpec, *,
                          layer: str = "mode", fmt: str = "npz"):
    """Majority-class regrid of a categorical tile Dataset onto ``spec``
    (``gdalwarp -r mode``): one emit pass, ONE groupby(target cell)."""
    return (tiles_ds
            .map_batches(make_mode_emitter(spec),
                         batch_format="pyarrow")
            .groupby("cell_id")
            .map_groups(make_mode_assembler(spec, layer, fmt),
                        batch_format="pyarrow"))


def warp_to_grid(tiles_ds, spec: GridSpec, transform, *,
                 layer: str = "warp", fmt: str = "npz",
                 resampling: str = "bilinear"):
    """Warp a tile Dataset through ``transform`` (target world -> source
    world: an ``Affine``, or a CRS bridge for true reprojection) onto
    the target ``spec`` grid.  Returns a TILES_SCHEMA
    Dataset; target cells with no source coverage are dropped (resume-
    friendly partitioned output, not a dense all-nodata grid)."""
    if resampling not in ("bilinear", "nearest", "cubic"):
        raise ValueError(
            "resampling must be 'bilinear', 'nearest' or 'cubic'")
    return (tiles_ds
            .map_batches(make_warp_emitter(spec, transform, resampling),
                         batch_format="pyarrow")
            .groupby("cell_id")
            .map_groups(make_warp_assembler(spec, layer, fmt),
                        batch_format="pyarrow"))
