"""Pure-NumPy raster kernels with exact parity to the reference BAL engine.

Everything here is framework-free (no Ray, no I/O): these kernels are what
``map_batches`` stages call per tile.  Parity targets (all in
``/root/reference``):

* :func:`clip_array`           -> ``utilities/sa_tools.py:20-45``
* :func:`edge_fill_nodata`     -> the four sequential nodata-fill sweeps in
  ``utilities/sa_tools.py:239-265`` (vectorized, including the descending
  sweeps' single-step copy and their row/col-0 wraparound behaviour)
* :func:`slope_aspect`         -> ``utilities/sa_tools.py:267-281``
* :func:`slope_in_aspect`      -> ``calculate_bal.py:119-142``
* :func:`convo`                -> ``calculate_bal.py:145-220`` (the per-pixel
  directional scan, vectorized as `filter_width` shifted LUT gathers)
* :func:`max_bal`              -> ``calculate_bal.py:104-116``

The tiled/distributed code paths pass a boolean ``valid`` mask marking which
cells of an assembled (tile + halo) array actually exist in the global
raster; border clamping then matches the reference's whole-raster
``ALL_NEIGHB`` semantics (``utilities/value_lookup.py:26-33``) exactly.
"""

from __future__ import annotations

import numpy as np

from .tables import (NODATA, SLOPE_KEYS, VEG_KEYS, bal_lut, class_index)

RADIANS_PER_DEGREE = 0.01745329251994329576923690768489

#: per-step (row, col) offset of each compass direction
#: (equivalent to POINT_R/POINT_C in utilities/value_lookup.py:36-53)
DIR_OFFSETS = {
    "w": (0, -1), "e": (0, 1), "n": (-1, 0), "s": (1, 0),
    "nw": (-1, -1), "ne": (-1, 1), "sw": (1, -1), "se": (1, 1),
}

#: aspect class that faces each direction (utilities/value_lookup.py:15-23)
DIRE_ASPECT = {"n": 1, "ne": 2, "e": 3, "se": 4, "s": 5, "sw": 6, "w": 7,
               "nw": 8, "none": 9}

DIRECTIONS = ("w", "e", "n", "s", "nw", "ne", "se", "sw")


def neighbour_count(a_dir: str, i: int, jj: int, rows: int, cols: int) -> int:
    """Number of in-raster neighbours along ``a_dir`` from cell (i, jj)."""
    dr, dc = DIR_OFFSETS[a_dir]
    best = None
    for delta, size, pos in ((dr, rows, i), (dc, cols, jj)):
        if delta == 0:
            continue
        room = (size - 1 - pos) if delta > 0 else pos
        best = room if best is None else min(best, room)
    return int(best)


def clip_array(data, x_left, y_upper, pixelwidth, pixelheight, extent):
    """Window extraction by projected extent, rounded to the pixel grid."""
    x_start = int(np.around((extent[0] - x_left) / pixelwidth))
    y_start = int(np.around((y_upper - extent[3]) / pixelheight))
    cols = int(np.around((extent[2] - extent[0]) / pixelwidth))
    rows = int(np.around((extent[3] - extent[1]) / pixelheight))
    return data[y_start:y_start + rows, x_start:x_start + cols]


def _ffill_axis(a: np.ndarray, axis: int, nodata: float) -> np.ndarray:
    """Forward-fill nodata runs along ``axis`` from the nearest valid value
    before them (full propagation, like the reference's ascending sweeps)."""
    if axis == 1:
        return _ffill_axis(a.T, 0, nodata).T
    valid = a != nodata
    n = a.shape[0]
    idx = np.where(valid, np.arange(n)[:, None], -1)
    np.maximum.accumulate(idx, axis=0, out=idx)
    filled = a[np.clip(idx, 0, None), np.arange(a.shape[1])[None, :]]
    return np.where(idx >= 0, filled, a)


def _single_step_fill(a: np.ndarray, axis: int, nodata: float) -> None:
    """One descending sweep: copy the previous-row/col value into nodata
    cells.  Descending iteration means every in-bounds read sees pre-sweep
    values; index 0 wraps to the *post-sweep* last row/col, matching the
    reference's ``elev[j-1]`` at ``j == 0``."""
    if axis == 1:
        _single_step_fill(a.T, 0, nodata)
        return
    prev = a[:-1].copy()
    rest = a[1:]
    m = (rest == nodata) & (prev != nodata)
    rest[m] = prev[m]
    m0 = (a[0] == nodata) & (a[-1] != nodata)
    a[0][m0] = a[-1][m0]


def edge_fill_nodata(elev: np.ndarray, nodata: float = NODATA) -> np.ndarray:
    """The reference's four nodata-fill sweeps before gradient computation.

    Sweeps 1-2 propagate valid values fully down / right; sweeps 3-4 copy a
    single step from above / left (with the index-0 wraparound quirk).
    """
    a = np.array(elev, copy=True)   # preserves dtype: float32 in the tiled
    if not np.issubdtype(a.dtype, np.floating):     # hot path, float64 in
        a = a.astype(np.float64)                    # scalar parity tests
    if not (a == nodata).any():     # common case: nothing to fill
        return a
    a = _ffill_axis(a, 0, nodata)
    a = _ffill_axis(a, 1, nodata)
    _single_step_fill(a, 0, nodata)
    _single_step_fill(a, 1, nodata)
    return a


def slope_aspect(elev: np.ndarray, pixel_w: float, pixel_h: float,
                 nodata: float = NODATA) -> tuple[np.ndarray, np.ndarray]:
    """Slope (degrees) and compass aspect (0-360) from a DEM window.

    Centered differences inside, one-sided at array edges (``np.gradient``),
    i.e. Horn-style finite differences as the reference computes them.
    Nodata cells are edge-filled first and masked back afterwards.

    Computes in float32 (the engine's raster precision: payloads are stored
    float32, so float64 here would add traffic without information).  Any
    float64 input is cast first, which keeps a whole-raster oracle run
    bit-identical to the tiled pipeline's decoded-float32 path.
    """
    elev = np.asarray(elev, dtype=np.float32)
    mask = elev == np.float32(nodata)
    filled = edge_fill_nodata(elev, nodata)
    dzdx, dzdy = np.gradient(filled, pixel_w, pixel_h)
    slope = np.arctan(np.hypot(dzdx, dzdy)) / RADIANS_PER_DEGREE
    aspect = np.mod(450.0 - np.arctan2(dzdy, -dzdx) / RADIANS_PER_DEGREE,
                    360.0)
    slope[mask] = nodata
    aspect[mask] = nodata
    return slope, aspect


def slope_in_aspect(slope_data: np.ndarray, aspect_data: np.ndarray,
                    aspect_value: int) -> np.ndarray:
    """Slope restricted to one aspect class; everywhere else -1 (upslope),
    nodata propagated."""
    out = np.full(slope_data.shape, -1.0, dtype=np.float64)
    out[slope_data == NODATA] = NODATA
    sel = aspect_data == aspect_value
    out[sel] = slope_data[sel]
    return out


def _shift(arr: np.ndarray, dr: int, dc: int, fill) -> np.ndarray:
    """out[i, j] = arr[i + dr, j + dc], `fill` outside the array."""
    rows, cols = arr.shape
    out = np.full_like(arr, fill)
    r_lo, r_hi = max(0, -dr), min(rows, rows - dr)
    c_lo, c_hi = max(0, -dc), min(cols, cols - dc)
    if r_lo < r_hi and c_lo < c_hi:
        out[r_lo:r_hi, c_lo:c_hi] = arr[r_lo + dr:r_hi + dr,
                                        c_lo + dc:c_hi + dc]
    return out


def convo(a_dir: str, veg_data, slope_data, aspect_data, pixel_width, fdi,
          valid: np.ndarray | None = None,
          veg_idx: np.ndarray | None = None,
          slope_idx: np.ndarray | None = None,
          out_window: tuple | None = None,
          index_palette: np.ndarray | None = None,
          comb_hit_base: tuple | None = None) -> np.ndarray:
    """Directional neighbourhood scan: max BAL contributed by neighbours up
    to 100 m along ``a_dir``.

    Vectorized equivalent of the reference's per-pixel loop: for step
    ``m = 1..filter_width`` the neighbour distance is the constant
    ``(m - 0.5) * dire_width``, so each step is one gather through an 8x8
    (slope-class x veg-class) BAL table followed by a running max.  Cells
    with zero in-raster neighbours yield -99; ``valid=False`` cells (outside
    the global raster, in tiled mode) are excluded from every scan, which
    reproduces the border clamp of the whole-raster implementation.
    Diagonal step length uses the reference's literal 1.414 factor
    (calculate_bal.py:167).

    ``out_window`` (r0, r1, c0, c1) restricts the OUTPUT to that sub-
    rectangle of the input arrays (neighbour reads still span the full
    arrays) and returns an array of shape (r1-r0, c1-c0).  The tiled
    pipeline uses it to compute only the core tile of an assembled
    tile+halo window -- identical values, ~25% fewer gather/max writes.
    Only supported on the ``valid is None`` fast path.

    ``index_palette`` (fast path only): a SORTED ascending array holding
    every value the BAL table can produce plus NODATA.  The scan then
    runs entirely in uint8 palette-INDEX domain -- the running max over
    indices selects the same element as the max over values (sorted
    palette, strictly increasing), while the gather/max loop moves 4x
    fewer bytes -- and returns uint8 indices instead of float values
    (cells with no neighbour get NODATA's index).  Exactly
    ``searchsorted(index_palette, float_result)``; the LUT projection
    asserts every table value is present in the palette.
    """
    veg = np.asarray(veg_data)      # any float dtype: values are classes
    slope = np.asarray(slope_data)  # (exact in float32), so no upcast
    aspect = np.asarray(aspect_data)

    dire_width = pixel_width if a_dir in ("w", "e", "n", "s") \
        else pixel_width * 1.414
    filter_width = int(np.ceil(100.0 / dire_width))
    dr, dc = DIR_OFFSETS[a_dir]

    if valid is None and slope_idx is not None:
        # slope_in_aspect as pure index arithmetic (no per-direction
        # searchsorted): aspect match -> the slope's own class index,
        # else index of -1 ("upslope", SLOPE_KEYS[1]) unless the slope is
        # nodata (SLOPE_KEYS[0]) -- exactly slope_in_aspect's value map.
        # Only the aspect compare is direction-dependent: the hit/miss
        # combined indices are hoisted by compute_bal (comb_hit_base) so
        # the 8-direction loop pays ONE compare + ONE where each, not
        # two wheres + mul + add + cast over the full window.
        if comb_hit_base is not None:
            hit8, base8 = comb_hit_base
        else:
            if veg_idx is None:
                veg_idx = class_index(veg, VEG_KEYS)
            hit8 = (slope_idx * len(VEG_KEYS) + veg_idx).astype(np.int8)
            base8 = (np.where(slope == NODATA, 0, 1) * len(VEG_KEYS)
                     + veg_idx).astype(np.int8)
        comb = np.where(aspect == DIRE_ASPECT[a_dir], hit8, base8)
    else:
        sia = slope_in_aspect(slope, aspect, DIRE_ASPECT[a_dir])
        if valid is not None:
            sia = np.where(valid, sia, NODATA)
            veg = np.where(valid, veg, NODATA)
            veg_idx = None              # masked veg differs per direction
        if veg_idx is None:
            veg_idx = class_index(veg, VEG_KEYS)

        # combined (slope, veg) class index 0..63 for flat LUT gathers;
        # int8 keeps the shifted copies bandwidth-friendly on wide hosts
        comb = (class_index(sia, SLOPE_KEYS) * len(VEG_KEYS)
                + veg_idx).astype(np.int8)
    rows, cols = comb.shape
    if out_window is not None and valid is not None:
        raise ValueError("out_window requires the valid=None fast path")
    if index_palette is not None and valid is not None:
        raise ValueError("index_palette requires the valid=None fast path")
    wr0, wr1, wc0, wc1 = (0, rows, 0, cols) if out_window is None \
        else out_window
    if index_palette is not None:
        # uint8 index domain.  NODATA must be the palette minimum
        # (index 0): 0 is then both the max identity (a cell with >= 1
        # in-reach step takes max(0, gathered) = its float-path value's
        # index, since index 0 IS the -99 value) and the zero-neighbour
        # result the float path assigns via its -inf -> NODATA fill.
        pal = np.asarray(index_palette, dtype=np.float32)
        if len(pal) > 255 or pal[0] != np.float32(NODATA):
            raise ValueError("index_palette must hold NODATA first and "
                             "at most 255 values")
        out = np.zeros((wr1 - wr0, wc1 - wc0), dtype=np.uint8)
    else:
        out = np.full((wr1 - wr0, wc1 - wc0), -np.inf, dtype=np.float32)

    if valid is None:
        # every in-array cell is valid, so the "neighbour exists" mask for
        # step m is just a rectangle -- pure slice arithmetic, no shifted
        # mask copies and no masked maximum.  The gather temp is one reused
        # scratch buffer: materializing lut[src] fresh each step costs a
        # ~1 MB allocation x 28 steps per cell, pure memory-bandwidth churn
        # at full core counts
        scratch = np.empty((min(64, wr1 - wr0), wc1 - wc0),
                           dtype=out.dtype)
        steps = []
        for m in range(1, filter_width + 1):
            dist = (m - 1) * dire_width + 0.5 * dire_width
            lut = bal_lut(fdi, dist).reshape(-1)
            if index_palette is not None:
                idx = np.searchsorted(pal, lut.astype(np.float32))
                idx = np.minimum(idx, len(pal) - 1)
                if not np.array_equal(pal[idx], lut.astype(np.float32)):
                    raise ValueError(
                        "index_palette is missing BAL table values")
                lut = idx.astype(np.uint8)
            dr_m, dc_m = m * dr, m * dc
            r_lo, r_hi = max(0, -dr_m, wr0), min(rows, rows - dr_m, wr1)
            c_lo, c_hi = max(0, -dc_m, wc0), min(cols, cols - dc_m, wc1)
            if max(0, -dr_m) >= min(rows, rows - dr_m) \
                    or max(0, -dc_m) >= min(cols, cols - dc_m):
                break                   # no further step reaches the array
            if r_lo < r_hi and c_lo < c_hi:
                steps.append((lut, dr_m, dc_m, r_lo, r_hi, c_lo, c_hi))
        # cache blocking: run every filter step over one ~64-row chunk
        # before moving on, so the chunk's out/comb/scratch rows stay in L2
        # across steps instead of streaming the full arrays from DRAM
        # filter_width times -- the ratio-killer when all cores share one
        # memory bus
        blk = 64
        for rb in range(wr0, wr1, blk):
            rb_hi = min(wr1, rb + blk)
            for lut, dr_m, dc_m, r_lo, r_hi, c_lo, c_hi in steps:
                lo, hi = max(r_lo, rb), min(r_hi, rb_hi)
                if lo >= hi:
                    continue
                dst = out[lo - wr0:hi - wr0, c_lo - wc0:c_hi - wc0]
                src = comb[lo + dr_m:hi + dr_m, c_lo + dc_m:c_hi + dc_m]
                t = scratch[:hi - lo, :c_hi - c_lo]
                np.take(lut, src, out=t)
                np.maximum(dst, t, out=dst)
        if index_palette is not None:
            return out          # zero-neighbour cells kept index 0 = -99
        # cells outside the 1-step rectangle have zero neighbours -> -99
        out[np.isneginf(out)] = NODATA
        return out

    valid_u8 = valid.astype(np.uint8)
    any_neighbour = np.zeros(comb.shape, dtype=bool)
    for m in range(1, filter_width + 1):
        dist = (m - 1) * dire_width + 0.5 * dire_width
        lut = bal_lut(fdi, dist).reshape(-1)
        comb_m = _shift(comb, m * dr, m * dc, 0)
        valid_m = _shift(valid_u8, m * dr, m * dc, 0).astype(bool)
        bal_m = lut[comb_m]
        np.maximum(out, bal_m, where=valid_m, out=out)
        any_neighbour |= valid_m
    out[~any_neighbour] = NODATA
    return out


def max_bal(bal_list) -> np.ndarray:
    """Elementwise max across direction outputs."""
    return np.maximum.reduce([np.asarray(a) for a in bal_list])


def compute_bal(veg_class, slope_class, aspect_class, pixel_width, fdi,
                valid: np.ndarray | None = None,
                out_window: tuple | None = None,
                index_palette: np.ndarray | None = None
                ) -> dict[str, np.ndarray]:
    """All 8 directional BAL grids plus their elementwise max, from one set
    of classified inputs (the whole-raster orchestration of
    ``calculate_bal.py:21-101``, minus the file I/O).  ``out_window``
    restricts every band to that (r0, r1, c0, c1) sub-rectangle;
    ``index_palette`` switches every band (max included -- the sorted
    palette makes index max and value max pick the same element) to
    uint8 palette indices (see :func:`convo`)."""
    out = {}
    veg_idx = slope_idx = hit_base = None
    if valid is None:
        veg_idx = class_index(np.asarray(veg_class), VEG_KEYS)
        slope_idx = class_index(np.asarray(slope_class), SLOPE_KEYS)
        slope_arr = np.asarray(slope_class)
        hit8 = (slope_idx * len(VEG_KEYS) + veg_idx).astype(np.int8)
        base8 = (np.where(slope_arr == NODATA, 0, 1) * len(VEG_KEYS)
                 + veg_idx).astype(np.int8)
        hit_base = (hit8, base8)
    for a_dir in DIRECTIONS:
        out[a_dir] = convo(a_dir, veg_class, slope_class, aspect_class,
                           pixel_width, fdi, valid=valid, veg_idx=veg_idx,
                           slope_idx=slope_idx, out_window=out_window,
                           index_palette=index_palette,
                           comb_hit_base=hit_base)
    out["max"] = max_bal([out[d] for d in DIRECTIONS])
    return out
