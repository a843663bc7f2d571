"""AS 3959 (2009) Method-1 lookup tables, restructured as dense NumPy arrays.

The numeric content is the Australian Standard's Tables 2.4.2-2.4.5, the same
data the reference engine carries as nested dicts
(``/root/reference/utilities/bal_database.py:14-184``).  Here they are laid
out as dense ndarrays indexed by (fdi, slope-class, veg-class) so that the
per-neighbour BAL rule (``calculate_bal.py:248-297``) can be evaluated as a
single vectorized gather instead of a scalar dict walk.

Encodings
---------
* FDI values 100/80/50/40 -> axis index via :data:`FDI_INDEX`.
* Vegetation classes: 1 Forest, 2 Woodland, 3 Shrubland, 4 Scrub,
  5 Mallee/Mulga, 6 Rainforest, 7 Grassland/Tussock moorland.
* Slope classes: 1 flat(0 deg), 2 (0,5], 3 (5,10], 4 (10,15], 5 (15,20],
  6 >20 deg downslope; -1 means upslope, -99 nodata.
* BAL ratings by distance class 1..5: 100 (FZ-adjacent), 40, 29, 19, 12.5.
"""

from __future__ import annotations

import functools

import numpy as np

NODATA = -99.0
UPSLOPE = -1.0
FLAME_ZONE = 200.0

FDI_VALUES = (100, 80, 50, 40)
FDI_INDEX = {100: 0, 80: 1, 50: 2, 40: 3}

VEG_CLASSES = (1, 2, 3, 4, 5, 6, 7)
SLOPE_CLASSES = (1, 2, 3, 4, 5, 6)

#: BAL rating per distance class 1..5 (AS 3959 Table 2.4.2 column heads).
BAL_RATING = np.array([100.0, 40.0, 29.0, 19.0, 12.5])

# Distance upper limits (m) for upslope / flat land.
# Shape (4 fdi, 7 veg, 4 thresholds); row order = veg class 1..7.
DIST_LIMIT_UPSLOPE = np.array([
    # FDI 100
    [[19, 25, 35, 48], [12, 16, 24, 33], [7, 9, 13, 19], [10, 13, 19, 27],
     [6, 8, 12, 17], [8, 11, 16, 23], [6, 9, 13, 19]],
    # FDI 80
    [[16, 21, 31, 42], [10, 14, 20, 29], [7, 9, 13, 19], [10, 13, 19, 27],
     [6, 8, 12, 17], [6, 9, 13, 19], [6, 8, 12, 17]],
    # FDI 50
    [[12, 16, 23, 32], [7, 10, 15, 22], [7, 9, 13, 19], [10, 13, 19, 27],
     [6, 8, 12, 17], [5, 6, 9, 14], [7, 9, 14, 20]],
    # FDI 40
    [[10, 13, 20, 28], [6, 9, 13, 19], [7, 9, 13, 19], [10, 13, 19, 27],
     [6, 8, 12, 17], [4, 5, 8, 12], [4, 5, 8, 12]],
], dtype=np.float64)

# Distance upper limits (m) for downslope classes 2..5.
# Shape (4 fdi, 4 slope, 7 veg, 4 thresholds); slope axis = class 2,3,4,5.
DIST_LIMIT_DOWNSLOPE = np.array([
    # FDI 100
    [[[24, 32, 43, 57], [15, 21, 29, 41], [7, 10, 15, 22], [11, 15, 22, 31],
      [7, 9, 13, 20], [10, 14, 20, 29], [7, 10, 15, 22]],
     [[31, 39, 53, 69], [20, 26, 37, 50], [8, 11, 17, 25], [12, 17, 24, 35],
      [7, 10, 15, 23], [13, 18, 26, 36], [8, 11, 17, 25]],
     [[39, 49, 64, 82], [25, 33, 45, 60], [9, 13, 19, 28], [14, 19, 28, 39],
      [8, 11, 18, 26], [17, 23, 33, 45], [9, 13, 20, 28]],
     [[50, 61, 78, 98], [32, 41, 56, 73], [10, 15, 22, 31], [15, 21, 31, 43],
      [9, 13, 20, 29], [22, 29, 42, 56], [11, 15, 23, 32]]],
    # FDI 80
    [[[20, 27, 37, 50], [13, 17, 25, 35], [7, 10, 15, 22], [11, 15, 22, 31],
      [7, 9, 13, 20], [8, 11, 17, 24], [7, 9, 14, 20]],
     [[26, 33, 46, 61], [16, 22, 31, 43], [8, 11, 17, 25], [12, 17, 24, 35],
      [7, 10, 15, 23], [11, 15, 22, 31], [8, 10, 16, 23]],
     [[33, 42, 56, 73], [21, 28, 39, 53], [9, 13, 19, 28], [14, 19, 28, 39],
      [8, 11, 18, 26], [14, 19, 28, 39], [9, 12, 18, 26]],
     [[42, 52, 68, 87], [27, 35, 48, 64], [10, 15, 22, 31], [15, 21, 31, 43],
      [9, 13, 20, 29], [18, 25, 36, 48], [10, 14, 21, 30]]],
    # FDI 50
    [[[14, 19, 27, 38], [9, 12, 18, 26], [7, 10, 15, 22], [11, 15, 22, 31],
      [7, 9, 13, 20], [6, 8, 12, 17], [8, 10, 16, 23]],
     [[18, 24, 34, 46], [11, 15, 23, 32], [8, 11, 17, 25], [12, 17, 24, 35],
      [7, 10, 15, 23], [7, 10, 15, 22], [9, 12, 18, 26]],
     [[22, 30, 41, 56], [14, 19, 28, 40], [9, 13, 19, 28], [14, 19, 28, 39],
      [8, 11, 18, 26], [9, 13, 19, 28], [10, 13, 20, 29]],
     [[28, 37, 51, 67], [18, 25, 36, 48], [10, 15, 22, 31], [15, 21, 31, 43],
      [9, 13, 20, 29], [12, 17, 25, 35], [11, 15, 23, 33]]],
    # FDI 40
    [[[12, 16, 24, 34], [8, 11, 16, 23], [7, 10, 15, 22], [11, 15, 22, 31],
      [7, 9, 13, 20], [5, 7, 10, 15], [4, 6, 9, 14]],
     [[15, 20, 29, 41], [9, 13, 19, 28], [8, 11, 17, 25], [12, 17, 24, 35],
      [7, 10, 15, 23], [6, 8, 13, 19], [5, 7, 11, 16]],
     [[19, 25, 36, 49], [12, 16, 24, 35], [9, 13, 19, 28], [14, 19, 28, 39],
      [8, 11, 18, 26], [8, 11, 16, 24], [6, 8, 13, 19]],
     [[24, 31, 44, 59], [15, 21, 31, 42], [10, 15, 22, 31], [15, 21, 31, 43],
      [9, 13, 20, 29], [10, 14, 21, 30], [7, 9, 15, 22]]],
], dtype=np.float64)

# Ordered key vectors used to map raw class values onto dense LUT axes.
# Slope-in-aspect values can only be one of these 8 (nodata, upslope, 1..6);
# veg values one of these 8 (nodata, 1..7).
SLOPE_KEYS = np.array([-99.0, -1.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
VEG_KEYS = np.array([-99.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0])


def find_dist_class(dist, dist_limit):
    """Distance class 1..5 for ``dist`` against 4 strictly-less-than upper
    limits (semantics of ``calculate_bal.py:223-245``).  Vectorized: ``dist``
    may be scalar or ndarray."""
    limits = np.asarray(dist_limit, dtype=np.float64)
    return np.searchsorted(limits, np.asarray(dist, dtype=np.float64),
                           side="right") + 1


def bal_esti(veg, dist, slope, fdi):
    """Scalar per-neighbour BAL rule (parity with ``calculate_bal.py:248-297``).

    Kept as the readable oracle; the hot path uses :func:`bal_lut`.
    """
    if slope == NODATA:
        bal = NODATA
    elif slope == 6:  # downslope > 20 degrees
        bal = NODATA if veg == NODATA else FLAME_ZONE
    elif slope in (-1, 1):  # upslope or flat
        if veg == NODATA:
            bal = NODATA
        else:
            limits = DIST_LIMIT_UPSLOPE[FDI_INDEX[fdi], int(veg) - 1]
            bal = float(BAL_RATING[int(find_dist_class(dist, limits)) - 1])
    else:  # downslope classes 2..5
        if veg == NODATA:
            bal = NODATA
        else:
            limits = DIST_LIMIT_DOWNSLOPE[
                FDI_INDEX[fdi], int(slope) - 2, int(veg) - 1]
            bal = float(BAL_RATING[int(find_dist_class(dist, limits)) - 1])
    # Grassland special rule: for FDI != 50 the grassland table only extends
    # to 50 m; beyond that the neighbour contributes nodata
    # (calculate_bal.py:291-296).  Applies after every branch above,
    # including the slope-6 flame-zone result.
    if fdi != 50 and veg == 7 and dist >= 50:
        bal = NODATA
    return bal


@functools.lru_cache(maxsize=256)
def bal_lut(fdi: int, dist: float) -> np.ndarray:
    """Dense (slope_idx, veg_idx) -> BAL table for one (fdi, distance).

    Axis order follows :data:`SLOPE_KEYS` x :data:`VEG_KEYS`.  The
    directional scan evaluates neighbours at a fixed per-step distance, so
    one 8x8 gather table per step replaces per-pixel scalar rule
    evaluation; memoized since every cell of a layer shares the same
    (fdi, step-distance) set.
    """
    out = np.empty((len(SLOPE_KEYS), len(VEG_KEYS)), dtype=np.float32)
    for si, s in enumerate(SLOPE_KEYS):
        for vi, v in enumerate(VEG_KEYS):
            out[si, vi] = bal_esti(float(v), float(dist), float(s), fdi)
    return out


def class_index(values: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Map an array of class values onto dense LUT indices via ``keys``.

    ``keys`` must be sorted; every element of ``values`` must be a member
    (guaranteed for reclassified slope/veg/aspect rasters)."""
    return np.searchsorted(keys, values)
