"""Range-remap ("reclassify") DSL: parse + vectorized apply.

Implements the semantics of the reference's remap-string reclassifier
(``/root/reference/utilities/sa_tools.py:139-202``):

* spec = ``"lo hi new;lo hi new;..."``; a 2-token entry ``"v new"`` means the
  single value ``v``;
* each range is min-inclusive / max-exclusive after the end value is expanded
  by ``+0.0001`` (so the written end value itself is included);
* ``new == "NODATA"`` maps to -99;
* entries are applied **in order onto the same array**, so a later range can
  re-remap the output of an earlier one (observable with overlapping specs —
  we reproduce the sequential behaviour exactly rather than using a single
  ``np.digitize``);
* the result is cast to int at the end.

The canonical specs (NVIS veg, slope-6-class, aspect-9-class) used by the
reference pipeline (``bal.py:106-120``, ``docs/userguide/examples.rst:42-43``)
are exposed as constants.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

NODATA_INT = -99

#: aspect degrees -> 9 classes (N=1..NW=8, flat/none=9); bal.py:106-108
ASPECT_RECLASS = ("-1 0 9;0 22.5 1;22.5 67.5 2;67.5 112.5 3;112.5 157.5 4;"
                  "157.5 202.5 5;202.5 247.5 6;247.5 292.5 7;292.5 337.5 8;"
                  "337.5 360 1")

#: slope degrees -> 6 classes; the reference computes the final bin's end
#: from the raster's global max (bal.py:110-120); slope cannot exceed 90 deg
#: so a 90 end bound is semantically identical.
def slope_reclass(max_slope: float = 90.0) -> str:
    return ("0 0 1;0.0001 5 2;5.0001 10 3;10.0001 15 4;15.0001 20 5;"
            f"20.0001 {max_slope} 6")


#: the Gen-1 toolbox's NVIS remap STRING (docs/userguide/examples.rst:42-43)
#: -- NB under the toolbox's SEQUENTIAL application (sa_tools.py:174-194)
#: entry "1 6" maps MVG 1 to 6, which the later "5 13 2" range re-captures
#: to 2; use :data:`NVIS_LOOKUP` for the value-keyed Gen-2 semantics.
NVIS_RECLASS = ("1 6;2 1;3 1;4 1;5 13 2;14 5;15 18 3;19 22 7;23 4;"
                "24 25 NODATA;26 4;27 28 NODATA;29 4;30 1;31 2;32 5;"
                "99 NODATA")

#: value-keyed NVIS MVG -> AS 3959 class, exactly the PostGIS lookup UPDATEs
#: (02_create_nvis_bal_map_table.sql:15-62, incl. the mangrove fix: 23 is
#: 'not applicable', not scrub); -9999 = not applicable.
NVIS_NA = -9999
NVIS_LOOKUP = {
    1: 6,
    **{m: 1 for m in (2, 3, 4, 30)},
    **{m: 2 for m in (5, 6, 7, 8, 9, 10, 11, 12, 13, 31)},
    **{m: 3 for m in (15, 16, 17, 18)},
    **{m: 4 for m in (26, 29)},
    **{m: 5 for m in (14, 32)},
    **{m: 7 for m in (19, 20, 21, 22)},
    **{m: NVIS_NA for m in (23, 24, 25, 27, 28, 99)},
}


def apply_nvis_lookup(mvg: np.ndarray) -> np.ndarray:
    """Vectorized value-keyed MVG -> BAL class; unknown MVGs -> -9999
    (the SQL's NULL-visibility convention)."""
    lut = np.full(100, NVIS_NA, dtype=np.int64)
    for m, c in NVIS_LOOKUP.items():
        lut[m] = c
    m = np.asarray(mvg, dtype=np.int64)
    out = np.full(m.shape, NVIS_NA, dtype=np.int64)
    ok = (m >= 0) & (m < 100)
    out[ok] = lut[m[ok]]
    return out


@dataclass(frozen=True)
class RemapEntry:
    start: float
    end: float          # already expanded by +0.0001
    new_value: float    # NODATA -> -99


def parse_remap(spec: str) -> list[RemapEntry]:
    entries = []
    for part in spec.split(";"):
        tokens = part.lstrip().split(" ")
        if len(tokens) == 2:
            start, end, new = float(tokens[0]), float(tokens[0]), tokens[1]
        else:
            start, end, new = float(tokens[0]), float(tokens[1]), tokens[2]
        end += 0.0001
        value = float(NODATA_INT) if new == "NODATA" else float(int(new))
        entries.append(RemapEntry(start, end, value))
    return entries


def apply_remap(data: np.ndarray, spec: str | list[RemapEntry],
                out_dtype=np.int32) -> np.ndarray:
    """Apply a remap spec to an array, sequentially per entry.

    Returns an int array; values not covered by any range pass through
    (truncated to int), mirroring the reference behaviour.
    """
    entries = parse_remap(spec) if isinstance(spec, str) else spec
    work = np.asarray(data, dtype=np.float64).copy()
    for e in entries:
        sel = (work >= e.start) & (work < e.end)
        work[sel] = e.new_value
    return work.astype(out_dtype)
