"""Remap-DSL parity tests (semantics of sa_tools.py:139-202) plus the three
canonical remap specs from tests/test_reclassify.py / bal.py:106-120."""

import numpy as np
from numpy.testing import assert_array_equal

from balrog_ray.core import remap

VEG_REMAP = ("1 3;2 2;3 3;4 5 7;6 8 1;9 2;10 3;11 12 1;13 1;14 3;15 6;16 7;"
             "17 3;18 19 2;20 7;21 3;22 2; 23 24 7;25 27 5;28 2;29 30 7;"
             "31 3;32 33 1;34 7;35 3;36 37 7;38 4;39 7;40 1;41 2;42 7;43 2;"
             "44 7;45 4;46 7;47 NODATA;97 2;98 99 1")


def scalar_oracle(value, spec):
    """Direct transcription of the reference's sequential remap loop."""
    v = float(value)
    for part in spec.split(";"):
        toks = part.lstrip().split(" ")
        if len(toks) == 2:
            lo, hi, new = float(toks[0]), float(toks[0]), toks[1]
        else:
            lo, hi, new = float(toks[0]), float(toks[1]), toks[2]
        hi += 0.0001
        if lo <= v < hi:
            v = -99.0 if new == "NODATA" else float(int(new))
    return int(v)


def test_veg_remap_all_sources():
    data = np.arange(0, 100, dtype=np.float64).reshape(10, 10)
    got = remap.apply_remap(data, VEG_REMAP)
    exp = np.array([[scalar_oracle(v, VEG_REMAP) for v in row]
                    for row in data])
    assert_array_equal(got, exp)


def test_aspect_remap():
    data = np.array([-1.0, 0.0, 10.0, 22.5, 22.6, 67.5, 100.0, 157.5, 200.0,
                     247.5, 292.5, 337.5, 350.0, 360.0])
    got = remap.apply_remap(data, remap.ASPECT_RECLASS)
    exp = np.array([scalar_oracle(v, remap.ASPECT_RECLASS) for v in data])
    assert_array_equal(got, exp)
    # boundary membership: the +0.0001 fudge includes each end value in its
    # own bin, and the next bin's start re-remaps it -> final value from the
    # LAST matching entry applied in order
    assert got[3] == exp[3]   # 22.5


def test_slope_remap_classes():
    spec = remap.slope_reclass()
    data = np.array([0.0, 0.0001, 4.9, 5.0, 5.0001, 10.0, 15.0, 20.0,
                     20.0001, 45.0, 89.9])
    got = remap.apply_remap(data, spec)
    exp = np.array([scalar_oracle(v, spec) for v in data])
    assert_array_equal(got, exp)
    # Reference quirk preserved: entries rewrite the SAME array in order, so
    # 0 -> class 1 is then caught by the [0.0001, 5.0001) range and becomes
    # class 2 (sa_tools.py:174-194 operates in place on `data`).
    assert got[0] == 2 and got[-1] == 6
    # 5.0 is included in class 2 via the +0.0001 fudge
    assert got[3] == 2


def test_nvis_remap_nodata():
    got = remap.apply_remap(np.array([24.0, 25.0, 27.0, 99.0, 1.0]),
                            remap.NVIS_RECLASS)
    # 1 -> 6 (rainforest), then the sequential "5 13 2" range re-catches the
    # freshly written 6 and yields 2 -- reference in-place quirk again.
    assert_array_equal(got, np.array([-99, -99, -99, -99, 2]))
    exp = [scalar_oracle(v, remap.NVIS_RECLASS)
           for v in [24.0, 25.0, 27.0, 99.0, 1.0]]
    assert_array_equal(got, np.array(exp))


def test_single_value_entries():
    got = remap.apply_remap(np.array([9.0, 14.0, 2.0]), VEG_REMAP)
    assert_array_equal(got, np.array([2, 3, 2]))
