"""Slope/aspect kernel tests (parity with sa_tools.py:205-293): analytic
planes, nodata edge-fill sweeps, and the exact sweep quirks."""

import numpy as np
from numpy.testing import assert_allclose, assert_array_equal

from balrog_ray.core import kernels


def tilted_plane(rows, cols, gx, gy, pw=25.0):
    """z = gx * x + gy * y with x along columns, y along rows (row-major)."""
    r = np.arange(rows)[:, None] * pw
    c = np.arange(cols)[None, :] * pw
    return gx * c + gy * r


def test_slope_of_plane():
    # gradient along rows (axis 0) = 0.2, along cols (axis 1) = 0.1
    elev = tilted_plane(16, 16, gx=0.1, gy=0.2)
    slope, aspect = kernels.slope_aspect(elev, 25.0, 25.0)
    exp = np.degrees(np.arctan(np.hypot(0.2, 0.1)))
    # interior cells (centered differences are exact for a plane); the
    # kernel computes in float32 (the engine's raster precision), so the
    # bound is float32 roundoff, not exactness
    assert_allclose(slope[1:-1, 1:-1], exp, atol=1e-4)
    # one-sided edges are also exact on a plane
    assert_allclose(slope, exp, atol=1e-4)


def test_aspect_compass_convention():
    # The reference computes aspect = mod(450 - atan2(dzdy, -dzdx)/rad, 360)
    # with dzdx = d/d(axis0), dzdy = d/d(axis1) (sa_tools.py:270-280).
    # Verify against a direct per-case evaluation of that formula.
    for gx, gy in [(0.1, 0.0), (-0.1, 0.0), (0.0, 0.1), (0.0, -0.1),
                   (0.1, 0.1), (-0.05, 0.2)]:
        elev = tilted_plane(8, 8, gx, gy)
        _, aspect = kernels.slope_aspect(elev, 25.0, 25.0)
        dzdx, dzdy = gy, gx  # axis0 gradient, axis1 gradient
        exp = np.mod(450.0 - np.degrees(np.arctan2(dzdy, -dzdx)), 360.0)
        assert_allclose(aspect[2:-2, 2:-2], exp, atol=1e-4)


def test_nodata_masked_back():
    elev = tilted_plane(10, 10, 0.1, 0.1)
    elev[4:6, 4:6] = -99.0
    slope, aspect = kernels.slope_aspect(elev, 25.0, 25.0)
    assert np.all(slope[4:6, 4:6] == -99.0)
    assert np.all(aspect[4:6, 4:6] == -99.0)
    # cells away from the hole keep the plane slope
    assert_allclose(slope[1, 1], np.degrees(np.arctan(np.hypot(0.1, 0.1))),
                    atol=1e-4)


def scalar_edge_fill(elev, nodata=-99.0):
    """Direct transcription of the four sweeps (sa_tools.py:239-265),
    including the descending sweeps' negative-index wraparound."""
    a = np.array(elev, dtype=np.float64, copy=True)
    nx, ny = a.shape
    for i in range(ny):
        for j in range(nx - 1):
            if a[j + 1, i] == nodata and a[j, i] != nodata:
                a[j + 1, i] = a[j, i]
    for i in range(nx):
        for j in range(ny - 1):
            if a[i, j + 1] == nodata and a[i, j] != nodata:
                a[i, j + 1] = a[i, j]
    for i in range(ny):
        for j in range(nx - 1, -1, -1):
            if a[j, i] == nodata and a[j - 1, i] != nodata:
                a[j, i] = a[j - 1, i]
    for i in range(nx):
        for j in range(ny - 1, -1, -1):
            if a[i, j] == nodata and a[i, j - 1] != nodata:
                a[i, j] = a[i, j - 1]
    return a


def test_edge_fill_matches_scalar_sweeps():
    rng = np.random.default_rng(3)
    for trial in range(20):
        elev = rng.uniform(0, 100, size=(9, 11))
        holes = rng.random(elev.shape) < 0.35
        elev[holes] = -99.0
        assert_array_equal(kernels.edge_fill_nodata(elev),
                           scalar_edge_fill(elev))


def test_edge_fill_top_edge_and_wraparound():
    # nodata at the very top row exercises the descending sweeps' wraparound
    elev = np.full((5, 5), -99.0)
    elev[2:, :] = 7.0
    assert_array_equal(kernels.edge_fill_nodata(elev),
                       scalar_edge_fill(elev))
