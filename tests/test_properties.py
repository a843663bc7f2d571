"""Property-based invariants (hypothesis): codec round-trips, remap DSL
semantics, convo vs the scalar reference loop on arbitrary inputs."""

import numpy as np
from hypothesis import given, settings, strategies as st

from balrog_ray.core.remap import apply_remap
from balrog_ray.tiles.codec import decode_tile, encode_tile

finite_f32 = st.floats(min_value=-1e4, max_value=1e4, width=32,
                       allow_nan=False)


@st.composite
def small_grid(draw):
    h = draw(st.integers(2, 12))
    w = draw(st.integers(2, 12))
    vals = draw(st.lists(finite_f32, min_size=h * w, max_size=h * w))
    return np.array(vals, dtype=np.float32).reshape(h, w)


@given(small_grid())
@settings(max_examples=40, deadline=None)
def test_npy_npz_roundtrip_lossless(arr):
    for fmt in ("npy", "npz"):
        payload, cap = encode_tile(arr, fmt)
        back = decode_tile(payload, fmt, cap)
        assert np.array_equal(back, arr)


@given(small_grid())
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_psnr(arr):
    payload, cap = encode_tile(arr, "png")
    back = decode_tile(payload, "png", cap)
    rng = float(arr.max() - arr.min())
    if rng == 0.0:
        assert np.allclose(back, arr, atol=1e-3)
        return
    mse = float(np.mean((back.astype(np.float64) - arr) ** 2))
    psnr = 10 * np.log10(rng * rng / mse) if mse > 0 else np.inf
    assert psnr >= 40.0            # the driver's per-row invariant


@given(st.lists(st.floats(min_value=-80, max_value=120, allow_nan=False),
                min_size=1, max_size=64))
@settings(max_examples=60, deadline=None)
def test_remap_dsl_interval_semantics(values):
    """min-inclusive / max-exclusive-with-+0.0001-fudge; NODATA as an
    entry's new value; unmatched values pass through truncated to int
    (sa_tools.py:172-196)."""
    spec = "0 50 1;50.0001 100 2;100.0002 120 NODATA"
    data = np.array(values, dtype=np.float64)
    out = apply_remap(data, spec)
    for v, o in zip(values, out):
        if 0 <= v < 50.0001:
            assert o == 1
        elif 50.0001 <= v < 100.0001:
            assert o == 2
        elif 100.0002 <= v < 120.0001:
            assert o == -99
        else:
            assert o == int(v)      # truncation toward zero, like astype


@given(st.floats(-170, 170), st.floats(-80, 80),
       st.floats(-80, 80),
       st.lists(st.floats(-5e5, 5e5, allow_nan=False), min_size=2,
                max_size=8))
@settings(max_examples=60, deadline=None)
def test_crs_bridge_roundtrip_property(lon0, lat0, lat_ts, coords):
    """ProjToGeo / GeoToProj are exact inverses for any frame origin and
    standard parallel away from the poles."""
    from balrog_ray.stages.warp import ProjToGeo

    xy = np.array(coords)
    x, y = xy[: len(xy) // 2], xy[len(xy) // 2:][: len(xy) // 2]
    if not len(x):
        return
    tr = ProjToGeo(lon0, lat0, lat_ts)
    lon, lat = tr.apply(x, y)
    bx, by = tr.inverse().apply(lon, lat)
    # relative tolerance scaled to magnitude (catastrophic cancellation
    # near zero is bounded by the frame constant)
    assert np.allclose(bx, x, rtol=1e-9, atol=1e-4)
    assert np.allclose(by, y, rtol=1e-9, atol=1e-4)


@given(st.floats(-170, 170), st.floats(-75, 75),
       st.floats(1e3, 2e5), st.integers(8, 64))
@settings(max_examples=40, deadline=None)
def test_spherical_area_positive_and_winding_free(lon, lat, r, nseg):
    """Spherical polygon area is positive, winding-independent, and
    within the cap bound for geodesic circles of any radius/latitude."""
    from balrog_ray.geo.geodesic import (EARTH_R, geodesic_point_buffer,
                                         spherical_polygon_area_m2)
    from balrog_ray.geo.geometry import Polygon

    circle = geodesic_point_buffer(lon, lat, r, n_seg=nseg)
    a = spherical_polygon_area_m2(circle)
    cap = 2 * np.pi * EARTH_R ** 2 * (1 - np.cos(r / EARTH_R))
    assert 0 < a <= cap * 1.0001          # inscribed polygon <= cap
    rev = spherical_polygon_area_m2(Polygon(circle.exterior[::-1]))
    assert np.isclose(a, rev, rtol=1e-12)
