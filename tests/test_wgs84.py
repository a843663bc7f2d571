"""WGS84 ellipsoidal geodesic validation (geo/wgs84.py) against
independent offline oracles -- no pyproj in the sandbox, so every
oracle is a formula that shares NO series machinery with Vincenty:

* exact ECEF chords (closed-form geodetic->cartesian) for short lines,
* Gauss-Legendre quadrature of the meridian curvature integral,
* the closed-form equatorial arc s = a * dlon,
* RK4 integration of the geodesic ODEs for free-azimuth 100 km lines,
* Gauss-Legendre quadrature of the M*N*cos(phi) area integrand.

The published WGS84 quarter meridian (10 001 965.729 m) anchors the
absolute scale.  All geodesic assertions are at the <= 1 mm level on
100 m - 100 km lines (the reference-parity requirement vs pyproj
Geod.inv, xx_fiona_testing.py:205-218)."""

import numpy as np
import pytest

from balrog_ray.geo.wgs84 import (
    AUTHALIC_R,
    WGS84_A,
    ecef,
    ellipsoidal_polygon_area_m2,
    ellipsoidal_ring_area_m2,
    geodesic_rk4,
    meridian_arc_m,
    quadrangle_area_quadrature,
    wgs84_forward,
    wgs84_inverse,
    wgs84_point_buffer,
)
from balrog_ray.geo.geometry import Polygon

MM = 1e-3


def test_quarter_meridian_published_value():
    # the canonical WGS84 constant, to the published millimetre
    assert abs(meridian_arc_m(0.0, 90.0) - 10_001_965.729) < 1e-2
    s, _, _ = wgs84_inverse(0.0, 0.0, 0.0, 90.0)
    assert abs(s - 10_001_965.729) < 1e-2


@pytest.mark.parametrize("lat1,dlat", [(-35.0, 100 / 110_574.0),
                                       (-35.0, 0.9), (10.0, 0.45),
                                       (55.0, 0.9)])
def test_meridian_lines_match_quadrature(lat1, dlat):
    s, azi1, _ = wgs84_inverse(10.0, lat1, 10.0, lat1 + dlat)
    assert abs(s - meridian_arc_m(lat1, lat1 + dlat)) < MM
    assert abs(azi1 - 0.0) < 1e-9


@pytest.mark.parametrize("dlon", [0.001, 0.1, 0.9])
def test_equator_closed_form(dlon):
    s, azi1, _ = wgs84_inverse(10.0, 0.0, 10.0 + dlon, 0.0)
    assert abs(s - WGS84_A * np.deg2rad(dlon)) < MM
    assert abs(azi1 - 90.0) < 1e-9


def test_short_lines_match_ecef_chord():
    # at 100 m the geodesic exceeds the straight chord by
    # ~ chord^3 / (24 R^2) ~ 1e-9 m: the chord IS the oracle to 1 um
    rng = np.random.default_rng(42)
    for _ in range(25):
        lon = rng.uniform(-179, 179)
        lat = rng.uniform(-65, 65)
        az = rng.uniform(0, 360)
        lon2, lat2, _ = wgs84_forward(lon, lat, az, 100.0)
        s, _, _ = wgs84_inverse(lon, lat, lon2, lat2)
        chord = np.linalg.norm(ecef(lon, lat) - ecef(lon2, lat2))
        assert abs(s - 100.0) < 0.1 * MM          # direct<->inverse
        assert abs(s - chord) < 0.1 * MM          # absolute truth


@pytest.mark.parametrize("az", [33.0, 147.0, 260.0, 359.0])
def test_100km_direct_matches_rk4_ode(az):
    lon2, lat2, az2 = wgs84_forward(115.0, -32.0, az, 100_000.0)
    rlon, rlat, raz = geodesic_rk4(115.0, -32.0, az, 100_000.0)
    sep, _, _ = wgs84_inverse(lon2, lat2, rlon, rlat)
    assert sep < MM
    assert abs(az2 - raz) < 1e-6


def test_inverse_symmetry_and_vectorization():
    lons = np.array([115.0, 116.2, 117.4])
    lats = np.array([-32.0, -31.5, -33.1])
    lons2 = np.array([118.0, 114.9, 116.6])
    lats2 = np.array([-30.7, -33.8, -31.2])
    s_ab, a_ab, b_ab = wgs84_inverse(lons, lats, lons2, lats2)
    s_ba, a_ba, b_ba = wgs84_inverse(lons2, lats2, lons, lats)
    assert np.allclose(s_ab, s_ba, atol=1e-9)
    # forward azimuth at B of A->B is the back continuation of B->A
    assert np.allclose((a_ba + 180.0) % 360.0, b_ab % 360.0, atol=1e-7)
    # coincident points
    s0, a0, _ = wgs84_inverse(115.0, -32.0, 115.0, -32.0)
    assert s0 == 0.0


def test_sphere_vs_ellipsoid_bias_is_the_documented_delta():
    # the spherical kit documents |error| < 0.6%; the ellipsoid must
    # disagree with the sphere by a real sub-percent amount (i.e. the
    # new path is NOT the old one renamed)
    from balrog_ray.geo.geodesic import haversine_m

    s_e, _, _ = wgs84_inverse(115.0, -32.0, 116.0, -32.5)
    s_s = float(haversine_m(115.0, -32.0, 116.0, -32.5))
    rel = abs(s_s - s_e) / s_e
    assert 1e-5 < rel < 6e-3


def test_area_quadrangle_matches_quadrature():
    ring = np.array([[115.0, -32.0], [116.0, -32.0], [116.0, -31.0],
                     [115.0, -31.0], [115.0, -32.0]])
    a_authalic = abs(ellipsoidal_ring_area_m2(ring))
    a_quad = quadrangle_area_quadrature(115.0, 116.0, -32.0, -31.0)
    assert abs(a_authalic - a_quad) / a_quad < 1e-12


def test_area_with_hole_and_sphere_bias():
    from balrog_ray.geo.geodesic import spherical_polygon_area_m2

    outer = np.array([[115.0, -32.0], [115.4, -32.0], [115.4, -31.6],
                      [115.0, -31.6], [115.0, -32.0]])
    hole = np.array([[115.1, -31.9], [115.2, -31.9], [115.2, -31.8],
                     [115.1, -31.8], [115.1, -31.9]])
    poly = Polygon(outer, [hole])
    a_e = ellipsoidal_polygon_area_m2(poly)
    a_outer = quadrangle_area_quadrature(115.0, 115.4, -32.0, -31.6)
    a_hole = quadrangle_area_quadrature(115.1, 115.2, -31.9, -31.8)
    assert abs(a_e - (a_outer - a_hole)) / (a_outer - a_hole) < 1e-12
    a_s = spherical_polygon_area_m2(poly)
    assert 1e-5 < abs(a_s - a_e) / a_e < 6e-3


def test_point_buffer_exact_radius():
    poly = wgs84_point_buffer(115.0, -32.0, 500.0, n_seg=16)
    for vx, vy in poly.exterior[:-1] if poly.exterior[-1][0] == 115.0 \
            else poly.exterior:
        s, _, _ = wgs84_inverse(115.0, -32.0, float(vx), float(vy))
        assert abs(s - 500.0) < 0.1 * MM


def test_spatial_join_wgs84_metric(ray_session):
    """kNN distance-to-veg with metric='geodesic_wgs84' reports the
    ellipsoidal metres for the same winner the degree-space tree picks;
    parity against a direct wgs84_inverse recomputation."""
    import pyarrow as pa

    from balrog_ray.geo.wkb import polygon_to_wkb
    from balrog_ray.stages.spatial_join import _PolyIndex

    # a small lon/lat square polygon near Perth
    ring = np.array([[115.00, -32.00], [115.01, -32.00],
                     [115.01, -31.99], [115.00, -31.99],
                     [115.00, -32.00]])
    polys = pa.table({
        "gid": pa.array([1], pa.int64()),
        "bal_number": pa.array([3], pa.int16()),
        "geom": pa.array([polygon_to_wkb(Polygon(ring))], pa.binary())})
    idx = _PolyIndex(polys)
    sites_x = np.array([115.02, 115.005, 114.95])
    sites_y = np.array([-31.995, -31.995, -32.05])
    out = idx.join_points(
        pa.array([0, 1, 2], pa.int64()), pa.array(sites_x),
        pa.array(sites_y), max_dist=20_000.0, metric="geodesic_wgs84")
    d = out.column("distance_m").to_numpy()
    assert out.column("in_gid").to_numpy()[1] == 1 and d[1] == 0.0
    # site 0: nearest point is on the east edge (lon 115.01, same lat)
    s0, _, _ = wgs84_inverse(115.02, -31.995, 115.01, -31.995)
    assert abs(d[0] - s0) < 1e-6
    # the sphere metric must differ from the ellipsoid by the
    # documented sub-percent bias (distinct code paths)
    out_s = idx.join_points(
        pa.array([0], pa.int64()), pa.array(sites_x[:1]),
        pa.array(sites_y[:1]), max_dist=20_000.0,
        metric="geodesic_sphere")
    ds0 = out_s.column("distance_m").to_numpy()[0]
    assert 0 < abs(ds0 - d[0]) / d[0] < 6e-3


def test_near_antipodal_fallback_properties():
    """Vincenty diverges past ~179.4 deg; the multi-seed shooting
    fallback must return a true geodesic (forward/RK4 endpoint checks,
    two independent integrators), symmetric, and SHORTEST in the
    Karney sense: a near-antipodal EQUATORIAL pair routes off the
    equator, beating the equatorial arc."""
    from balrog_ray.geo.wgs84 import (WGS84_A, geodesic_rk4,
                                      wgs84_forward, wgs84_inverse)

    s, a1, _ = wgs84_inverse(0.0, 0.0, 179.7, 0.0)
    # endpoint via the series direct solve: sub-mm
    lon_f, lat_f, _ = wgs84_forward(0.0, 0.0, a1, s)
    assert abs(float(lon_f) - 179.7) < 1e-9
    assert abs(float(lat_f)) < 1e-9
    # endpoint via RK4 ODE integration (no shared series): < 1e-7 deg
    lon_r, lat_r, _ = geodesic_rk4(0.0, 0.0, float(a1), float(s),
                                   n_steps=20000)
    assert abs(lon_r - 179.7) < 1e-7 and abs(lat_r) < 1e-7
    # Karney: the shortest path leaves the equator
    assert s < WGS84_A * np.deg2rad(179.7) - 1000.0
    assert min(abs(a1 - 90.0), abs(a1 - 270.0)) > 5.0
    assert 19_900_000 < s < 20_010_000
    # symmetry
    s2, _, _ = wgs84_inverse(179.7, 0.0, 0.0, 0.0)
    assert abs(s - s2) < 1e-3


def test_near_antipodal_off_equator_and_vector_mix():
    """A vectorized call mixing convergent and near-antipodal pairs:
    the fallback patches only its own entries."""
    from balrog_ray.geo.wgs84 import wgs84_forward, wgs84_inverse

    lon1 = np.array([115.0, 10.0])
    lat1 = np.array([-32.0, 20.0])
    lon2 = np.array([115.5, -169.8])     # [0]: ordinary, [1]: antipodal
    lat2 = np.array([-31.5, -19.9])
    s, a1, a2 = wgs84_inverse(lon1, lat1, lon2, lat2)
    # ordinary pair: same as a scalar Vincenty call
    s0, a10, _ = wgs84_inverse(115.0, -32.0, 115.5, -31.5)
    assert abs(float(s[0]) - float(s0)) < 1e-9
    assert abs(float(a1[0]) - float(a10)) < 1e-12
    # near-antipodal pair: true geodesic through the endpoint
    lon_f, lat_f, _ = wgs84_forward(10.0, 20.0, float(a1[1]),
                                    float(s[1]))
    assert abs(float(lon_f) + 169.8) < 1e-9
    assert abs(float(lat_f) + 19.9) < 1e-9
    assert 19_900_000 < float(s[1]) < 20_010_000
