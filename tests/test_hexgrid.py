"""Hex grid invariants: center roundtrip, nearest-center optimality,
k-ring cardinality, cube distance."""

import numpy as np

from balrog_ray.geo.hexgrid import (hex_center, hex_distance, hex_kring,
                                    hex_of)


def test_center_roundtrip():
    qs, rs = np.meshgrid(np.arange(-5, 6), np.arange(-5, 6))
    qs, rs = qs.ravel(), rs.ravel()
    x, y = hex_center(qs, rs, 7.3)
    gq, gr = hex_of(x, y, 7.3)
    assert (gq == qs).all() and (gr == rs).all()


def test_assignment_is_nearest_center():
    rng = np.random.default_rng(3)
    x = rng.uniform(-200, 200, 500)
    y = rng.uniform(-200, 200, 500)
    s = 11.0
    hq, hr = hex_of(x, y, s)
    cx, cy = hex_center(hq, hr, s)
    d_own = np.hypot(x - cx, y - cy)
    # no other cell center in the 2-ring is strictly closer
    for dq, dr in set(hex_kring(0, 0, 2)) - {(0, 0)}:
        ox, oy = hex_center(hq + dq, hr + dr, s)
        d_other = np.hypot(x - ox, y - oy)
        assert (d_own <= d_other + 1e-9).all()
    # and every point is inside its cell's circumradius
    assert (d_own <= s + 1e-9).all()


def test_kring_and_distance():
    for k in (0, 1, 2, 4):
        ring = hex_kring(3, -2, k)
        assert len(ring) == 1 + 3 * k * (k + 1)
        assert len(set(ring)) == len(ring)
        d = hex_distance(3, -2, [q for q, _ in ring],
                         [r for _, r in ring])
        assert d.max() == (k if k else 0)
    assert hex_distance(0, 0, 3, -1) == 3
    assert hex_distance(2, -1, 2, -1) == 0
