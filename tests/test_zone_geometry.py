"""Zonal geometry: integer partials vs a per-pixel loop oracle,
descriptor semantics on known shapes, and distributed == whole-raster
exact parity through the radius-1 halo plan."""

import math

import numpy as np
import pyarrow as pa
import pytest

from balrog_ray.stages.halo import GridSpec
from balrog_ray.stages.zone_geometry import (
    derive_descriptors, zone_geometry_whole, zone_partials,
)
from balrog_ray.tiles.synth import SynthConfig
from test_hydrology import _mosaic, _tiles_from_array  # noqa: F401

ND = -99.0


def _classy(shape, seed, n_classes=4, nodata_frac=0.05):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, n_classes + 1,
                     (shape[0] // 4 + 1, shape[1] // 4 + 1))
    a = np.kron(a, np.ones((4, 4), np.int64))[:shape[0], :shape[1]]
    a = a.astype(np.float32)
    a[rng.random(shape) < nodata_frac] = ND
    return a


def _brute(arr):
    """Per-pixel loop: moments in python ints, perimeter by face."""
    H, W = arr.shape
    acc = {}
    for r in range(H):
        for c in range(W):
            v = arr[r, c]
            if v == np.float32(ND):
                continue
            z = float(v)
            n, sx, sy, sxx, syy, sxy, p = acc.get(
                z, (0, 0, 0, 0, 0, 0, 0))
            exp = 0
            for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
                rr, cc = r + dy, c + dx
                if not (0 <= rr < H and 0 <= cc < W):
                    exp += 1
                elif arr[rr, cc] != v:
                    exp += 1
            acc[z] = (n + 1, sx + c, sy + r, sxx + c * c, syy + r * r,
                      sxy + r * c, p + exp)
    return acc


@pytest.mark.parametrize("seed", [0, 3])
def test_partials_match_bruteforce(seed):
    arr = _classy((30, 26), seed)
    got = zone_partials(arr, ND, x0=0, y0=0)
    want = _brute(arr)
    assert got == want


def test_descriptors_on_known_shapes():
    # 10x10 square of zone 1 inside background zone 2
    a = np.full((20, 20), 2.0, np.float32)
    a[5:15, 5:15] = 1.0
    tab = zone_geometry_whole(a, ND).to_pydict()
    i = tab["zone"].index(1.0)
    assert tab["area_px"][i] == 100
    assert tab["perimeter_px"][i] == 40
    assert tab["centroid_x"][i] == pytest.approx(9.5)
    assert tab["centroid_y"][i] == pytest.approx(9.5)
    # square: mu20 == mu02, mu11 == 0, eccentricity 0
    assert tab["mu20"][i] == pytest.approx(tab["mu02"][i])
    assert tab["mu11"][i] == pytest.approx(0.0)
    assert tab["eccentricity"][i] == pytest.approx(0.0)
    # 2x12 horizontal bar: strongly eccentric, orientation ~ 0 (x-axis)
    b = np.full((16, 16), ND, np.float32)
    b[7:9, 2:14] = 5.0
    t2 = zone_geometry_whole(b, ND).to_pydict()
    assert t2["eccentricity"][0] > 0.95
    assert abs(t2["orientation"][0]) < 1e-9
    assert t2["perimeter_px"][0] == 2 * (2 + 12)


def test_partial_shift_consistency():
    """Global-coordinate partials: computing over two half-windows with
    the right offsets folds to the whole-array result."""
    arr = _classy((24, 24), seed=9)
    whole = zone_partials(arr, ND, x0=0, y0=0)
    left = zone_partials(arr[:, :12], ND, x0=0, y0=0,
                         core=(0, 24, 0, 12))
    right = zone_partials(arr[:, 11:], ND, x0=11, y0=0,
                          core=(0, 24, 1, 13))
    # perimeter needs the true neighbour across the split: give each
    # side a 1-col halo (left lacks it; use the padded split instead)
    lpad = zone_partials(arr[:, :13], ND, x0=0, y0=0,
                         core=(0, 24, 0, 12))
    fold = {}
    for part in (lpad, right):
        for z, v in part.items():
            cur = fold.get(z, (0,) * 7)
            fold[z] = tuple(a + b for a, b in zip(cur, v))
    assert fold == whole
    del left


@pytest.mark.usefixtures("ray_session")
def test_distributed_matches_whole():
    import ray
    import ray.data

    from balrog_ray.stages.zone_geometry import zone_geometry

    cfg = SynthConfig(tiles_x=3, tiles_y=2, tile_px=16)
    arr = _classy((32, 48), seed=17)
    spec = GridSpec(cfg.tiles_x, cfg.tiles_y, cfg.tile_px,
                    cfg.pixel_size, y_north=cfg.y_north)
    ds = ray.data.from_arrow(_tiles_from_array(arr, cfg, layer="veg"))
    got = zone_geometry(ds, spec, layer="veg").to_pandas()
    want = zone_geometry_whole(arr, ND).to_pandas()
    got = got.sort_values("zone").reset_index(drop=True)
    want = want.sort_values("zone").reset_index(drop=True)
    assert got.equals(want), f"\n{got}\nvs\n{want}"


def test_coordinate_bound_gate():
    arr = np.ones((4, 4), np.float32)
    with pytest.raises(ValueError, match="2\\^21"):
        zone_partials(arr, ND, x0=(1 << 21), y0=0)
