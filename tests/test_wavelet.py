"""Haar DWT: scalar 2x2 loop oracle, bit-exact perfect reconstruction,
orthonormal energy conservation, tiled stage == whole-array subbands."""

import numpy as np
import pyarrow as pa
import pytest

from balrog_ray.stages.wavelet import (haar2_kernel, haar2_level,
                                       haar_dwt, ihaar2_kernel,
                                       subband_energy)
from balrog_ray.tiles.codec import Caption, decode_tile
from balrog_ray.tiles.synth import SynthConfig
from tests.test_filters import ND, _tiles_from_array


def test_level_matches_scalar_loop():
    rng = np.random.default_rng(41)
    a = rng.uniform(-30, 90, (8, 10)).astype(np.float32)
    ll, lh, hl, hh = haar2_level(a)
    for by in range(4):
        for bx in range(5):
            p = a[2 * by:2 * by + 2, 2 * bx:2 * bx + 2].astype(
                np.float64)
            tl, tr, bl, br = p[0, 0], p[0, 1], p[1, 0], p[1, 1]
            assert ll[by, bx] == (tl + tr + bl + br) / 2.0
            assert lh[by, bx] == (tl + tr - bl - br) / 2.0
            assert hl[by, bx] == (tl - tr + bl - br) / 2.0
            assert hh[by, bx] == (tl - tr - bl + br) / 2.0


def test_perfect_reconstruction_and_energy():
    rng = np.random.default_rng(43)
    a = rng.uniform(-50, 150, (48, 64)).astype(np.float32)
    bands = haar2_kernel(a, 3)
    rec = ihaar2_kernel(bands, 3)
    assert np.array_equal(rec, a.astype(np.float64))   # bit-exact
    e_in = float((a.astype(np.float64) ** 2).sum())
    e_out = float(sum((c ** 2).sum() for c in bands.values()))
    assert np.isclose(e_in, e_out, rtol=1e-12)
    # 3 detail bands per level + final LL
    assert len(bands) == 10
    assert bands["dwt3_ll"].shape == (6, 8)


def test_shape_guard():
    with pytest.raises(ValueError, match="not divisible"):
        haar2_kernel(np.zeros((12, 12)), 3)


def test_tiled_matches_whole_and_energy(ray_session):
    import ray
    import ray.data

    cfg = SynthConfig(tiles_x=3, tiles_y=2, tile_px=32)
    wr, wc = cfg.tiles_y * cfg.tile_px, cfg.tiles_x * cfg.tile_px
    rng = np.random.default_rng(47)
    arr = rng.uniform(0, 80, (wr, wc)).astype(np.float32)
    tiles = ray.data.from_arrow(_tiles_from_array(arr, cfg))
    coef = haar_dwt(tiles, layer="dem", levels=2).materialize()

    want = {b: c.astype(np.float32)
            for b, c in haar2_kernel(arr, 2).items()}
    got = {b: np.full(c.shape, np.nan, np.float32)
           for b, c in want.items()}
    n = 0
    for row in coef.take_all():
        cap = Caption.from_json(row["caption"])
        t = decode_tile(row["bytes"], row["fmt"], cap)
        lv = int(cap.layer[3])
        s = cfg.tile_px >> lv
        got[cap.layer][cap.ty * s:(cap.ty + 1) * s,
                       cap.tx * s:(cap.tx + 1) * s] = t
        n += 1
    assert n == 6 * 7          # 6 tiles x (3*2 + 1) subband tiles
    for b in want:
        assert np.array_equal(got[b], want[b]), b

    # exact integer energy fold over the distributed coefficients
    e = {r["band"]: (r["sum(n_coef)"], r["sum(energy_milli)"])
         for r in subband_energy(coef).take_all()}
    assert set(e) == set(want)
    for b, c in want.items():
        n_c, e_m = e[b]
        assert n_c == c.size
        assert e_m == int(np.rint(c.astype(np.float64) ** 2
                                  * 1000.0).sum())


def test_nodata_policies(ray_session):
    import ray
    import ray.data

    cfg = SynthConfig(tiles_x=1, tiles_y=1, tile_px=16)
    arr = np.full((16, 16), 5.0, np.float32)
    arr[3, 3] = ND
    tiles = ray.data.from_arrow(_tiles_from_array(arr, cfg))
    with pytest.raises(Exception, match="nodata"):
        haar_dwt(tiles, levels=1).materialize()
    coef = haar_dwt(ray.data.from_arrow(_tiles_from_array(arr, cfg)),
                    levels=1, nodata_policy="zero").materialize()
    assert coef.count() == 4
