"""ORB-style feature pipeline: deterministic extraction, exact Hamming
math, and a planted global shift recovered by descriptor matching +
translation consensus."""

import numpy as np

from balrog_ray.stages.features import (_POP, _hamming, brief_pattern,
                                        extract_features, match_features,
                                        translation_consensus)
from balrog_ray.stages.halo import GridSpec
from balrog_ray.tiles.synth import SynthConfig
from tests.test_filters import ND, _tiles_from_array

CFG = SynthConfig(tiles_x=3, tiles_y=2, tile_px=32)


def test_hamming_matches_bin():
    rng = np.random.default_rng(5)
    da = rng.integers(-2**62, 2**62, (6, 4)).astype(np.int64)
    db = rng.integers(-2**62, 2**62, (9, 4)).astype(np.int64)
    got = _hamming(da, db)
    for i in range(6):
        for j in range(9):
            want = sum(bin((int(da[i, w]) & (2**64 - 1))
                           ^ (int(db[j, w]) & (2**64 - 1))).count("1")
                       for w in range(4))
            assert got[i, j] == want


def test_extraction_deterministic(ray_session):
    import ray.data

    rng = np.random.default_rng(91)
    wr, wc = CFG.world_px
    world = rng.uniform(0, 100, (wr, wc)).astype(np.float32)
    ds = ray.data.from_arrow(_tiles_from_array(world, CFG))
    spec = GridSpec.from_synth(CFG)
    a = sorted(map(tuple, (tuple(r.values()) for r in
                           extract_features(ds, spec).take_all())))
    b = sorted(map(tuple, (tuple(r.values()) for r in
                           extract_features(ds, spec).take_all())))
    assert a == b
    assert len(a) > 20


def test_planted_shift_recovered_by_matching(ray_session):
    import ray.data

    rng = np.random.default_rng(97)
    wr, wc = CFG.world_px
    pad = 8
    big = rng.uniform(0, 100, (wr + 2 * pad, wc + 2 * pad)) \
        .astype(np.float32)
    a = big[pad:pad + wr, pad:pad + wc]
    b = big[pad - 2:pad - 2 + wr, pad - 3:pad - 3 + wc]
    spec = GridSpec.from_synth(CFG)
    fa = extract_features(
        ray.data.from_arrow(_tiles_from_array(a, CFG)), spec)
    fb = extract_features(
        ray.data.from_arrow(_tiles_from_array(b, CFG)), spec)
    matches = match_features(fa, fb)
    mrows = matches.take_all()
    assert len(mrows) > 10
    top = translation_consensus(matches).take_all()
    assert len(top) == 1
    assert (top[0]["dy"], top[0]["dx"]) == (2, 3)
    # the winning delta dominates: exact-content matches are Hamming 0
    n_right = sum(1 for r in mrows
                  if (r["yb"] - r["ya"], r["xb"] - r["xa"]) == (2, 3))
    assert n_right / len(mrows) > 0.8
