"""LBP codes: vectorized kernel vs per-pixel loop oracle, tiled halo
parity, exact global histogram conservation."""

import numpy as np

from balrog_ray.stages.halo import GridSpec
from balrog_ray.stages.lbp import _OFFS, lbp_codes, lbp_histogram, \
    lbp_kernel
from balrog_ray.tiles.codec import Caption, decode_tile
from balrog_ray.tiles.synth import SynthConfig, dem_window
from tests.test_filters import ND, _tiles_from_array

CFG = SynthConfig(tiles_x=3, tiles_y=2, tile_px=32)


def _brute(arr):
    a = np.asarray(arr, np.float32)
    H, W = a.shape
    valid = a != np.float32(ND)
    out = np.full((H, W), np.float32(ND), np.float32)
    for y in range(1, H - 1):
        for x in range(1, W - 1):
            if not valid[y - 1:y + 2, x - 1:x + 2].all():
                continue
            code = 0
            for dy, dx in _OFFS:
                code = (code << 1) | int(a[y + dy, x + dx] >= a[y, x])
            out[y, x] = np.float32(code)
    return out


def test_kernel_matches_loop_oracle():
    rng = np.random.default_rng(71)
    arr = rng.uniform(0, 50, (15, 14)).astype(np.float32)
    arr[rng.random((15, 14)) < 0.07] = ND
    got = lbp_kernel(arr, ND)
    assert np.array_equal(got, _brute(arr))
    m = got != np.float32(ND)
    assert len(np.unique(got[m])) > 10


def test_tiled_parity_and_histogram(ray_session):
    import ray.data

    wr, wc = CFG.world_px
    rng = np.random.default_rng(77)
    world = (dem_window(CFG, 0, 0, wr, wc)
             + rng.normal(0, 1.0, (wr, wc))).astype(np.float32)
    ds = ray.data.from_arrow(_tiles_from_array(world, CFG))
    spec = GridSpec.from_synth(CFG)
    out = lbp_codes(ds, spec)
    want = lbp_kernel(world, ND)

    got = np.full((wr, wc), np.nan, np.float32)
    n = 0
    for row in out.take_all():
        cap = Caption.from_json(row["caption"])
        tile = decode_tile(row["bytes"], row["fmt"], cap)
        T = CFG.tile_px
        got[cap.ty * T:(cap.ty + 1) * T,
            cap.tx * T:(cap.tx + 1) * T] = tile
        n += 1
    assert n == CFG.tiles_x * CFG.tiles_y
    assert np.array_equal(got, want)

    hist = lbp_histogram(lbp_codes(ds, spec)).take_all()
    m = want != np.float32(ND)
    vals, counts = np.unique(want[m].astype(np.int64),
                             return_counts=True)
    assert {r["code"]: r["n_px"] for r in hist} == \
        dict(zip(vals.tolist(), counts.tolist()))
