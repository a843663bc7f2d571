"""Two-epoch SSIM change maps: the integral-image kernel vs a per-pixel
brute-force window oracle, and the tiled halo pipeline bit-identical to
a whole-world kernel run (nodata clouds from both epochs honored)."""

import numpy as np
import pytest

from balrog_ray.stages.halo import GridSpec
from balrog_ray.stages.ssim import ssim_change, ssim_kernel, ssim_tile_stats
from balrog_ray.tiles.codec import NODATA, Caption, decode_tile
from balrog_ray.tiles.synth import (SynthConfig, epoch_dem_window,
                                    temporal_tiles_table)

CFG = SynthConfig(tiles_x=3, tiles_y=2, tile_px=32)
E_A, E_B = 0, 2
RADIUS = 3
L = 100.0
ND = -99.0


def _brute(a, b, radius, data_range):
    a32 = np.asarray(a, np.float32)
    b32 = np.asarray(b, np.float32)
    H, W = a32.shape
    both = (a32 != np.float32(ND)) & (b32 != np.float32(ND))
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    out = np.full((H, W), ND, np.float32)
    for y in range(H):
        for x in range(W):
            if not both[y, x]:
                continue
            y0, y1 = max(0, y - radius), min(H, y + radius + 1)
            x0, x1 = max(0, x - radius), min(W, x + radius + 1)
            m = both[y0:y1, x0:x1]
            if not m.any():
                continue
            pa_ = a32[y0:y1, x0:x1].astype(np.float64)[m]
            pb = b32[y0:y1, x0:x1].astype(np.float64)[m]
            ua, ub = pa_.mean(), pb.mean()
            va = (pa_ * pa_).mean() - ua * ua
            vb = (pb * pb).mean() - ub * ub
            cov = (pa_ * pb).mean() - ua * ub
            out[y, x] = ((2 * ua * ub + c1) * (2 * cov + c2)
                         / ((ua * ua + ub * ub + c1) * (va + vb + c2)))
    return out


def test_ssim_kernel_matches_brute_force():
    rng = np.random.default_rng(11)
    a = rng.uniform(0, 90, (17, 14)).astype(np.float32)
    b = (a + rng.normal(0, 6, (17, 14))).astype(np.float32)
    a[rng.random((17, 14)) < 0.08] = ND
    b[rng.random((17, 14)) < 0.08] = ND
    got = ssim_kernel(a, b, ND, radius=2, data_range=L)
    want = _brute(a, b, 2, L)
    nd = got == np.float32(ND)
    assert (nd == (want == np.float32(ND))).all()
    assert np.allclose(got[~nd], want[~nd], atol=1e-5)


def test_ssim_self_is_one():
    rng = np.random.default_rng(3)
    a = rng.uniform(0, 90, (12, 12)).astype(np.float32)
    got = ssim_kernel(a, a.copy(), ND, radius=2, data_range=L)
    assert np.allclose(got, 1.0, atol=1e-5)


def test_ssim_rejects_bad_args():
    a = np.zeros((8, 8), np.float32)
    with pytest.raises(ValueError):
        ssim_kernel(a, a, ND, radius=2, data_range=0.0)
    with pytest.raises(ValueError):
        ssim_kernel(a, np.zeros((7, 8), np.float32), ND, data_range=L)


def test_tiled_pipeline_matches_whole_world(ray_session):
    import ray.data

    ds = ray.data.from_arrow(temporal_tiles_table(CFG, 3))
    spec = GridSpec.from_synth(CFG)
    out = ssim_change(ds, spec, epoch_a=E_A, epoch_b=E_B,
                      radius=RADIUS, data_range=L)

    wr, wc = CFG.world_px
    ga = epoch_dem_window(CFG, E_A, 0, 0, wr, wc).astype(np.float32)
    gb = epoch_dem_window(CFG, E_B, 0, 0, wr, wc).astype(np.float32)
    want = ssim_kernel(ga, gb, NODATA, radius=RADIUS, data_range=L)

    got = np.full((wr, wc), np.nan, np.float32)
    n = 0
    for row in out.take_all():
        cap = Caption.from_json(row["caption"])
        assert cap.layer == "ssim"
        tile = decode_tile(row["bytes"], row["fmt"], cap)
        T = CFG.tile_px
        got[cap.ty * T:(cap.ty + 1) * T,
            cap.tx * T:(cap.tx + 1) * T] = tile
        n += 1
    assert n == CFG.tiles_x * CFG.tiles_y
    assert np.array_equal(got, want)          # bit-exact tiled parity

    # clouds moved between the epochs -> both nodata masks must show up
    nd = want == np.float32(NODATA)
    assert nd.any() and not nd.all()

    stats = ssim_tile_stats(out).take_all()
    assert len(stats) == CFG.tiles_x * CFG.tiles_y
    valid = ~nd
    total_valid = sum(r["n_valid"] for r in stats)
    assert total_valid == int(valid.sum())
    t0 = next(r for r in stats if r["tx"] == 0 and r["ty"] == 0)
    T = CFG.tile_px
    tile0 = want[:T, :T]
    v0 = tile0[tile0 != np.float32(NODATA)].astype(np.float64)
    assert t0["mean_ssim_u"] == int(np.rint(v0.mean() * 1_000_000))
    assert t0["min_ssim_u"] == int(np.rint(v0.min() * 1_000_000))
