"""Richardson-Lucy deconvolution: iterated kernel sharpens a known
blur, and the distributed per-round dual-plane pipeline is bit-exact
with the whole-world iteration."""

import numpy as np
import pytest

from balrog_ray.stages.deconv import (_conv_zero, rl_deconvolve,
                                      rl_step_kernel)
from balrog_ray.stages.halo import GridSpec
from balrog_ray.tiles.codec import Caption, decode_tile
from balrog_ray.tiles.synth import SynthConfig
from tests.test_filters import ND, _tiles_from_array

CFG = SynthConfig(tiles_x=2, tiles_y=2, tile_px=32)
PSF = np.asarray([[1, 2, 1], [2, 4, 2], [1, 2, 1]], np.float64) / 16.0
ITERS = 4


def _world():
    rng = np.random.default_rng(83)
    wr, wc = CFG.world_px
    sharp = np.zeros((wr, wc))
    for _ in range(40):                      # point-ish sources
        y, x = rng.integers(2, wr - 2), rng.integers(2, wc - 2)
        sharp[y, x] = rng.uniform(50, 100)
    sharp += rng.uniform(0, 1.0, (wr, wc))   # faint background
    blurred = _conv_zero(sharp, PSF)
    return sharp, blurred.astype(np.float32)


def test_rl_sharpens_known_blur():
    sharp, blurred = _world()
    est = blurred
    err0 = float(((blurred.astype(np.float64) - sharp) ** 2).mean())
    for _ in range(ITERS):
        est = rl_step_kernel(blurred, est, ND, psf=PSF)
    err = float(((est.astype(np.float64) - sharp) ** 2).mean())
    assert err < 0.5 * err0


def test_psf_validation():
    from balrog_ray.stages.deconv import _check_psf

    with pytest.raises(ValueError):
        _check_psf(np.ones((4, 4)) / 16.0)       # even side
    with pytest.raises(ValueError):
        _check_psf(np.ones((3, 3)))              # not normalized


def test_tiled_pipeline_matches_whole_world(ray_session):
    import ray.data

    _, blurred = _world()
    blurred = blurred.copy()
    blurred[5:9, 40:46] = ND                     # a nodata patch
    ds = ray.data.from_arrow(_tiles_from_array(blurred, CFG))
    spec = GridSpec.from_synth(CFG)
    out = rl_deconvolve(ds, spec, psf=PSF, n_iter=ITERS)

    want = blurred
    for _ in range(ITERS):
        want = rl_step_kernel(blurred, want, ND, psf=PSF)

    wr, wc = CFG.world_px
    got = np.full((wr, wc), np.nan, np.float32)
    n = 0
    for row in out.take_all():
        cap = Caption.from_json(row["caption"])
        assert cap.layer == "rl_est"
        tile = decode_tile(row["bytes"], row["fmt"], cap)
        T = CFG.tile_px
        got[cap.ty * T:(cap.ty + 1) * T,
            cap.tx * T:(cap.tx + 1) * T] = tile
        n += 1
    assert n == CFG.tiles_x * CFG.tiles_y
    assert np.array_equal(got, want)
    assert (got[5:9, 40:46] == np.float32(ND)).all()
