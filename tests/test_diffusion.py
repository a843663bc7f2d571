"""Perona-Malik diffusion: per-pixel scalar loop oracle, edge
preservation vs Gaussian, multi-round tiled == whole bit-exact."""

import numpy as np
import pyarrow as pa
import pytest

from balrog_ray.stages.diffusion import pm_diffuse, pm_step_kernel
from balrog_ray.stages.filters import gaussian_kernel
from balrog_ray.stages.halo import GridSpec
from balrog_ray.tiles.synth import SynthConfig
from tests.test_filters import ND, _field, _mosaic, _tiles_from_array


def _pm_scalar(a, kappa, lam, option, nd):
    H, W = a.shape
    out = np.full((H, W), np.float32(nd), np.float32)
    for r in range(H):
        for c in range(W):
            if a[r, c] == np.float32(nd):
                continue
            u = float(np.float64(a[r, c]))
            acc = u
            for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
                r2, c2 = r + dy, c + dx
                if not (0 <= r2 < H and 0 <= c2 < W):
                    continue
                if a[r2, c2] == np.float32(nd):
                    continue
                grad = float(np.float64(a[r2, c2])) - u
                if option == 1:
                    g = np.exp(-(grad * grad) / kappa ** 2)
                else:
                    g = 1.0 / (1.0 + (grad * grad) / kappa ** 2)
                acc += lam * g * grad
            out[r, c] = np.float32(acc)
    return out


@pytest.mark.parametrize("seed,option", [(53, 1), (59, 2)])
def test_step_matches_scalar(seed, option):
    a = _field((14, 13), seed)
    got = pm_step_kernel(a, ND, kappa=8.0, lam=0.2, option=option)
    want = _pm_scalar(a, 8.0, 0.2, option, ND)
    m = a != np.float32(ND)
    assert np.allclose(got[m], want[m], rtol=1e-7, atol=1e-5)
    assert (got[~m] == np.float32(ND)).all()


def test_edge_preserved_noise_smoothed():
    rng = np.random.default_rng(61)
    step = np.zeros((20, 20), np.float32)
    step[:, 10:] = 100.0
    noisy = step + rng.normal(0, 2.0, (20, 20)).astype(np.float32)
    u = noisy.copy()
    for _ in range(10):
        u = pm_step_kernel(u, ND, kappa=8.0, lam=0.2)
    # in-region noise shrinks
    assert u[5:15, 2:8].std() < 0.5 * noisy[5:15, 2:8].std()
    # the 100-unit edge survives (PM), while a comparable Gaussian
    # blur has already smeared it
    pm_contrast = float(u[:, 11:].mean() - u[:, :9].mean())
    ga = gaussian_kernel(noisy, 2.5, 8, ND)
    ga_edge = abs(float(ga[10, 9]) - float(noisy[:, :9].mean()))
    assert pm_contrast > 98.0
    assert abs(float(u[10, 9]) - float(noisy[:, :9].mean())) < ga_edge


def test_tiled_matches_whole(ray_session):
    import ray
    import ray.data

    cfg = SynthConfig(tiles_x=3, tiles_y=2, tile_px=16)
    arr = _field((cfg.tiles_y * cfg.tile_px, cfg.tiles_x * cfg.tile_px),
                 67)
    spec = GridSpec.from_synth(cfg)
    tiles = ray.data.from_arrow(_tiles_from_array(arr, cfg))
    out = pm_diffuse(tiles, spec, kappa=6.0, lam=0.25, n_iter=3)
    tabs = [t for t in (ray.get(rf) for rf in out.to_arrow_refs())
            if t.num_rows]
    got = _mosaic(pa.concat_tables(tabs), "pm", cfg)
    want = arr
    for _ in range(3):
        want = pm_step_kernel(want, ND, kappa=6.0, lam=0.25)
    assert np.array_equal(got, want)


def test_lam_guard():
    import ray.data
    with pytest.raises(ValueError, match="stable"):
        pm_diffuse(None, GridSpec(1, 1, 16, 25.0, 0.0), lam=0.3)
