"""Otsu + adaptive mean thresholding: brute-force threshold-sweep and
per-pixel loop oracles, distributed == whole-raster bit-exact."""

import numpy as np
import pyarrow as pa
import pytest

from balrog_ray.stages.halo import GridSpec
from balrog_ray.stages.threshold import (adaptive_mean_kernel,
                                         adaptive_threshold, bin_index,
                                         otsu_from_hist, otsu_kernel,
                                         otsu_threshold)
from balrog_ray.tiles.codec import Caption, decode_tile
from balrog_ray.tiles.synth import SynthConfig
from tests.test_filters import ND, _field, _mosaic, _tiles_from_array


def _brute_otsu(counts):
    bins = len(counts)
    total = float(sum(counts))
    best_t, best_v = 0, -1.0
    for t in range(bins - 1):
        n0 = float(sum(counts[:t + 1]))
        n1 = total - n0
        if n0 == 0 or n1 == 0:
            continue
        mu0 = sum(i * c for i, c in enumerate(counts[:t + 1])) / n0
        mu1 = sum(i * counts[i] for i in range(t + 1, bins)) / n1
        v = n0 * n1 * (mu0 - mu1) ** 2
        if v > best_v:
            best_t, best_v = t, v
    return best_t


@pytest.mark.parametrize("seed", [5, 23])
def test_otsu_from_hist_matches_sweep(seed):
    rng = np.random.default_rng(seed)
    counts = rng.integers(0, 50, 64)
    counts[rng.integers(0, 64, 10)] = 0
    assert otsu_from_hist(counts) == _brute_otsu(counts.tolist())


def test_otsu_bimodal_separates_modes():
    rng = np.random.default_rng(31)
    a = np.concatenate([rng.normal(20, 3, 4000),
                        rng.normal(80, 3, 2000)]).astype(np.float32)
    arr = a.reshape(60, 100)
    mask, t = otsu_kernel(arr, 256, ND)
    lo, hi = float(arr.min()), float(arr.max())
    thr_val = lo + (t + 1) * (hi - lo) / 256
    # any value between the modes' supports separates them
    assert 30 < thr_val < 70
    # foreground == the upper mode
    assert (mask[arr > 70] == 1.0).all()
    assert (mask[arr < 30] == 0.0).all()


def test_distributed_otsu_matches_whole(ray_session):
    import ray
    import ray.data

    cfg = SynthConfig(tiles_x=3, tiles_y=2, tile_px=16)
    arr = _field((cfg.tiles_y * cfg.tile_px, cfg.tiles_x * cfg.tile_px),
                 13)
    tiles = ray.data.from_arrow(_tiles_from_array(arr, cfg))
    mask_ds, info = otsu_threshold(tiles, layer="dem", bins=256,
                                   out_layer="otsu")
    want, wt = otsu_kernel(arr, 256, ND)
    assert info["thr_bin"] == wt
    tabs = [t for t in (ray.get(rf) for rf in mask_ds.to_arrow_refs())
            if t.num_rows]
    got = _mosaic(pa.concat_tables(tabs), "otsu", cfg)
    assert np.array_equal(got, want)


def _adaptive_scalar(a, radius, c, nd):
    H, W = a.shape
    out = np.full((H, W), np.float32(nd), np.float32)
    cu = float(np.rint(c * 1e6))
    for r in range(H):
        for col in range(W):
            if a[r, col] == np.float32(nd):
                continue
            su, n = 0.0, 0
            for dy in range(-radius, radius + 1):
                for dx in range(-radius, radius + 1):
                    r2, c2 = r + dy, col + dx
                    if not (0 <= r2 < H and 0 <= c2 < W):
                        continue
                    if a[r2, c2] == np.float32(nd):
                        continue
                    su += float(np.rint(np.float64(a[r2, c2]) * 1e6))
                    n += 1
            vu = float(np.rint(np.float64(a[r, col]) * 1e6))
            out[r, col] = np.float32(1.0 if vu * n > su - cu * n
                                     else 0.0)
    return out


@pytest.mark.parametrize("seed,r", [(7, 2), (29, 3)])
def test_adaptive_kernel_matches_scalar(seed, r):
    a = _field((15, 14), seed)
    got = adaptive_mean_kernel(a, r, 2.0, ND)
    want = _adaptive_scalar(a, r, 2.0, ND)
    assert np.array_equal(got, want)
    m = a != np.float32(ND)
    assert 0 < got[m].sum() < m.sum()   # both classes present


def test_tiled_adaptive_matches_whole(ray_session):
    import ray
    import ray.data

    cfg = SynthConfig(tiles_x=3, tiles_y=2, tile_px=16)
    arr = _field((cfg.tiles_y * cfg.tile_px, cfg.tiles_x * cfg.tile_px),
                 17)
    spec = GridSpec.from_synth(cfg)
    tiles = ray.data.from_arrow(_tiles_from_array(arr, cfg))
    out = adaptive_threshold(tiles, spec, radius=5, c=1.0)
    tabs = [t for t in (ray.get(rf) for rf in out.to_arrow_refs())
            if t.num_rows]
    got = _mosaic(pa.concat_tables(tabs), "adaptive", cfg)
    want = adaptive_mean_kernel(arr, 5, 1.0, ND)
    assert np.array_equal(got, want)
