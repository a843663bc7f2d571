"""Overview pyramid (SURVEY op 20 BuildPyramids): kernel units + whole-
raster parity, including odd grids (nodata padding) and categorical mode."""

import numpy as np
import pyarrow as pa
import pytest

from balrog_ray.stages.halo import GridSpec
from balrog_ray.stages.overviews import (build_overviews, downsample2x,
                                         next_spec)
from balrog_ray.tiles.codec import NODATA, Caption, decode_tile
from balrog_ray.tiles.synth import SynthConfig, global_arrays, tiles_table

ND = np.float32(NODATA)


def oracle_down(a, method):
    """Independent scalar-loop 2x2 downsample (the reference semantics)."""
    h, w = a.shape
    out = np.empty((h // 2, w // 2), dtype=np.float32)
    for i in range(h // 2):
        for j in range(w // 2):
            block = [a[2 * i + r, 2 * j + c]
                     for r in (0, 1) for c in (0, 1)]
            vals = [v for v in block if v != ND]
            if not vals:
                out[i, j] = ND
            elif method == "mean":
                out[i, j] = np.float32(
                    sum(np.float64(v) for v in vals) / len(vals))
            else:
                best = min(vals, key=lambda v: (-vals.count(v), v))
                out[i, j] = best
    return out


def test_downsample_mean_nodata():
    a = np.array([[1, 3, ND, ND],
                  [5, 7, ND, 2],
                  [ND, ND, 4, 4],
                  [ND, ND, 4, 8]], dtype=np.float32)
    got = downsample2x(a, method="mean")
    assert np.array_equal(got, np.array([[4.0, 2.0], [ND, 5.0]],
                                        dtype=np.float32))


def test_downsample_mode_tie_and_nodata():
    a = np.array([[1, 2, 5, 5],
                  [2, 1, 5, 3],
                  [ND, ND, ND, 7],
                  [ND, ND, 7, 9]], dtype=np.float32)
    got = downsample2x(a, method="mode")
    # 2x2 tie 1/1 vs 2/2 -> smallest (1); majority 5; all-nodata -> nodata;
    # 7 appears twice among valid
    assert np.array_equal(got, np.array([[1.0, 5.0], [ND, 7.0]],
                                        dtype=np.float32))


def test_downsample_random_vs_oracle():
    rng = np.random.default_rng(7)
    a = rng.integers(1, 5, size=(16, 16)).astype(np.float32)
    a[rng.random((16, 16)) < 0.3] = ND
    for method in ("mean", "mode"):
        assert np.array_equal(downsample2x(a, method=method),
                              oracle_down(a, method))


def _level_oracle(world, spec, method):
    """Pad the whole raster to the parent grid, downsample once."""
    up = next_spec(spec)
    H, W = up.tiles_y * spec.tile_px * 2, up.tiles_x * spec.tile_px * 2
    padded = np.full((H, W), ND, dtype=np.float32)
    padded[:world.shape[0], :world.shape[1]] = world
    return oracle_down(padded, method)


def _collect_level(rows, up, T):
    tiles = {}
    for r in rows:
        cap = Caption.from_json(r["caption"])
        tiles[(cap.tx, cap.ty)] = decode_tile(r["bytes"], r["fmt"], cap)
    world = np.full((up.tiles_y * T, up.tiles_x * T), ND, dtype=np.float32)
    for (tx, ty), arr in tiles.items():
        world[ty * T:(ty + 1) * T, tx * T:(tx + 1) * T] = arr
    return world, len(tiles)


@pytest.mark.parametrize("tiles_xy", [(4, 4), (3, 3)])
def test_pyramid_parity_two_levels(ray_session, tiles_xy):
    import ray.data

    cfg = SynthConfig(tiles_x=tiles_xy[0], tiles_y=tiles_xy[1], tile_px=32)
    spec = GridSpec.from_synth(cfg)
    dem, veg = global_arrays(cfg)
    ds = ray.data.from_arrow(tiles_table(cfg))
    levels = build_overviews(ds, spec, levels=2)
    assert len(levels) == 2

    worlds = {"dem": dem, "veg": veg}
    sp = spec
    for lv, up, lds in levels:
        per_layer = {}
        for r in lds.take_all():
            cap = Caption.from_json(r["caption"])
            per_layer.setdefault(cap.layer, []).append(r)
            assert r["image_id"].startswith(f"{cap.layer}/L{lv}/")
        for layer, method in (("dem", "mean"), ("veg", "mode")):
            want = _level_oracle(worlds[layer], sp, method)
            got, n = _collect_level(per_layer[layer], up, spec.tile_px)
            assert n == up.tiles_x * up.tiles_y
            # oracle raster covers the data region; engine canvas is the
            # full parent grid (nodata beyond)
            assert np.array_equal(got[:want.shape[0], :want.shape[1]], want)
            assert np.all(got[want.shape[0]:, :] == ND)
            assert np.all(got[:, want.shape[1]:] == ND)
            worlds[layer] = want
        sp = up
