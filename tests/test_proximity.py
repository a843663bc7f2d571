"""proximity vs a brute-force whole-raster oracle: exact Euclidean
distances out to max_dist, nodata beyond, tile-boundary parity."""

import numpy as np
import pytest

from balrog_ray.stages.halo import GridSpec
from balrog_ray.stages.proximity import proximity, proximity_kernel
from balrog_ray.tiles.codec import Caption, decode_tile
from balrog_ray.tiles.synth import SynthConfig, tiles_table

ND = -99.0


def _brute(arr, targets, max_dist, ps):
    """O(n^2) oracle: per-pixel min distance to any target pixel."""
    target = np.isin(arr, np.asarray(targets, np.float32)) \
        & (arr != np.float32(ND))
    ti, tj = np.nonzero(target)
    H, W = arr.shape
    out = np.full((H, W), ND, np.float32)
    if len(ti) == 0:
        return out
    for i in range(H):
        for j in range(W):
            d = np.sqrt(((ti - i) ** 2 + (tj - j) ** 2).min()) * ps
            if d <= max_dist:
                out[i, j] = np.float32(d)
    return out


def test_proximity_kernel_matches_brute_oracle():
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 5, (30, 26)).astype(np.float32)
    arr[rng.random((30, 26)) < 0.1] = ND
    arr[arr == 1] = np.where(rng.random((arr == 1).sum()) < 0.9, 0, 1)
    for max_dist in (2.4, 5.0):
        got = proximity_kernel(arr, (1.0, 2.0), max_dist, 1.0, ND)
        exp = _brute(arr, (1.0, 2.0), max_dist, 1.0)
        assert np.allclose(got, exp, atol=1e-5), max_dist


def test_proximity_kernel_no_targets_all_nodata():
    arr = np.full((8, 8), 3.0, np.float32)
    got = proximity_kernel(arr, (7.0,), 4.0, 1.0, ND)
    assert (got == np.float32(ND)).all()


def test_proximity_pipeline_matches_whole_raster(ray_session):
    import ray.data

    cfg = SynthConfig(tiles_x=3, tiles_y=2, tile_px=32)
    tab = tiles_table(cfg)
    spec = GridSpec.from_synth(cfg)
    T = cfg.tile_px

    veg = np.full((cfg.tiles_y * T, cfg.tiles_x * T), ND, np.float32)
    for i in range(tab.num_rows):
        cap = Caption.from_json(tab.column("caption")[i].as_py())
        if cap.layer != "veg":
            continue
        arr = decode_tile(tab.column("bytes")[i].as_py(),
                          tab.column("fmt")[i].as_py(), cap)
        veg[cap.ty * T:(cap.ty + 1) * T, cap.tx * T:(cap.tx + 1) * T] = arr

    max_dist = 5.5 * cfg.pixel_size          # 6-px halo
    exp = _brute(veg, (1.0, 2.0), max_dist, cfg.pixel_size)
    out = proximity(ray.data.from_arrow(tab), spec, layer="veg",
                    target_values=(1.0, 2.0), max_dist=max_dist).take_all()
    assert len(out) == cfg.tiles_x * cfg.tiles_y
    for row in out:
        cap = Caption.from_json(row["caption"])
        arr = decode_tile(row["bytes"], row["fmt"], cap)
        want = exp[cap.ty * T:(cap.ty + 1) * T, cap.tx * T:(cap.tx + 1) * T]
        assert np.allclose(arr, want, atol=1e-4), (cap.tx, cap.ty)


def test_proximity_max_dist_guard():
    import ray.data

    cfg = SynthConfig(tiles_x=2, tiles_y=2, tile_px=16)
    spec = GridSpec.from_synth(cfg)
    with pytest.raises(ValueError, match="halo"):
        proximity(ray.data.from_arrow(tiles_table(cfg)), spec,
                  target_values=(1.0,), max_dist=16 * cfg.pixel_size)
