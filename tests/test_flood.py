"""Marker-controlled watershed: minimax value oracles agree, basin
semantics on crafted surfaces, deterministic plateau tie-breaks, and
distributed == whole-raster exact parity through both active-front
phases."""

import numpy as np
import pyarrow as pa
import pytest

from balrog_ray.stages.flood import (
    minimax_dijkstra, minimax_jacobi, watershed_whole,
)
from balrog_ray.stages.halo import GridSpec
from balrog_ray.tiles.synth import SynthConfig
from test_hydrology import _mosaic, _tiles_from_array

ND = -99.0


def _terrain(shape, seed, nodata_frac=0.0):
    rng = np.random.default_rng(seed)
    a = (rng.random(shape) * 30 + 1).astype(np.float32)
    if nodata_frac:
        a[rng.random(shape) < nodata_frac] = ND
    return a


@pytest.mark.parametrize("seed", [0, 5])
def test_minimax_kernels_agree(seed):
    arr = _terrain((20, 18), seed, nodata_frac=0.05)
    mk = np.zeros(arr.shape, np.int32)
    mk[3, 3] = 1
    mk[15, 14] = 2
    a = minimax_jacobi(arr, mk, ND)
    b = minimax_dijkstra(arr, mk, ND)
    assert np.array_equal(a, b)


def test_two_basin_split():
    """Two valleys separated by a ridge: every pixel joins its valley's
    marker; the ridge line itself goes to the SMALLER label (the
    deterministic plateau rule)."""
    H, W = 12, 21
    e = np.zeros((H, W), np.float32)
    for c in range(W):
        e[:, c] = 10.0 - abs(c - 10)        # ridge at c=10, height 10
    mk = np.zeros((H, W), np.int32)
    mk[6, 0] = 1                            # left valley seed
    mk[6, 20] = 2                           # right valley seed
    vstar, lab = watershed_whole(e, mk, ND)
    assert (lab[:, :10] == 1).all()
    assert (lab[:, 11:] == 2).all()
    assert (lab[:, 10] == 1).all()          # ridge: min label wins
    # v* on each side is the max level en route (monotone climb)
    assert vstar[6, 5] == e[6, 5]


def test_unreachable_stays_unlabeled():
    e = np.full((10, 10), 1.0, np.float32)
    e[:, 5] = ND                            # impassable wall
    mk = np.zeros((10, 10), np.int32)
    mk[5, 2] = 7
    vstar, lab = watershed_whole(e, mk, ND)
    assert (lab[:, :5] == 7).all()
    assert (lab[:, 6:] == 0).all()
    assert not np.isfinite(vstar[:, 6:]).any()


def test_label_rule_is_min_over_optimal_paths():
    """A plateau reachable from two markers at the same minimax value
    takes the smaller label even when the larger label's marker is
    closer -- path length must not matter, only (value, label)."""
    e = np.full((5, 13), 4.0, np.float32)   # one flat plateau
    mk = np.zeros((5, 13), np.int32)
    mk[2, 11] = 9                           # near the right
    mk[2, 12] = 3                           # also near the right
    vstar, lab = watershed_whole(e, mk, ND)
    assert (vstar == 4.0).all()
    assert (lab == 3).all()                 # min label floods all


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("nodata_frac", [0.0, 0.07])
def test_distributed_matches_whole(nodata_frac):
    import ray
    import ray.data

    from balrog_ray.stages.flood import watershed_flood

    cfg = SynthConfig(tiles_x=3, tiles_y=2, tile_px=16)
    arr = _terrain((32, 48), seed=13, nodata_frac=nodata_frac)
    mk = np.zeros(arr.shape, np.float32)
    rng = np.random.default_rng(4)
    for lbl in range(1, 6):
        r, c = rng.integers(0, 32), rng.integers(0, 48)
        if arr[r, c] != np.float32(ND):
            mk[r, c] = lbl
    spec = GridSpec(cfg.tiles_x, cfg.tiles_y, cfg.tile_px,
                    cfg.pixel_size, y_north=cfg.y_north)
    ds = ray.data.from_arrow(pa.concat_tables([
        _tiles_from_array(arr, cfg, layer="dem"),
        _tiles_from_array(mk, cfg, layer="markers"),
    ]))
    out = watershed_flood(ds, spec, level_layer="dem",
                          marker_layer="markers").materialize()
    tabs = [t for t in (ray.get(r) for r in out.to_arrow_refs())
            if t.num_rows]
    got = _mosaic(pa.concat_tables(tabs), "flood_lab", cfg)
    _, lab = watershed_whole(arr, mk.astype(np.int32), ND)
    want = lab.astype(np.float32)
    want[lab == 0] = np.float32(ND)
    want[arr == np.float32(ND)] = np.float32(ND)
    assert np.array_equal(got, want), (
        f"{int((got != want).sum())} px differ")
