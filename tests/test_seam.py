"""Seam carving: DP map vs per-pixel loop oracle, seam semantics on
crafted energy fields, nodata walls, and banded-vs-whole bit-exact
parity through the wavefront rounds."""

import numpy as np
import pyarrow as pa
import pytest

from balrog_ray.stages.halo import GridSpec
from balrog_ray.stages.seam import (
    backtrack_whole, seam_energy_whole,
)
from balrog_ray.tiles.synth import SynthConfig
from test_hydrology import _mosaic, _tiles_from_array

ND = -99.0


def _field(shape, seed, nodata_frac=0.0):
    rng = np.random.default_rng(seed)
    a = (rng.random(shape) * 50 + 1).astype(np.float32)
    if nodata_frac:
        a[rng.random(shape) < nodata_frac] = ND
    return a


def _dp_scalar(e):
    """Per-pixel loop oracle in float32 (same arithmetic order)."""
    H, W = e.shape
    M = np.empty((H, W), np.float32)
    for c in range(W):
        M[0, c] = e[0, c]
    for r in range(1, H):
        for c in range(W):
            best = M[r - 1, c]
            if c > 0:
                best = min(np.float32(best), M[r - 1, c - 1])
            if c < W - 1:
                best = min(np.float32(best), M[r - 1, c + 1])
            M[r, c] = np.float32(e[r, c] + np.float32(best))
    return M


@pytest.mark.parametrize("seed", [0, 4])
def test_whole_matches_scalar_loop(seed):
    arr = _field((18, 15), seed, nodata_frac=0.06)
    got = seam_energy_whole(arr, ND)
    e = np.where(arr == np.float32(ND), np.float32(np.inf), arr)
    want = _dp_scalar(e)
    assert np.array_equal(got, want)


def test_seam_follows_cheap_channel():
    """A zero-cost zig-zag channel in an expensive field: the seam
    recovers it exactly."""
    H, W = 24, 16
    e = np.full((H, W), 100.0, np.float32)
    cols = [5]
    rng = np.random.default_rng(3)
    for r in range(1, H):
        c = cols[-1] + int(rng.integers(-1, 2))
        cols.append(min(max(c, 0), W - 1))
    for r, c in enumerate(cols):
        e[r, c] = 0.0
    M = seam_energy_whole(e, ND)
    seam, cost = backtrack_whole(M)
    assert cost == 0.0
    assert list(seam) == cols


def test_nodata_wall_blocks_and_tiebreak():
    """A full nodata row makes every seam +inf-blocked below it except
    through a single gap; the seam threads the gap.  Equal-cost columns
    tie-break to the smallest index."""
    e = np.full((10, 9), 1.0, np.float32)
    e[5, :] = ND
    e[5, 6] = 1.0                      # the only gap
    M = seam_energy_whole(e, ND)
    seam, cost = backtrack_whole(M)
    assert seam[5] == 6
    assert np.isfinite(cost) and cost == 10.0
    # uniform field: all bottom columns tie -> smallest wins
    u = np.full((6, 7), 2.0, np.float32)
    s2, c2 = backtrack_whole(seam_energy_whole(u, ND))
    assert list(s2) == [0] * 6 and c2 == 12.0


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("nodata_frac", [0.0, 0.08])
def test_banded_matches_whole(nodata_frac):
    import ray
    import ray.data

    from balrog_ray.stages.seam import extract_seam, seam_energy_map

    cfg = SynthConfig(tiles_x=3, tiles_y=3, tile_px=16)
    arr = _field((48, 48), seed=11, nodata_frac=nodata_frac)
    spec = GridSpec(cfg.tiles_x, cfg.tiles_y, cfg.tile_px,
                    cfg.pixel_size, y_north=cfg.y_north)
    ds = ray.data.from_arrow(_tiles_from_array(arr, cfg, layer="dem"))
    m_ds = seam_energy_map(ds, spec, layer="dem")
    tabs = [t for t in (ray.get(r) for r in m_ds.to_arrow_refs())
            if t.num_rows]
    got = _mosaic(pa.concat_tables(tabs), "seam_m", cfg)
    want_inf = seam_energy_whole(arr, ND)
    want = want_inf.copy()
    want[~np.isfinite(want)] = np.float32(ND)
    assert np.array_equal(got, want), (
        f"{int((got != want).sum())} px differ")
    seam, cost = extract_seam(m_ds, spec)
    wseam, wcost = backtrack_whole(want_inf)
    assert cost == wcost and np.array_equal(seam, wseam)
