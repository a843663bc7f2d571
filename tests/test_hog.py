"""HOG descriptors: cell-histogram loop oracle, tiled halo parity with
the whole-raster single-process computation."""

import numpy as np

from balrog_ray.stages.halo import GridSpec
from balrog_ray.stages.hog import _cell_hists, hog_block_rows, \
    hog_descriptors
from balrog_ray.tiles.synth import SynthConfig, dem_window
from tests.test_filters import ND, _tiles_from_array

CFG = SynthConfig(tiles_x=3, tiles_y=2, tile_px=32)
CELL, NBINS = 8, 9


def _brute_hists(arr, nodata, row0, col0, cell, n_bins):
    a = np.asarray(arr, np.float64)
    H, W = a.shape
    valid = np.asarray(arr, np.float32) != np.float32(nodata)
    cy0 = -(-row0 // cell)
    cx0 = -(-col0 // cell)
    cy1 = (row0 + H) // cell
    cx1 = (col0 + W) // cell
    hist = np.zeros((max(cy1 - cy0, 0), max(cx1 - cx0, 0), n_bins))
    for y in range(1, H - 1):
        for x in range(1, W - 1):
            if not (valid[y, x] and valid[y, x - 1] and valid[y, x + 1]
                    and valid[y - 1, x] and valid[y + 1, x]):
                continue
            gx = a[y, x + 1] - a[y, x - 1]
            gy = a[y + 1, x] - a[y - 1, x]
            mag = np.hypot(gx, gy)
            ang = np.mod(np.degrees(np.arctan2(gy, gx)), 180.0)
            b = min(int(ang / (180.0 / n_bins)), n_bins - 1)
            gy_c, gx_c = (row0 + y) // cell, (col0 + x) // cell
            if cy0 <= gy_c < cy1 and cx0 <= gx_c < cx1:
                hist[gy_c - cy0, gx_c - cx0, b] += mag
    return hist, cy0, cx0


def test_cell_hists_loop_oracle():
    rng = np.random.default_rng(83)
    arr = rng.uniform(0, 60, (29, 23)).astype(np.float32)
    arr[rng.random((29, 23)) < 0.06] = ND
    for row0, col0 in ((0, 0), (13, 5)):
        got, gy0, gx0 = _cell_hists(arr, ND, row0, col0, CELL, NBINS)
        want, wy0, wx0 = _brute_hists(arr, ND, row0, col0, CELL, NBINS)
        assert (gy0, gx0) == (wy0, wx0)
        assert np.allclose(got, want, rtol=0, atol=1e-9)
        assert got.sum() > 0


def test_tiled_matches_whole(ray_session):
    import ray.data

    wr, wc = CFG.world_px
    rng = np.random.default_rng(89)
    world = (dem_window(CFG, 0, 0, wr, wc)
             + rng.normal(0, 2.0, (wr, wc))).astype(np.float32)
    world[rng.random((wr, wc)) < 0.01] = ND

    whole = hog_block_rows(world, float(ND), 0, 0, cell=CELL,
                           n_bins=NBINS)
    want = {(by, bx, k): v for by, bx, k, v in zip(
        whole["by"], whole["bx"], whole["k"], whole["v_u"])}
    n_blocks = (wr // CELL - 1) * (wc // CELL - 1)
    assert len(want) == n_blocks * 4 * NBINS

    ds = ray.data.from_arrow(_tiles_from_array(world, CFG))
    out = hog_descriptors(ds, GridSpec.from_synth(CFG), cell=CELL,
                          n_bins=NBINS).take_all()
    got = {(r["by"], r["bx"], r["k"]): r["v_u"] for r in out}
    assert got == want
