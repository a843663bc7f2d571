"""Feathered mosaic blend vs a whole-world single-array oracle: the tiled
groupby(cell) blend must be bit-identical to folding the global per-source
arrays in source order (float64 num/den, float32 quotient), with nodata
clouds zero-weighted and uncovered pixels nodata."""

import numpy as np
import pytest

from balrog_ray.stages.halo import GridSpec
from balrog_ray.stages.mosaic import (acquisition_footprints, feather_blend,
                                      weight_plane)
from balrog_ray.tiles.codec import NODATA, Caption, decode_tile
from balrog_ray.tiles.synth import (SynthConfig, acquisition_tiles_table,
                                    epoch_dem_window, source_tile_range)

CFG = SynthConfig(tiles_x=3, tiles_y=4, tile_px=32)
N_SOURCES = 3
FEATHER = 12.0


def _footprint(s):
    ty0, ty1 = source_tile_range(CFG, s, N_SOURCES)
    T, ps = CFG.tile_px, CFG.pixel_size
    return (0.0, CFG.y_north - (ty1 + 1) * T * ps,
            CFG.tiles_x * T * ps, CFG.y_north - ty0 * T * ps)


def _global_blend():
    wr, wc = CFG.world_px
    num = np.zeros((wr, wc), np.float64)
    den = np.zeros_like(num)
    for s in range(N_SOURCES):
        ty0, ty1 = source_tile_range(CFG, s, N_SOURCES)
        T = CFG.tile_px
        arr = np.full((wr, wc), np.float32(NODATA), np.float32)
        band = epoch_dem_window(CFG, s, ty0 * T, 0,
                                (ty1 - ty0 + 1) * T, wc)
        arr[ty0 * T:(ty1 + 1) * T] = band
        wgt = weight_plane(0.0, CFG.y_north, CFG.pixel_size, wr, wc,
                           _footprint(s), FEATHER)
        wgt = np.where(arr != np.float32(NODATA), wgt, 0.0)
        num += wgt * arr.astype(np.float64)
        den += wgt
    return np.where(den > 0.0, (num / np.where(den > 0.0, den, 1.0))
                    .astype(np.float32), np.float32(NODATA))


@pytest.fixture(scope="module")
def tiles_ds(ray_session):
    import ray.data

    return ray.data.from_arrow(
        acquisition_tiles_table(CFG, N_SOURCES)).materialize()


def test_footprints_from_captions(ray_session, tiles_ds):
    fps = acquisition_footprints(tiles_ds)
    assert fps == {s: _footprint(s) for s in range(N_SOURCES)}


def test_blend_matches_global(ray_session, tiles_ds):
    spec = GridSpec.from_synth(CFG)
    out = np.full(CFG.world_px, np.nan, np.float32)
    n = 0
    for row in feather_blend(tiles_ds, spec,
                             feather_px=FEATHER).take_all():
        cap = Caption.from_json(row["caption"])
        T = CFG.tile_px
        out[cap.ty * T:(cap.ty + 1) * T,
            cap.tx * T:(cap.tx + 1) * T] = \
            decode_tile(row["bytes"], row["fmt"], cap)
        n += 1
    want = _global_blend()
    np.testing.assert_array_equal(out, want)
    # synth must exercise the interesting regimes
    counts = np.zeros(CFG.world_px, np.int64)
    T = CFG.tile_px
    for s in range(N_SOURCES):
        ty0, ty1 = source_tile_range(CFG, s, N_SOURCES)
        counts[ty0 * T:(ty1 + 1) * T] += 1
    assert (counts >= 2).any(), "need overlap zones"
    assert (counts == 1).any(), "need single-source zones"
    assert n == CFG.tiles_x * CFG.tiles_y
    # nodata clouds survive only where no other source covers
    assert (want == np.float32(NODATA)).any()


def test_weight_plane_feather_profile():
    """Weights rise linearly from the footprint edge and saturate."""
    fp = (0.0, 0.0, 100.0, 100.0)
    w = weight_plane(0.0, 100.0, 1.0, 100, 100, fp, 8.0)
    assert w[0, 50] == pytest.approx(0.5)      # edge row: half-pixel in
    assert w[3, 50] == pytest.approx(3.5)
    assert w[50, 50] == 8.0                    # interior saturates
    assert np.all(w <= 8.0) and np.all(w >= 0.0)
