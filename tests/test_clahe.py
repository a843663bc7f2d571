"""CLAHE: clipped-histogram invariants, clip-limit behavior vs the
unclipped global equalization, and tiled-vs-whole bit-exact parity
through the histogram-sidecar shuffle."""

import numpy as np
import pyarrow as pa
import pytest

from balrog_ray.stages.clahe import (
    clahe_whole, clipped_hist, hist_to_lut,
)
from balrog_ray.stages.halo import GridSpec
from balrog_ray.tiles.synth import SynthConfig
from test_hydrology import _mosaic, _tiles_from_array

ND = -99.0


def _field(shape, seed, nodata_frac=0.05):
    rng = np.random.default_rng(seed)
    # bimodal so equalization visibly moves mass
    a = np.where(rng.random(shape) < 0.7,
                 rng.normal(30.0, 5.0, shape),
                 rng.normal(120.0, 15.0, shape)).astype(np.float32)
    a[rng.random(shape) < nodata_frac] = ND
    return a


def test_clipped_hist_conserves_counts():
    arr = _field((40, 40), seed=3)
    n_valid = int((arr != np.float32(ND)).sum())
    for cl in (1.0, 2.5, 4.0, 100.0):
        h = clipped_hist(arr, ND, bins=64, clip_limit=cl,
                         vmin=0.0, vmax=160.0)
        assert int(h.sum()) == n_valid          # redistribution exact
        assert (h >= 0).all()
    # huge clip limit == raw histogram (nothing clipped)
    raw = clipped_hist(arr, ND, bins=64, clip_limit=1e9,
                       vmin=0.0, vmax=160.0)
    idx = np.clip(((arr[arr != np.float32(ND)].astype(np.float64))
                   / 160.0 * 64).astype(np.int64), 0, 63)
    want = np.bincount(idx, minlength=64)
    assert np.array_equal(raw, want)


def test_lut_monotone_and_bounded():
    arr = _field((32, 32), seed=9)
    h = clipped_hist(arr, ND, bins=128, clip_limit=3.0,
                     vmin=0.0, vmax=160.0)
    lut = hist_to_lut(h)
    assert (np.diff(lut) >= 0).all()
    assert lut[-1] == pytest.approx(255.0)
    assert hist_to_lut(np.zeros(16, np.int64)).sum() == 0.0


def test_clip_limit_flattens_less():
    """Lower clip limit -> LUT closer to identity ramp (less contrast
    amplification) -- the defining CLAHE property."""
    rng = np.random.default_rng(11)
    arr = rng.normal(80.0, 4.0, (64, 64)).astype(np.float32)  # peaky
    ramp = np.linspace(255.0 / 128, 255.0, 128)
    h_lo = clipped_hist(arr, ND, bins=128, clip_limit=1.0,
                        vmin=0.0, vmax=160.0)
    h_hi = clipped_hist(arr, ND, bins=128, clip_limit=50.0,
                        vmin=0.0, vmax=160.0)
    d_lo = np.abs(hist_to_lut(h_lo) - ramp).sum()
    d_hi = np.abs(hist_to_lut(h_hi) - ramp).sum()
    assert d_lo < d_hi


def test_whole_oracle_nodata_and_range():
    arr = _field((48, 64), seed=21)
    out = clahe_whole(arr, ND, tile_px=16, bins=256, clip_limit=4.0,
                      vmin=0.0, vmax=160.0)
    valid = arr != np.float32(ND)
    assert np.array_equal(out == np.float32(ND), ~valid)
    assert out[valid].min() >= 0.0 and out[valid].max() <= 255.0


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("clip_limit", [2.0, 4.0])
def test_tiled_parity(clip_limit):
    import ray
    import ray.data

    from balrog_ray.stages.clahe import clahe

    cfg = SynthConfig(tiles_x=3, tiles_y=2, tile_px=16)
    arr = _field((32, 48), seed=100)
    spec = GridSpec(cfg.tiles_x, cfg.tiles_y, cfg.tile_px,
                    cfg.pixel_size, y_north=cfg.y_north)
    ds = ray.data.from_arrow(_tiles_from_array(arr, cfg, layer="dem"))
    out = clahe(ds, spec, layer="dem", bins=256,
                clip_limit=clip_limit, vmin=0.0,
                vmax=160.0).materialize()
    tabs = [t for t in (ray.get(r) for r in out.to_arrow_refs())
            if t.num_rows]
    got = _mosaic(pa.concat_tables(tabs), "clahe", cfg)
    want = clahe_whole(arr, ND, tile_px=16, bins=256,
                       clip_limit=clip_limit, vmin=0.0, vmax=160.0)
    assert np.array_equal(got, want)


@pytest.mark.usefixtures("ray_session")
def test_partial_input_gates_not_degrades():
    """Dropping one tile must remove only the cells whose 3x3 context
    lost a histogram -- never emit a tile computed from a short stack."""
    import ray
    import ray.data

    from balrog_ray.stages.clahe import clahe
    from balrog_ray.tiles.codec import Caption

    cfg = SynthConfig(tiles_x=3, tiles_y=2, tile_px=16)
    arr = _field((32, 48), seed=7)
    spec = GridSpec(cfg.tiles_x, cfg.tiles_y, cfg.tile_px,
                    cfg.pixel_size, y_north=cfg.y_north)
    tab = _tiles_from_array(arr, cfg, layer="dem")
    keep = [i for i in range(tab.num_rows)
            if Caption.from_json(tab.column("caption")[i].as_py()).tx
            != 1 or Caption.from_json(
                tab.column("caption")[i].as_py()).ty != 0]
    ds = ray.data.from_arrow(tab.take(pa.array(keep, pa.int64())))
    out = clahe(ds, spec, layer="dem", vmin=0.0,
                vmax=160.0).materialize()
    got_tiles = {(Caption.from_json(c).tx, Caption.from_json(c).ty)
                 for t in ray.get(out.to_arrow_refs()) if t.num_rows
                 for c in t.column("caption").to_pylist()}
    # every surviving tile is 3x3-complete without (1, 0); with a 3x2
    # grid, (1, 0) neighbours everything, so nothing may survive...
    # except tiles whose clamped context never references it: none.
    assert got_tiles == set()
