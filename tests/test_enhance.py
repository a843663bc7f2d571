"""Histogram equalization / percentile stretch vs a whole-raster oracle
written independently in the test (own binning loop, own CDF math) --
parity must be exact because both sides bin with the same arithmetic."""

import numpy as np
import pyarrow as pa
import pytest

from balrog_ray.stages.enhance import (equalize, equalize_lut,
                                       percentile_stretch, stretch_lut)
from balrog_ray.tiles.synth import SynthConfig

from test_hydrology import _bumpy_dem, _mosaic, _tiles_from_array

ND = -99.0


def _eq_oracle(arr, bins):
    ok = arr != np.float32(ND)
    v = arr[ok].astype(np.float64)
    vmin, vmax = v.min(), v.max()
    idx = np.clip(np.floor((v - vmin) / (vmax - vmin) * bins), 0,
                  bins - 1).astype(int)
    hist = np.bincount(idx, minlength=bins)
    cdf_excl = np.concatenate([[0], np.cumsum(hist)[:-1]])
    out = np.full(arr.shape, np.float32(ND), np.float32)
    out[ok] = np.floor(255.0 * cdf_excl[idx] / len(v)).astype(np.float32)
    return out


def _stretch_oracle(arr, bins, p_lo, p_hi):
    ok = arr != np.float32(ND)
    v = arr[ok].astype(np.float64)
    vmin, vmax = v.min(), v.max()
    idx = np.clip(np.floor((v - vmin) / (vmax - vmin) * bins), 0,
                  bins - 1).astype(int)
    hist = np.bincount(idx, minlength=bins)
    cdf = np.cumsum(hist) / len(v) * 100.0
    edges = vmin + (vmax - vmin) * np.arange(bins) / bins
    lo = edges[int(np.searchsorted(cdf, p_lo))]
    hi = edges[int(np.searchsorted(cdf, p_hi))]
    centers = edges + 0.5 * (vmax - vmin) / bins
    lut = np.clip((centers - lo) / (hi - lo) * 255.0, 0, 255
                  ).astype(np.float32)
    out = np.full(arr.shape, np.float32(ND), np.float32)
    out[ok] = lut[idx]
    return out


def _run(fn, arr, cfg, layer_out, **kw):
    import ray
    import ray.data

    out = fn(ray.data.from_arrow(_tiles_from_array(arr, cfg)),
             "dem", **kw).materialize()
    tabs = [t for t in (ray.get(r) for r in out.to_arrow_refs())
            if t.num_rows]
    return _mosaic(pa.concat_tables(tabs), layer_out, cfg)


def test_equalize_matches_oracle(ray_session):
    cfg = SynthConfig(tiles_x=3, tiles_y=2, tile_px=16)
    arr = _bumpy_dem((32, 48), 21)
    got = _run(equalize, arr, cfg, "eq_dem", bins=64)
    want = _eq_oracle(arr, 64)
    assert np.array_equal(got, want)
    ok = got != np.float32(ND)
    assert got[ok].min() == 0.0 and got[ok].max() > 250


def test_stretch_matches_oracle(ray_session):
    cfg = SynthConfig(tiles_x=3, tiles_y=2, tile_px=16)
    arr = _bumpy_dem((32, 48), 22)
    got = _run(percentile_stretch, arr, cfg, "stretch_dem",
               p_lo=5.0, p_hi=95.0, bins=128)
    want = _stretch_oracle(arr, 128, 5.0, 95.0)
    assert np.array_equal(got, want)
    ok = got != np.float32(ND)
    # tails actually clipped
    assert (got[ok] == 0.0).any() and (got[ok] == 255.0).any()


def test_lut_validation():
    with pytest.raises(ValueError):
        stretch_lut(np.ones(8, np.int64), 0.0, 1.0, 90.0, 10.0)
    assert equalize_lut(np.zeros(4, np.int64)).tolist() == [0, 0, 0, 0]


def _match_oracle(src, ref, bins):
    ok_s = src != np.float32(ND)
    ok_r = ref != np.float32(ND)
    vs = src[ok_s].astype(np.float64)
    vr = ref[ok_r].astype(np.float64)
    svmin, svmax = vs.min(), vs.max()
    rvmin, rvmax = vr.min(), vr.max()
    si = np.clip(np.floor((vs - svmin) / (svmax - svmin) * bins), 0,
                 bins - 1).astype(int)
    ri = np.clip(np.floor((vr - rvmin) / (rvmax - rvmin) * bins), 0,
                 bins - 1).astype(int)
    src_cdf = np.cumsum(np.bincount(si, minlength=bins)) / len(vs)
    ref_cdf = np.cumsum(np.bincount(ri, minlength=bins)) / len(vr)
    centers = (rvmin + (rvmax - rvmin) * (np.arange(bins) + 0.5) / bins)
    j = np.minimum(np.searchsorted(ref_cdf, src_cdf, side="left"),
                   bins - 1)
    out = np.full(src.shape, np.float32(ND), np.float32)
    out[ok_s] = centers[j].astype(np.float32)[si]
    return out


def test_histogram_match_matches_oracle(ray_session):
    import ray.data

    from balrog_ray.stages.enhance import histogram_match

    cfg = SynthConfig(tiles_x=3, tiles_y=2, tile_px=16)
    src = _bumpy_dem((32, 48), 23)
    # reference: different shape AND different range
    ref = _bumpy_dem((32, 48), 24) * 2.0 + 100.0
    ref[ref == np.float32(ND) * 2.0 + 100.0] = ND  # keep nodata sentinel
    import ray

    out = histogram_match(
        ray.data.from_arrow(_tiles_from_array(src, cfg)),
        ray.data.from_arrow(_tiles_from_array(ref, cfg)),
        "dem", bins=64).materialize()
    tabs = [t for t in (ray.get(r) for r in out.to_arrow_refs())
            if t.num_rows]
    got = _mosaic(pa.concat_tables(tabs), "match_dem", cfg)
    want = _match_oracle(src, ref, 64)
    assert np.array_equal(got, want)
    # matched values live in the reference range, not the source range
    ok = got != np.float32(ND)
    assert got[ok].min() >= 100.0 - 1e-3
    # and the matched CDF tracks the reference CDF (coarse check)
    vr = ref[ref != np.float32(ND)]
    assert abs(np.median(got[ok]) - np.median(vr)) \
        < (vr.max() - vr.min()) / 8
