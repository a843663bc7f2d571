"""Grayscale morphology vs brute-force per-pixel oracles, the classic
algebraic properties, tiled-vs-whole parity through the halo stage
(including the fused radius-2n open/close path), and geodesic
reconstruction / h-maxima vs the iterative whole-array oracle."""

import numpy as np
import pyarrow as pa
import pytest

from balrog_ray.stages.gray_morph import (
    black_tophat_kernel, close_kernel, dilate_kernel, erode_kernel,
    gradient_kernel, open_kernel, reconstruct_step_kernel,
    reconstruct_whole, se_offsets, white_tophat_kernel,
)
from balrog_ray.stages.halo import GridSpec
from balrog_ray.tiles.synth import SynthConfig
from test_hydrology import _mosaic, _tiles_from_array

ND = -99.0


def _field(shape, seed, nodata_frac=0.05):
    rng = np.random.default_rng(seed)
    a = rng.normal(50.0, 12.0, shape).astype(np.float32)
    a[rng.random(shape) < nodata_frac] = ND
    return a


def _brute_rank(arr, n, shape, op):
    """Per-pixel oracle: min/max over the SE ignoring nodata and
    out-of-bounds; nodata stays nodata."""
    H, W = arr.shape
    out = arr.copy()
    fold = min if op == "min" else max
    offs = se_offsets(n, shape)
    for r in range(H):
        for c in range(W):
            if arr[r, c] == np.float32(ND):
                continue
            vals = [arr[r + dy, c + dx] for dy, dx in offs
                    if 0 <= r + dy < H and 0 <= c + dx < W
                    and arr[r + dy, c + dx] != np.float32(ND)]
            out[r, c] = np.float32(fold(vals))
    return out


@pytest.mark.parametrize("op,kern", [("min", erode_kernel),
                                     ("max", dilate_kernel)])
@pytest.mark.parametrize("n,shape", [(1, "disk"), (2, "disk"),
                                     (2, "square"), (3, "disk")])
def test_rank_kernels_match_bruteforce(op, kern, n, shape):
    arr = _field((22, 19), seed=100 + n)
    got = kern(arr, ND, n=n, shape=shape)
    want = _brute_rank(arr, n, shape, op)
    assert np.array_equal(got, want)


def test_algebraic_properties():
    arr = _field((30, 28), seed=9)
    valid = arr != np.float32(ND)
    op = open_kernel(arr, ND, n=2)
    cl = close_kernel(arr, ND, n=2)
    # anti-extensive / extensive
    assert np.all(op[valid] <= arr[valid])
    assert np.all(cl[valid] >= arr[valid])
    # idempotent
    assert np.array_equal(open_kernel(op, ND, n=2), op)
    assert np.array_equal(close_kernel(cl, ND, n=2), cl)
    # residuals are nonnegative and consistent
    wt = white_tophat_kernel(arr, ND, n=2)
    bt = black_tophat_kernel(arr, ND, n=2)
    gr = gradient_kernel(arr, ND, n=2)
    assert np.all(wt[valid] >= 0) and np.all(bt[valid] >= 0)
    assert np.all(gr[valid] >= 0)
    assert np.array_equal(wt[valid], (arr - op)[valid])
    # nodata inert everywhere
    for plane in (op, cl, wt, bt, gr):
        assert np.array_equal(plane == np.float32(ND), ~valid)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("op,kern,n", [
    ("erode", erode_kernel, 2),
    ("dilate", dilate_kernel, 2),
    ("gradient", gradient_kernel, 2),
    ("open", open_kernel, 2),
    ("close", close_kernel, 2),
    ("white_tophat", white_tophat_kernel, 3),
    ("black_tophat", black_tophat_kernel, 2),
])
def test_tiled_parity(op, kern, n):
    """Tiled (incl. the fused radius-2n open/close path) == whole-array
    kernel, bit-exact."""
    import ray
    import ray.data

    from balrog_ray.stages.gray_morph import gray_morph

    cfg = SynthConfig(tiles_x=3, tiles_y=2, tile_px=16)
    arr = _field((32, 48), seed=200 + n)
    spec = GridSpec(cfg.tiles_x, cfg.tiles_y, cfg.tile_px,
                    cfg.pixel_size, y_north=cfg.y_north)
    ds = ray.data.from_arrow(_tiles_from_array(arr, cfg, layer="dem"))
    out = gray_morph(ds, spec, op=op, layer="dem", n=n).materialize()
    tabs = [t for t in (ray.get(r) for r in out.to_arrow_refs())
            if t.num_rows]
    got = _mosaic(pa.concat_tables(tabs), op, cfg)
    want = kern(arr, ND, n=n, shape="disk")
    assert np.array_equal(got, want)


def test_reconstruct_whole_oracle_semantics():
    """Reconstruction by dilation floods the mask from the marker:
    a mask with two plateaus and a marker touching only one recovers
    exactly that plateau's heights."""
    mask = np.zeros((12, 20), np.float32)
    mask[2:5, 2:6] = 10.0          # plateau A
    mask[7:10, 12:17] = 7.0        # plateau B (disconnected)
    marker = np.zeros_like(mask)
    marker[3, 3] = 10.0            # seed inside A only
    rec = reconstruct_whole(mask, marker, ND)
    assert np.all(rec[2:5, 2:6] == 10.0)
    assert np.all(rec[7:10, 12:17] == 0.0)


@pytest.mark.usefixtures("ray_session")
def test_reconstruct_tiled_parity():
    import ray
    import ray.data

    from balrog_ray.stages.gray_morph import reconstruct

    cfg = SynthConfig(tiles_x=3, tiles_y=2, tile_px=16)
    rng = np.random.default_rng(77)
    mask = rng.normal(20.0, 5.0, (32, 48)).astype(np.float32)
    mask[rng.random(mask.shape) < 0.04] = ND
    valid = mask != np.float32(ND)
    marker = np.where(valid, (mask - 3.0).astype(np.float32),
                      np.float32(ND))
    spec = GridSpec(cfg.tiles_x, cfg.tiles_y, cfg.tile_px,
                    cfg.pixel_size, y_north=cfg.y_north)
    ds = ray.data.from_arrow(pa.concat_tables([
        _tiles_from_array(mask, cfg, layer="mask"),
        _tiles_from_array(marker, cfg, layer="mark"),
    ]))
    out = reconstruct(ds, spec, mask_layer="mask", marker_layer="mark",
                      out_layer="recon").materialize()
    tabs = [t for t in (ray.get(r) for r in out.to_arrow_refs())
            if t.num_rows]
    got = _mosaic(pa.concat_tables(tabs), "recon", cfg)
    want = reconstruct_whole(mask, marker, ND)
    assert np.array_equal(got, want)


@pytest.mark.usefixtures("ray_session")
def test_h_maxima_suppresses_shallow_peaks():
    """A 2-tall bump vanishes under h=3; a 10-tall peak survives with
    its summit lowered by exactly h; distributed == whole oracle."""
    import ray
    import ray.data

    from balrog_ray.stages.gray_morph import h_maxima

    cfg = SynthConfig(tiles_x=2, tiles_y=2, tile_px=16)
    base = np.zeros((32, 32), np.float32)
    base[4:7, 4:7] = 2.0           # shallow bump
    base[20:23, 20:23] = 10.0      # tall peak
    spec = GridSpec(cfg.tiles_x, cfg.tiles_y, cfg.tile_px,
                    cfg.pixel_size, y_north=cfg.y_north)
    ds = ray.data.from_arrow(_tiles_from_array(base, cfg, layer="dem"))
    out = h_maxima(ds, spec, layer="dem", h=3.0).materialize()
    tabs = [t for t in (ray.get(r) for r in out.to_arrow_refs())
            if t.num_rows]
    got = _mosaic(pa.concat_tables(tabs), "hmax", cfg)
    want = reconstruct_whole(base, base - np.float32(3.0), ND)
    assert np.array_equal(got, want)
    assert np.all(got[4:7, 4:7] == 0.0)          # bump gone
    assert np.all(got[20:23, 20:23] == 7.0)      # peak kept, -h


def test_h_minima_step_duality():
    """Erosion-mode step is the negated dilation-mode step."""
    rng = np.random.default_rng(5)
    mask = rng.normal(0.0, 4.0, (15, 17)).astype(np.float32)
    marker = (mask + 2.0).astype(np.float32)
    up, chg_u = reconstruct_step_kernel(mask, marker, ND,
                                        mode="erosion")
    dn, chg_d = reconstruct_step_kernel(-mask, -marker, ND,
                                        mode="dilation")
    assert np.array_equal(up, -dn)
    assert np.array_equal(chg_u, chg_d)
