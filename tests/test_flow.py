"""Dense Lucas-Kanade flow: kernel vs per-pixel least-squares oracle,
planted translation recovered, and tiled dual-plane pipeline bit-exact
with the whole-world kernel run."""

import numpy as np
import pyarrow as pa

from balrog_ray.stages.flow import lk_flow_kernel, optical_flow
from balrog_ray.stages.halo import GridSpec
from balrog_ray.tiles.codec import NODATA, Caption, decode_tile
from balrog_ray.tiles.synth import (SynthConfig, epoch_dem_window,
                                    temporal_tiles_table)

CFG = SynthConfig(tiles_x=3, tiles_y=2, tile_px=32)
ND = -99.0
R = 3


def _brute(a, b, radius, eps):
    a32 = np.asarray(a, np.float32)
    b32 = np.asarray(b, np.float32)
    H, W = a32.shape
    both = (a32 != np.float32(ND)) & (b32 != np.float32(ND))
    av = np.where(both, a32.astype(np.float64), 0.0)
    bv = np.where(both, b32.astype(np.float64), 0.0)
    gdef = np.zeros((H, W), bool)
    ix = np.zeros((H, W))
    iy = np.zeros((H, W))
    for y in range(1, H - 1):
        for x in range(1, W - 1):
            if not both[y - 1:y + 2, x - 1:x + 2].all():
                continue
            gdef[y, x] = True
            ix[y, x] = ((av[y - 1, x + 1] + 2 * av[y, x + 1]
                         + av[y + 1, x + 1])
                        - (av[y - 1, x - 1] + 2 * av[y, x - 1]
                           + av[y + 1, x - 1]))
            iy[y, x] = ((av[y + 1, x - 1] + 2 * av[y + 1, x]
                         + av[y + 1, x + 1])
                        - (av[y - 1, x - 1] + 2 * av[y - 1, x]
                           + av[y - 1, x + 1]))
    ix *= 0.125
    iy *= 0.125
    it = np.where(gdef, bv - av, 0.0)
    u = np.full((H, W), np.float32(ND), np.float32)
    v = np.full((H, W), np.float32(ND), np.float32)
    for y in range(radius, H - radius):
        for x in range(radius, W - radius):
            wd = gdef[y - radius:y + radius + 1,
                      x - radius:x + radius + 1]
            if not wd.all():
                continue
            wx = ix[y - radius:y + radius + 1,
                    x - radius:x + radius + 1].ravel()
            wy = iy[y - radius:y + radius + 1,
                    x - radius:x + radius + 1].ravel()
            wt = it[y - radius:y + radius + 1,
                    x - radius:x + radius + 1].ravel()
            sxx, syy, sxy = (wx * wx).sum(), (wy * wy).sum(), \
                (wx * wy).sum()
            sxt, syt = (wx * wt).sum(), (wy * wt).sum()
            det = sxx * syy - sxy * sxy
            tr = sxx + syy
            if not (det > eps * tr * tr and tr > 0.0):
                continue
            u[y, x] = np.float32(-(syy * sxt - sxy * syt) / det)
            v[y, x] = np.float32(-(sxx * syt - sxy * sxt) / det)
    return u, v


def test_kernel_matches_brute_force():
    rng = np.random.default_rng(41)
    gy, gx = np.mgrid[0:26, 0:24].astype(np.float64)
    a = (30 * np.sin(gx / 4.0) * np.cos(gy / 5.0)).astype(np.float32)
    b = (a + rng.normal(0, 0.5, a.shape)).astype(np.float32)
    a[rng.random(a.shape) < 0.02] = ND
    u, v = lk_flow_kernel(a, b, ND, radius=2, eps=1e-4)
    wu, wv = _brute(a, b, 2, 1e-4)
    assert np.array_equal(u == np.float32(ND), wu == np.float32(ND))
    m = u != np.float32(ND)
    assert m.sum() > 20
    assert np.allclose(u[m], wu[m], rtol=1e-5, atol=1e-7)
    assert np.allclose(v[m], wv[m], rtol=1e-5, atol=1e-7)


def test_planted_translation_recovered():
    gy, gx = np.mgrid[0:48, 0:48].astype(np.float64)
    f = 50 * np.sin(gx / 9.0) + 40 * np.cos(gy / 11.0) \
        + 20 * np.sin((gx + gy) / 13.0)
    a = f.astype(np.float32)
    b = (50 * np.sin((gx - 1) / 9.0) + 40 * np.cos((gy - 1) / 11.0)
         + 20 * np.sin((gx - 1 + gy - 1) / 13.0)).astype(np.float32)
    u, v = lk_flow_kernel(a, b, ND, radius=4, eps=1e-4)
    m = u != np.float32(ND)
    assert m.sum() > 500
    assert abs(np.median(u[m].astype(np.float64)) - 1.0) < 0.15
    assert abs(np.median(v[m].astype(np.float64)) - 1.0) < 0.15


def test_tiled_pipeline_matches_whole_world(ray_session):
    import ray.data

    ds = ray.data.from_arrow(temporal_tiles_table(CFG, 3))
    spec = GridSpec.from_synth(CFG)
    out = optical_flow(ds, spec, epoch_a=0, epoch_b=2, radius=R)

    wr, wc = CFG.world_px
    ga = epoch_dem_window(CFG, 0, 0, 0, wr, wc).astype(np.float32)
    gb = epoch_dem_window(CFG, 2, 0, 0, wr, wc).astype(np.float32)
    wu, wv = lk_flow_kernel(ga, gb, NODATA, radius=R, eps=1e-4)

    got = {"flow_u": np.full((wr, wc), np.nan, np.float32),
           "flow_v": np.full((wr, wc), np.nan, np.float32)}
    n = 0
    for row in out.take_all():
        cap = Caption.from_json(row["caption"])
        tile = decode_tile(row["bytes"], row["fmt"], cap)
        T = CFG.tile_px
        got[cap.layer][cap.ty * T:(cap.ty + 1) * T,
                       cap.tx * T:(cap.tx + 1) * T] = tile
        n += 1
    assert n == 2 * CFG.tiles_x * CFG.tiles_y
    assert np.array_equal(got["flow_u"], wu)
    assert np.array_equal(got["flow_v"], wv)
    m = wu != np.float32(NODATA)
    assert m.any() and not m.all()
