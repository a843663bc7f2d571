"""Stereo block matching: kernel vs per-pixel SAD loop oracle, planted
integer shift recovered exactly, tiled dual-plane parity bit-exact."""

import numpy as np

from balrog_ray.stages.halo import GridSpec
from balrog_ray.stages.ssim import dual_epoch_stage  # noqa: F401
from balrog_ray.stages.stereo import disparity_kernel, stereo_disparity
from balrog_ray.tiles.codec import NODATA, Caption, decode_tile
from balrog_ray.tiles.synth import SynthConfig, epoch_dem_window

ND = -99.0
R, DMAX = 2, 4


def _brute(a, b, radius, d_max):
    a32 = np.asarray(a, np.float32)
    b32 = np.asarray(b, np.float32)
    H, W = a32.shape
    va = a32 != np.float32(ND)
    vb = b32 != np.float32(ND)
    af = a32.astype(np.float64)
    bf = b32.astype(np.float64)
    out = np.full((H, W), np.float32(ND), np.float32)
    for y in range(radius, H - radius):
        for x in range(radius, W - radius):
            best, bd = np.inf, -1
            for d in range(d_max + 1):
                if x - d - radius < 0:
                    continue
                wa = va[y - radius:y + radius + 1,
                        x - radius:x + radius + 1]
                wb = vb[y - radius:y + radius + 1,
                        x - d - radius:x - d + radius + 1]
                if not (wa.all() and wb.all()):
                    continue
                pa_ = af[y - radius:y + radius + 1,
                         x - radius:x + radius + 1]
                pb = bf[y - radius:y + radius + 1,
                        x - d - radius:x - d + radius + 1]
                sad = np.abs(pa_ - pb).sum()
                if sad < best:
                    best, bd = sad, d
            if bd >= 0:
                out[y, x] = np.float32(bd)
    return out


def test_kernel_matches_brute_force():
    rng = np.random.default_rng(51)
    a = rng.uniform(0, 80, (18, 22)).astype(np.float32)
    b = rng.uniform(0, 80, (18, 22)).astype(np.float32)
    a[rng.random(a.shape) < 0.04] = ND
    b[rng.random(b.shape) < 0.04] = ND
    got = disparity_kernel(a, b, ND, radius=R, d_max=DMAX)
    want = _brute(a, b, R, DMAX)
    assert np.array_equal(got, want)
    assert (got != np.float32(ND)).sum() > 20


def test_planted_shift_recovered():
    rng = np.random.default_rng(7)
    a = rng.uniform(0, 100, (24, 30)).astype(np.float32)
    b = np.full_like(a, 0.0)
    # right-camera convention: the scene appears 3 px further left in B,
    # so the match for A's column x sits at B's column x - 3
    b[:, :-3] = a[:, 3:]
    got = disparity_kernel(a, b, ND, radius=R, d_max=DMAX)
    # interior region where the d=3 candidate window is valid on both
    # sides and B's synthetic right-edge fill is out of reach
    interior = got[R:-R, R + DMAX:-(3 + R)]
    assert interior.size > 100
    assert (interior == np.float32(3.0)).all()


def test_tiled_pipeline_matches_whole_world(ray_session):
    import ray.data

    from balrog_ray.tiles.synth import temporal_tiles_table

    cfg = SynthConfig(tiles_x=3, tiles_y=2, tile_px=32)
    ds = ray.data.from_arrow(temporal_tiles_table(cfg, 3))
    spec = GridSpec.from_synth(cfg)
    out = stereo_disparity(ds, spec, epoch_a=0, epoch_b=2, radius=R,
                           d_max=DMAX)

    wr, wc = cfg.world_px
    ga = epoch_dem_window(cfg, 0, 0, 0, wr, wc).astype(np.float32)
    gb = epoch_dem_window(cfg, 2, 0, 0, wr, wc).astype(np.float32)
    want = disparity_kernel(ga, gb, NODATA, radius=R, d_max=DMAX)

    got = np.full((wr, wc), np.nan, np.float32)
    n = 0
    for row in out.take_all():
        cap = Caption.from_json(row["caption"])
        assert cap.layer == "disparity"
        tile = decode_tile(row["bytes"], row["fmt"], cap)
        T = cfg.tile_px
        got[cap.ty * T:(cap.ty + 1) * T,
            cap.tx * T:(cap.tx + 1) * T] = tile
        n += 1
    assert n == cfg.tiles_x * cfg.tiles_y
    assert np.array_equal(got, want)
    m = want != np.float32(NODATA)
    assert m.any()
    assert len(np.unique(want[m])) > 1       # non-trivial disparity field
