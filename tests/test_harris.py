"""Harris corners: integral-image kernel vs per-pixel brute force, and
tiled halo pipeline bit-identical to the whole-world kernel run."""

import numpy as np

from balrog_ray.stages.halo import GridSpec
from balrog_ray.stages.harris import harris_corners, harris_kernel
from balrog_ray.tiles.codec import Caption, decode_tile
from balrog_ray.tiles.synth import SynthConfig, dem_window
from tests.test_filters import ND, _tiles_from_array

CFG = SynthConfig(tiles_x=3, tiles_y=2, tile_px=32)
K, R, NMS_R = 0.05, 2, 2


def _brute(arr, k, radius, nms_radius, thr):
    a32 = np.asarray(arr, np.float32)
    H, W = a32.shape
    valid = a32 != np.float32(ND)
    a = np.where(valid, a32.astype(np.float64), 0.0)
    gdef = np.zeros((H, W), bool)
    gx = np.zeros((H, W))
    gy = np.zeros((H, W))
    for y in range(1, H - 1):
        for x in range(1, W - 1):
            if not valid[y - 1:y + 2, x - 1:x + 2].all():
                continue
            gdef[y, x] = True
            gx[y, x] = ((a[y - 1, x + 1] + 2 * a[y, x + 1]
                         + a[y + 1, x + 1])
                        - (a[y - 1, x - 1] + 2 * a[y, x - 1]
                           + a[y + 1, x - 1]))
            gy[y, x] = ((a[y + 1, x - 1] + 2 * a[y + 1, x]
                         + a[y + 1, x + 1])
                        - (a[y - 1, x - 1] + 2 * a[y - 1, x]
                           + a[y - 1, x + 1]))
    resp = np.full((H, W), -np.inf)
    for y in range(radius, H - radius):
        for x in range(radius, W - radius):
            wd = gdef[y - radius:y + radius + 1,
                      x - radius:x + radius + 1]
            if not wd.all():
                continue
            wx = gx[y - radius:y + radius + 1,
                    x - radius:x + radius + 1]
            wy = gy[y - radius:y + radius + 1,
                    x - radius:x + radius + 1]
            sxx, syy, sxy = (wx * wx).sum(), (wy * wy).sum(), \
                (wx * wy).sum()
            resp[y, x] = (sxx * syy - sxy * sxy
                          - k * (sxx + syy) * (sxx + syy))
    out = np.full((H, W), np.float32(ND), np.float32)
    for y in range(H):
        for x in range(W):
            if not np.isfinite(resp[y, x]) or resp[y, x] <= thr:
                continue
            y0, y1 = max(0, y - nms_radius), min(H, y + nms_radius + 1)
            x0, x1 = max(0, x - nms_radius), min(W, x + nms_radius + 1)
            if resp[y, x] >= resp[y0:y1, x0:x1].max():
                out[y, x] = np.float32(resp[y, x])
    return out


def test_kernel_matches_brute_force():
    rng = np.random.default_rng(19)
    arr = rng.uniform(0, 60, (22, 20)).astype(np.float32)
    arr[rng.random((22, 20)) < 0.03] = ND
    got = harris_kernel(arr, ND, k=K, radius=R, nms_radius=NMS_R,
                        thr=0.0)
    want = _brute(arr, K, R, NMS_R, 0.0)
    nd = got == np.float32(ND)
    assert (nd == (want == np.float32(ND))).all()
    assert np.allclose(got[~nd], want[~nd], rtol=1e-6)
    assert (~nd).sum() > 0


def test_tiled_pipeline_matches_whole_world(ray_session):
    import ray.data

    wr, wc = CFG.world_px
    rng = np.random.default_rng(29)
    world = (dem_window(CFG, 0, 0, wr, wc)
             + rng.normal(0, 2.0, (wr, wc))).astype(np.float32)
    ds = ray.data.from_arrow(_tiles_from_array(world, CFG))
    out = harris_corners(ds, GridSpec.from_synth(CFG), k=K, radius=R,
                         nms_radius=NMS_R, thr=0.0)
    want = harris_kernel(world, ND, k=K, radius=R, nms_radius=NMS_R,
                         thr=0.0)
    got = np.full((wr, wc), np.nan, np.float32)
    n = 0
    for row in out.take_all():
        cap = Caption.from_json(row["caption"])
        assert cap.layer == "harris"
        tile = decode_tile(row["bytes"], row["fmt"], cap)
        T = CFG.tile_px
        got[cap.ty * T:(cap.ty + 1) * T,
            cap.tx * T:(cap.tx + 1) * T] = tile
        n += 1
    assert n == CFG.tiles_x * CFG.tiles_y
    assert np.array_equal(got, want)
    n_corners = int((want != np.float32(ND)).sum())
    assert n_corners > 5           # the case exercises real corners
