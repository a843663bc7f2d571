"""Zhang-Suen thinning: sub-step vs per-pixel loop oracle, thick
strokes reduce to ~1 px lines, tiled iteration bit-exact with the
whole-world kernel."""

import numpy as np

from balrog_ray.stages.halo import GridSpec
from balrog_ray.stages.skeleton import (skeleton_kernel, skeletonize,
                                        zs_step_kernel)
from balrog_ray.tiles.codec import Caption, decode_tile
from balrog_ray.tiles.synth import SynthConfig
from tests.test_filters import ND, _tiles_from_array

CFG = SynthConfig(tiles_x=2, tiles_y=2, tile_px=32)


def _loop_step(arr, sub):
    a = np.asarray(arr, np.float32)
    H, W = a.shape
    fg = a == np.float32(1.0)

    def nb(y, x):
        offs = [(-1, 0), (-1, 1), (0, 1), (1, 1),
                (1, 0), (1, -1), (0, -1), (-1, -1)]
        vals = []
        for dy, dx in offs:
            yy, xx = y + dy, x + dx
            vals.append(bool(fg[yy, xx]) if 0 <= yy < H and 0 <= xx < W
                        else False)
        return vals

    out = a.copy()
    for y in range(H):
        for x in range(W):
            if not fg[y, x]:
                continue
            P = nb(y, x)
            B = sum(P)
            A = sum((not P[i]) and P[(i + 1) % 8] for i in range(8))
            if sub == 0:
                c = (not (P[0] and P[2] and P[4])) and \
                    (not (P[2] and P[4] and P[6]))
            else:
                c = (not (P[0] and P[2] and P[6])) and \
                    (not (P[0] and P[4] and P[6]))
            if 2 <= B <= 6 and A == 1 and c:
                out[y, x] = 0.0
    return out


def _stroke_world():
    wr, wc = CFG.world_px
    w = np.zeros((wr, wc), np.float32)
    w[20:27, 4:60] = 1.0                       # 7-px horizontal bar
    w[4:60, 30:35] = 1.0                       # 5-px vertical bar
    rr = np.arange(8, 56)
    for d in range(-2, 3):                      # 5-px diagonal stroke
        w[np.clip(rr + d, 0, wr - 1), rr] = 1.0
    return w


def test_substep_matches_loop_oracle():
    w = _stroke_world()[:40, :40]
    for sub in (0, 1):
        got = zs_step_kernel(w, ND, sub)
        assert np.array_equal(got, _loop_step(w, sub))


def test_skeleton_thins_to_unit_width():
    w = np.zeros((30, 60), np.float32)
    w[10:17, 5:55] = 1.0                       # 7 x 50 bar
    sk = skeleton_kernel(w, ND)
    n = int((sk == 1.0).sum())
    assert 40 <= n <= 60                        # ~one 1-px centerline
    # every skeleton pixel sits inside the original stroke
    assert ((sk == 1.0) <= (w == 1.0)).all()


def test_tiled_matches_whole_world(ray_session):
    import ray.data

    world = _stroke_world()
    want = skeleton_kernel(world, ND)
    ds = ray.data.from_arrow(_tiles_from_array(world, CFG))
    out = skeletonize(ds, GridSpec.from_synth(CFG), layer="dem")

    wr, wc = CFG.world_px
    got = np.full((wr, wc), np.nan, np.float32)
    n = 0
    for row in out.take_all():
        cap = Caption.from_json(row["caption"])
        assert cap.layer == "skeleton"
        tile = decode_tile(row["bytes"], row["fmt"], cap)
        T = CFG.tile_px
        got[cap.ty * T:(cap.ty + 1) * T,
            cap.tx * T:(cap.tx + 1) * T] = tile
        n += 1
    assert n == CFG.tiles_x * CFG.tiles_y
    assert np.array_equal(got, want)
    assert 0 < (want == 1.0).sum() < (world == 1.0).sum()
