"""Hough transform: vectorized accumulation vs an independent per-pixel
loop oracle, tiled fold == whole-world accumulator, and a planted line
recovered as the top peak with exact vote count."""

import numpy as np
import pyarrow as pa

from balrog_ray.stages.halo import GridSpec
from balrog_ray.stages.hough import hough_accumulate, hough_lines
from tests.test_filters import ND, _tiles_from_array

from balrog_ray.tiles.synth import SynthConfig

CFG = SynthConfig(tiles_x=2, tiles_y=2, tile_px=32)
N_THETA = 36
RHO_RES = 1.0


def _loop_oracle(world, n_theta, rho_res, rho_max):
    acc = {}
    t = np.arange(n_theta, dtype=np.float64) * (np.pi / n_theta)
    cos, sin = np.cos(t), np.sin(t)
    H, W = world.shape
    for y in range(H):
        for x in range(W):
            if world[y, x] != np.float32(1.0):
                continue
            for ti in range(n_theta):
                rho = x * cos[ti] + y * sin[ti]
                ri = int(np.floor((rho + rho_max) / rho_res))
                acc[(ti, ri)] = acc.get((ti, ri), 0) + 1
    return acc


def test_accumulate_matches_loop_oracle():
    rng = np.random.default_rng(21)
    world = np.zeros((20, 18), np.float32)
    world[rng.random((20, 18)) < 0.1] = 1.0
    rho_max = float(np.hypot(18, 20))
    ti, ri, v = hough_accumulate(world, 0, 0, n_theta=N_THETA,
                                 rho_res=RHO_RES, rho_max=rho_max)
    got = {(int(a), int(b)): int(c) for a, b, c in zip(ti, ri, v)}
    assert got == _loop_oracle(world, N_THETA, RHO_RES, rho_max)


def test_tiled_fold_matches_whole_world(ray_session):
    import ray.data

    rng = np.random.default_rng(33)
    wr, wc = CFG.world_px
    world = np.zeros((wr, wc), np.float32)
    world[rng.random((wr, wc)) < 0.05] = 1.0
    world[10, :] = 1.0                       # planted horizontal line
    ds = ray.data.from_arrow(_tiles_from_array(world, CFG))
    spec = GridSpec.from_synth(CFG)
    peaks = hough_lines(ds, spec, layer="dem", n_theta=N_THETA,
                        rho_res=RHO_RES, k_top=5).take_all()

    rho_max = float(np.hypot(wc, wr))
    ti, ri, v = hough_accumulate(world, 0, 0, n_theta=N_THETA,
                                 rho_res=RHO_RES, rho_max=rho_max)
    acc = {(int(a), int(b)): int(c) for a, b, c in zip(ti, ri, v)}
    want = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    got = [((r["theta_i"], r["rho_i"]), r["votes"]) for r in peaks]
    assert got == want

    # the planted line is the undisputed top peak: theta = pi/2
    (t0, r0), votes = got[0]
    assert t0 == N_THETA // 2
    assert votes == wc
    assert r0 == int(np.floor((10.0 + rho_max) / RHO_RES)) or \
        abs(10.0 + rho_max - r0 * RHO_RES) < RHO_RES
