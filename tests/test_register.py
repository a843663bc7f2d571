"""Phase-correlation registration: exact circular-shift recovery, a
global (non-circular) planted shift recovered by the distributed vote
fold, and cloudy tiles abstaining."""

import numpy as np
import pyarrow as pa

from balrog_ray.stages.halo import GridSpec
from balrog_ray.stages.register import (global_shift, phase_shift_kernel,
                                        phase_votes)
from balrog_ray.tiles.codec import Caption, encode_tile, phash64
from balrog_ray.tiles.synth import TILES_SCHEMA, SynthConfig

ND = -99.0
CFG = SynthConfig(tiles_x=3, tiles_y=2, tile_px=32)


def test_circular_shift_exact():
    rng = np.random.default_rng(3)
    a = rng.uniform(0, 100, (32, 32)).astype(np.float32)
    for s in ((4, -3), (0, 0), (-7, 5)):
        b = np.roll(a, s, (0, 1)).astype(np.float32)
        dy, dx, peak = phase_shift_kernel(a, b, ND)
        assert (dy, dx) == s
        assert peak > 0.9


def _epoch_tiles(world_by_epoch, cfg):
    T = cfg.tile_px
    rows = {n: [] for n in TILES_SCHEMA.names}
    rows["epoch"] = []
    for e, world in world_by_epoch.items():
        for ty in range(cfg.tiles_y):
            for tx in range(cfg.tiles_x):
                core = np.ascontiguousarray(
                    world[ty * T:(ty + 1) * T, tx * T:(tx + 1) * T])
                cap = Caption(layer="dem", x0=tx * T * cfg.pixel_size,
                              y0=cfg.y_north - ty * T * cfg.pixel_size,
                              pixel_size=cfg.pixel_size, nodata=ND,
                              tx=tx, ty=ty,
                              edge={"n": ty == 0,
                                    "s": ty == cfg.tiles_y - 1,
                                    "w": tx == 0,
                                    "e": tx == cfg.tiles_x - 1})
                payload, cap = encode_tile(core, "npz", cap)
                rows["image_id"].append(f"dem/e{e}/{tx}/{ty}")
                rows["bytes"].append(payload)
                rows["w"].append(np.int32(T))
                rows["h"].append(np.int32(T))
                rows["fmt"].append("npz")
                rows["caption"].append(cap.to_json())
                rows["phash"].append(np.int64(phash64(core)))
                rows["epoch"].append(np.int64(e))
    schema = TILES_SCHEMA.append(pa.field("epoch", pa.int64()))
    return pa.table({n: rows[n] for n in schema.names}, schema=schema)


def test_global_vote_recovers_planted_shift(ray_session):
    import ray.data

    rng = np.random.default_rng(13)
    wr, wc = CFG.world_px
    pad = 8
    big = rng.uniform(0, 100, (wr + 2 * pad, wc + 2 * pad)) \
        .astype(np.float32)
    a = big[pad:pad + wr, pad:pad + wc]
    # B is the same scene acquired shifted by (dy, dx) = (2, 3)
    b = big[pad - 2:pad - 2 + wr, pad - 3:pad - 3 + wc]
    # one cloudy tile in B must abstain, not poison the vote
    b = b.copy()
    b[:16, :16] = ND

    tab = _epoch_tiles({0: a, 1: b}, CFG)
    ds = ray.data.from_arrow(tab)
    spec = GridSpec.from_synth(CFG)
    votes = phase_votes(ds, spec, epoch_a=0, epoch_b=1,
                        min_valid_frac=0.9)
    vrows = votes.take_all()
    assert 0 < len(vrows) <= CFG.tiles_x * CFG.tiles_y - 1
    top = global_shift(votes).take_all()
    assert len(top) == 1
    assert (top[0]["dy"], top[0]["dx"]) == (2, 3)
    assert top[0]["n_tiles"] == len([r for r in vrows
                                     if (r["dy"], r["dx"]) == (2, 3)])
