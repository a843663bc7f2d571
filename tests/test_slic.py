"""SLIC superpixels: the distributed broadcast-centers iteration must be
BIT-IDENTICAL to the single-process oracle (integer-moment folds), with
nodata pixels unlabeled and every superpixel spatially bounded."""

import numpy as np

from balrog_ray.stages.halo import GridSpec
from balrog_ray.stages.slic import slic_oracle, slic_segment
from balrog_ray.tiles.codec import Caption, decode_tile
from balrog_ray.tiles.synth import SynthConfig, dem_window
from tests.test_filters import ND, _tiles_from_array

CFG = SynthConfig(tiles_x=2, tiles_y=2, tile_px=32)
S, M, ITERS = 8, 10.0, 3


def test_distributed_matches_oracle_bitexact(ray_session):
    import ray.data

    wr, wc = CFG.world_px
    rng = np.random.default_rng(61)
    world = (dem_window(CFG, 0, 0, wr, wc)
             + rng.normal(0, 1.5, (wr, wc))).astype(np.float32)
    world[10:16, 40:52] = ND                      # a nodata cloud
    spec = GridSpec.from_synth(CFG)

    want_lab, want_ctr = slic_oracle(world, ND, spec, S=S, m=M,
                                     n_iter=ITERS)

    ds = ray.data.from_arrow(_tiles_from_array(world, CFG))
    lab_ds, ctab = slic_segment(ds, spec, S=S, m=M, n_iter=ITERS)

    got = np.full((wr, wc), -2.0, np.float32)
    n = 0
    for row in lab_ds.take_all():
        cap = Caption.from_json(row["caption"])
        assert cap.layer == "slic"
        tile = decode_tile(row["bytes"], row["fmt"], cap)
        T = CFG.tile_px
        got[cap.ty * T:(cap.ty + 1) * T,
            cap.tx * T:(cap.tx + 1) * T] = tile
        n += 1
    assert n == CFG.tiles_x * CFG.tiles_y
    want_plane = np.where(want_lab >= 0, want_lab.astype(np.float32),
                          np.float32(-1.0))
    assert np.array_equal(got, want_plane)

    ctr = {int(c): (y, x, v) for c, y, x, v in
           zip(ctab.column("cid").to_pylist(),
               ctab.column("cy").to_pylist(),
               ctab.column("cx").to_pylist(),
               ctab.column("cval").to_pylist())}
    assert set(ctr) == set(want_ctr)
    for cid in ctr:
        assert ctr[cid] == want_ctr[cid]           # bit-exact floats

    # semantic checks: nodata unlabeled, valid labeled, many segments,
    # each segment confined to its center's 2S box
    valid = world != np.float32(ND)
    assert (want_lab[~valid] == -1).all()
    assert (want_lab[valid] >= 0).all()
    labs = np.unique(want_lab[want_lab >= 0])
    assert len(labs) >= 12
    ys, xs = np.nonzero(want_lab >= 0)
    for cid in labs:
        sel = want_lab[ys, xs] == cid
        cy, cx, _ = want_ctr[int(cid)]
        assert (np.abs(ys[sel] - cy) <= 2 * S + 1).all()
        assert (np.abs(xs[sel] - cx) <= 2 * S + 1).all()
