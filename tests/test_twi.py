"""TWI composite parity: the three-stage pipeline (flow accumulation +
Horn slope + raster_calc join) must equal the whole-raster kernel."""

import numpy as np

from balrog_ray.stages.halo import GridSpec
from balrog_ray.stages.twi import twi, twi_kernel
from balrog_ray.tiles.codec import Caption, decode_tile
from balrog_ray.tiles.synth import SynthConfig, tiles_table

ND = -99.0


def test_twi_pipeline_matches_whole_raster(ray_session):
    import ray.data

    cfg = SynthConfig(tiles_x=3, tiles_y=2, tile_px=32)
    tab = tiles_table(cfg)
    spec = GridSpec.from_synth(cfg)
    T = cfg.tile_px
    dem = np.full((cfg.tiles_y * T, cfg.tiles_x * T), ND, np.float32)
    for i in range(tab.num_rows):
        cap = Caption.from_json(tab.column("caption")[i].as_py())
        if cap.layer != "dem":
            continue
        arr = decode_tile(tab.column("bytes")[i].as_py(),
                          tab.column("fmt")[i].as_py(), cap)
        dem[cap.ty * T:(cap.ty + 1) * T, cap.tx * T:(cap.tx + 1) * T] = arr

    want = twi_kernel(dem, cfg.pixel_size, ND)
    out = twi(ray.data.from_arrow(tab), spec).take_all()
    assert len(out) == cfg.tiles_x * cfg.tiles_y
    for row in out:
        cap = Caption.from_json(row["caption"])
        assert cap.layer == "twi"
        arr = decode_tile(row["bytes"], row["fmt"], cap)
        w = want[cap.ty * T:(cap.ty + 1) * T, cap.tx * T:(cap.tx + 1) * T]
        nd = arr == np.float32(ND)
        assert (nd == (w == np.float32(ND))).all(), (cap.tx, cap.ty)
        assert np.allclose(arr[~nd], w[~nd], atol=1e-4), (cap.tx, cap.ty)
    # sanity: wetness grows with accumulation -- the global max TWI pixel
    # must have above-median accumulation
    valid = want != np.float32(ND)
    assert valid.any() and np.isfinite(want[valid]).all()
