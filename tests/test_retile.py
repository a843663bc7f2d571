"""Retile parity: re-blocking an image table to any tile size must keep
every pixel bit-exact (mosaic equality on the source extent), pad past
the source extent with nodata, and survive a non-divisor roundtrip."""

import numpy as np
import pytest

from balrog_ray.stages.halo import GridSpec
from balrog_ray.stages.retile import retile, retiled_spec
from balrog_ray.tiles.codec import Caption, decode_tile
from balrog_ray.tiles.synth import SynthConfig, tiles_table

ND = -99.0


def _mosaic(tab, spec, layer):
    T = spec.tile_px
    out = np.full((spec.tiles_y * T, spec.tiles_x * T), ND, np.float32)
    for i in range(tab.num_rows):
        cap = Caption.from_json(tab.column("caption")[i].as_py())
        if cap.layer != layer:
            continue
        arr = decode_tile(tab.column("bytes")[i].as_py(),
                          tab.column("fmt")[i].as_py(), cap)
        out[cap.ty * T:(cap.ty + 1) * T, cap.tx * T:(cap.tx + 1) * T] = arr
    return out


@pytest.mark.parametrize("out_px", [16, 48, 96])
def test_retile_pixel_exact(ray_session, out_px):
    import pyarrow as pa
    import ray
    import ray.data

    cfg = SynthConfig(tiles_x=3, tiles_y=2, tile_px=32)
    tab = tiles_table(cfg)
    spec = GridSpec.from_synth(cfg)
    res, out_spec = retile(ray.data.from_arrow(tab), spec, out_px)
    assert out_spec == retiled_spec(spec, out_px)
    got_tab = pa.concat_tables(ray.get(res.to_arrow_refs()))

    H, W = spec.tiles_y * spec.tile_px, spec.tiles_x * spec.tile_px
    for layer in ("dem", "veg"):
        want = _mosaic(tab, spec, layer)
        got = _mosaic(got_tab, out_spec, layer)
        np.testing.assert_array_equal(got[:H, :W], want)
        # padding past the source extent is pure nodata
        assert (got[H:, :] == np.float32(ND)).all()
        assert (got[:, W:] == np.float32(ND)).all()

    # every (layer, tile) appears exactly once
    ids = got_tab.column("image_id").to_pylist()
    assert len(ids) == len(set(ids))
    n_layers = len({Caption.from_json(c).layer
                    for c in tab.column("caption").to_pylist()})
    assert len(ids) == n_layers * out_spec.tiles_x * out_spec.tiles_y


def test_retile_roundtrip_non_divisor(ray_session):
    import pyarrow as pa
    import ray
    import ray.data

    cfg = SynthConfig(tiles_x=2, tiles_y=2, tile_px=32)
    tab = tiles_table(cfg)
    spec = GridSpec.from_synth(cfg)
    mid, mid_spec = retile(ray.data.from_arrow(tab), spec, 48)
    back, back_spec = retile(mid, mid_spec, 32)
    got_tab = pa.concat_tables(ray.get(back.to_arrow_refs()))
    H = W = 64
    for layer in ("dem", "veg"):
        want = _mosaic(tab, spec, layer)
        got = _mosaic(got_tab, back_spec, layer)
        np.testing.assert_array_equal(got[:H, :W], want)
