"""layer_statistics vs whole-mosaic numpy (nodata-masked), incl. the
layer filter."""

import numpy as np

from balrog_ray.stages.stats import layer_statistics
from balrog_ray.tiles.codec import Caption, decode_tile
from balrog_ray.tiles.synth import SynthConfig, tiles_table

ND = -99.0


def _mosaic(tab, layer, cfg):
    T = cfg.tile_px
    out = np.full((cfg.tiles_y * T, cfg.tiles_x * T), ND, np.float32)
    for i in range(tab.num_rows):
        cap = Caption.from_json(tab.column("caption")[i].as_py())
        if cap.layer != layer:
            continue
        arr = decode_tile(tab.column("bytes")[i].as_py(),
                          tab.column("fmt")[i].as_py(), cap)
        out[cap.ty * T:(cap.ty + 1) * T,
            cap.tx * T:(cap.tx + 1) * T] = arr
    return out


def test_layer_statistics(ray_session):
    import ray.data

    cfg = SynthConfig(tiles_x=3, tiles_y=3, tile_px=32)
    tab = tiles_table(cfg)
    got = {r["layer"]: r for r in
           layer_statistics(ray.data.from_arrow(tab)).take_all()}
    assert set(got) == {"dem", "veg"}
    for layer in ("dem", "veg"):
        v = _mosaic(tab, layer, cfg)
        v = v[v != np.float32(ND)].astype(np.float64)
        r = got[layer]
        assert r["n_valid"] == v.size
        assert np.isclose(r["mean"], v.mean(), rtol=1e-12)
        assert np.isclose(r["std"], v.std(), rtol=1e-9)
        assert r["min"] == v.min() and r["max"] == v.max()
    # the dem layer has a nodata hole: count must be below full size
    assert got["dem"]["n_valid"] < cfg.tiles_x * cfg.tiles_y \
        * cfg.tile_px ** 2

    only = layer_statistics(ray.data.from_arrow(tab),
                            layers=("veg",)).take_all()
    assert [r["layer"] for r in only] == ["veg"]
