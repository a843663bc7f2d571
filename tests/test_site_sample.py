"""sample_raster vs direct mosaic lookup, plus the composed per-site BAL
rating (BAL pipeline -> bal_max band -> point sample)."""

import numpy as np

from balrog_ray.stages.halo import GridSpec
from balrog_ray.stages.site_sample import OUT_OF_AREA, sample_raster
from balrog_ray.tiles.codec import Caption, decode_tile
from balrog_ray.tiles.synth import SynthConfig, sites_table, tiles_table

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
        out[cap.ty * T:(cap.ty + 1) * T, cap.tx * T:(cap.tx + 1) * T] = arr
    return out


def _oracle_lookup(mosaic, xs, ys, cfg):
    ps = cfg.pixel_size
    H, W = mosaic.shape
    out = np.full(len(xs), OUT_OF_AREA)
    for i, (x, y) in enumerate(zip(xs, ys)):
        c = int(np.floor(x / ps))
        r = int(np.floor((cfg.y_north - y) / ps))
        if 0 <= r < H and 0 <= c < W and mosaic[r, c] != np.float32(ND):
            out[i] = float(mosaic[r, c])
    return out


def test_sample_raster_matches_mosaic_lookup(ray_session):
    import ray.data

    cfg = SynthConfig(tiles_x=3, tiles_y=2, tile_px=32)
    tab = tiles_table(cfg)
    spec = GridSpec.from_synth(cfg)
    sites = sites_table(cfg, n=50)      # includes 2 out-of-grid sites
    dem = _mosaic(tab, "dem", cfg)

    got = sample_raster(ray.data.from_arrow(sites),
                        ray.data.from_arrow(tab), spec,
                        layer="dem").take_all()
    assert len(got) == 50               # row conservation incl. outside
    exp = _oracle_lookup(dem, sites.column("x").to_numpy(),
                         sites.column("y").to_numpy(), cfg)
    by_id = {r["site_id"]: r["value"] for r in got}
    for i, sid in enumerate(sites.column("site_id").to_pylist()):
        assert np.isclose(by_id[sid], exp[i]), sid
    assert any(v == OUT_OF_AREA for v in by_id.values())


def test_site_bal_rating_composition(ray_session):
    import ray.data

    from balrog_ray.pipelines.bal_pipeline import bal_pipeline

    cfg = SynthConfig(tiles_x=3, tiles_y=3, tile_px=32)
    tab = tiles_table(cfg)
    spec = GridSpec.from_synth(cfg)
    bal = bal_pipeline(ray.data.from_arrow(tab), spec).materialize()
    sites = sites_table(cfg, n=40)

    got = sample_raster(ray.data.from_arrow(sites), bal, spec,
                        layer="bal_max", value_col="bal_class").take_all()
    assert len(got) == 40
    bal_tab = bal.take_all()
    import pyarrow as pa
    bal_arrow = pa.Table.from_pylist(bal_tab)
    mosaic = _mosaic(bal_arrow, "bal_max", cfg)
    exp = _oracle_lookup(mosaic, sites.column("x").to_numpy(),
                         sites.column("y").to_numpy(), cfg)
    by_id = {r["site_id"]: r["bal_class"] for r in got}
    ids = sites.column("site_id").to_pylist()
    for i, sid in enumerate(ids):
        assert np.isclose(by_id[sid], exp[i]), sid
    # every in-grid value is a legal AS 3959 output level
    legal = {100.0, 40.0, 29.0, 19.0, 12.5, 200.0, OUT_OF_AREA}
    assert {round(v, 1) for v in by_id.values()} <= legal
