"""Raster-zone zonal statistics vs a whole-raster numpy oracle: counts,
min and max exact; totals/means to float tolerance (per-tile partial
sums reassociate the float64 adds)."""

import numpy as np
import pyarrow as pa
import pytest

from balrog_ray.stages.halo import GridSpec
from balrog_ray.stages.zone_stats import zonal_by_zone_raster
from balrog_ray.tiles.codec import Caption, encode_tile, phash64
from balrog_ray.tiles.synth import TILES_SCHEMA, SynthConfig

ND = -99.0


def _tiles_from_arrays(named_arrays, cfg) -> pa.Table:
    T = cfg.tile_px
    rows = {n: [] for n in TILES_SCHEMA.names}
    for layer, arr in named_arrays.items():
        for ty in range(cfg.tiles_y):
            for tx in range(cfg.tiles_x):
                core = np.ascontiguousarray(
                    arr[ty * T:(ty + 1) * T,
                        tx * T:(tx + 1) * T].astype(np.float32))
                cap = Caption(layer=layer, x0=tx * T * cfg.pixel_size,
                              y0=cfg.y_north - ty * T * cfg.pixel_size,
                              pixel_size=cfg.pixel_size, nodata=ND,
                              tx=tx, ty=ty,
                              edge={"n": ty == 0,
                                    "s": ty == cfg.tiles_y - 1,
                                    "w": tx == 0,
                                    "e": tx == cfg.tiles_x - 1})
                payload, cap = encode_tile(core, "npz", cap)
                rows["image_id"].append(f"{layer}/{tx}/{ty}")
                rows["bytes"].append(payload)
                rows["w"].append(np.int32(T))
                rows["h"].append(np.int32(T))
                rows["fmt"].append("npz")
                rows["caption"].append(cap.to_json())
                rows["phash"].append(np.int64(phash64(core)))
    return pa.table(rows, schema=TILES_SCHEMA)


@pytest.mark.parametrize("seed", [0, 1])
def test_zonal_by_zone_matches_numpy(ray_session, seed):
    import ray

    rng = np.random.default_rng(seed)
    cfg = SynthConfig(tiles_x=3, tiles_y=2, tile_px=16)
    shape = (cfg.tiles_y * cfg.tile_px, cfg.tiles_x * cfg.tile_px)
    zones = rng.integers(0, 7, shape).astype(np.float32)
    zones[rng.random(shape) < 0.04] = ND
    vals = (rng.random(shape) * 120 - 20).astype(np.float32)
    vals[rng.random(shape) < 0.04] = ND
    tiles = _tiles_from_arrays({"zone": zones, "val": vals}, cfg)
    out = zonal_by_zone_raster(
        ray.data.from_arrow(tiles), GridSpec.from_synth(cfg),
        zone_layer="zone", value_layer="val")
    got = {int(r["zone"]): r for r in out.take_all()}

    ok = (zones != np.float32(ND)) & (vals != np.float32(ND))
    zs = np.unique(zones[ok].astype(np.int64))
    assert set(got) == set(int(z) for z in zs)
    for z in zs:
        m = ok & (zones == np.float32(z))
        v = vals[m].astype(np.float64)
        r = got[int(z)]
        assert r["n_px"] == int(m.sum())
        assert r["vmin"] == v.min() and r["vmax"] == v.max()
        assert np.isclose(r["total"], v.sum(), rtol=1e-12)
        assert np.isclose(r["mean"], v.mean(), rtol=1e-12)


def test_zonal_by_zone_composes_with_watershed(ray_session):
    """The composition the stage exists for: mean elevation per
    watershed basin of the same DEM."""
    import ray

    from balrog_ray.stages.hydrology import watershed
    from balrog_ray.tiles.synth import tiles_table

    cfg = SynthConfig(tiles_x=2, tiles_y=2, tile_px=16)
    spec = GridSpec.from_synth(cfg)
    tiles = ray.data.from_arrow(tiles_table(cfg, layers=("dem",)))
    basins = watershed(tiles, spec)
    out = zonal_by_zone_raster(tiles.union(basins), spec,
                               zone_layer="watershed", value_layer="dem")
    rows = out.take_all()
    assert rows, "no basins produced"
    total_px = sum(r["n_px"] for r in rows)
    assert total_px > 0
    for r in rows:
        assert r["vmin"] <= r["mean"] <= r["vmax"]


@pytest.mark.parametrize("seed", [3, 4])
def test_zonal_category_stats_matches_numpy(ray_session, seed):
    """majority/minority/variety vs a per-zone Counter oracle with the
    same smallest-id tie-break; exact integers."""
    from collections import Counter

    import ray

    from balrog_ray.stages.zone_stats import zonal_category_stats

    rng = np.random.default_rng(seed)
    cfg = SynthConfig(tiles_x=3, tiles_y=2, tile_px=16)
    shape = (cfg.tiles_y * cfg.tile_px, cfg.tiles_x * cfg.tile_px)
    zones = rng.integers(0, 5, shape).astype(np.float32)
    zones[rng.random(shape) < 0.05] = ND
    # few classes so majority ties actually occur
    vals = rng.integers(0, 3, shape).astype(np.float32)
    vals[rng.random(shape) < 0.05] = ND
    tiles = _tiles_from_arrays({"zone": zones, "cls": vals}, cfg)
    out = zonal_category_stats(
        ray.data.from_arrow(tiles), GridSpec.from_synth(cfg),
        zone_layer="zone", value_layer="cls")
    got = {int(r["zone"]): r for r in out.take_all()}

    ok = (zones != np.float32(ND)) & (vals != np.float32(ND))
    want_zones = sorted(set(zones[ok].astype(int).tolist()))
    assert sorted(got) == want_zones
    for z in want_zones:
        c = Counter(vals[ok & (zones == z)].astype(int).tolist())
        items = sorted(c.items())                      # (class, n) by id
        hi_n = max(n for _, n in items)
        lo_n = min(n for _, n in items)
        hi = next(v for v, n in items if n == hi_n)
        lo = next(v for v, n in items if n == lo_n)
        r = got[z]
        assert (r["variety"], r["majority"], r["majority_n"],
                r["minority"], r["minority_n"]) == \
            (len(items), hi, hi_n, lo, lo_n), z
