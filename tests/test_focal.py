"""focal_stats vs a per-pixel whole-raster oracle: every stat, clipped
raster edges, nodata-ignoring windows, and the completeness gate when a
tile is missing."""

import numpy as np
import pyarrow as pa
import pytest

from balrog_ray.stages.focal import focal_kernel, focal_stats
from balrog_ray.stages.halo import GridSpec
from balrog_ray.tiles.codec import Caption, decode_tile
from balrog_ray.tiles.synth import SynthConfig, tiles_table

ND = -99.0


def _mosaic(tab, layer: str, cfg) -> np.ndarray:
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


def _oracle(raster: np.ndarray, r: int, stat: str) -> np.ndarray:
    """Direct per-pixel loop -- deliberately nothing shared with the
    integral-image / shift-reduce implementation under test."""
    H, W = raster.shape
    out = np.full((H, W), ND, np.float32)
    for i in range(H):
        for j in range(W):
            win = raster[max(0, i - r):i + r + 1, max(0, j - r):j + r + 1]
            vals = win[win != np.float32(ND)].astype(np.float64)
            if len(vals) == 0:
                continue
            if stat == "mean":
                v = vals.mean()
            elif stat == "sum":
                v = vals.sum()
            elif stat == "count":
                v = float(len(vals))
            elif stat == "std":
                v = vals.std()
            elif stat == "min":
                v = vals.min()
            elif stat == "max":
                v = vals.max()
            out[i, j] = np.float32(v)
    return out


def test_focal_kernel_all_stats_match_loop_oracle():
    rng = np.random.default_rng(7)
    arr = (rng.uniform(0, 500, (40, 33))).astype(np.float32)
    arr[rng.random((40, 33)) < 0.1] = ND          # scattered nodata
    arr[5:9, 5:30] = ND                           # a void wider than r
    for r in (1, 3):
        for stat in ("mean", "sum", "count", "std", "min", "max"):
            got = focal_kernel(arr, r, stat, ND)
            exp = _oracle(arr, r, stat)
            assert got.shape == exp.shape
            nd_g, nd_e = got == np.float32(ND), exp == np.float32(ND)
            assert (nd_g == nd_e).all(), (stat, r)
            assert np.allclose(got[~nd_g], exp[~nd_e],
                               rtol=1e-5, atol=1e-3), (stat, r)


def test_focal_kernel_rejects_unknown_stat():
    with pytest.raises(ValueError, match="focal stat"):
        focal_kernel(np.zeros((4, 4), np.float32), 1, "median", ND)


def test_focal_stats_pipeline_matches_whole_raster(ray_session):
    import ray.data

    cfg = SynthConfig(tiles_x=3, tiles_y=2, tile_px=32)
    tab = tiles_table(cfg)
    spec = GridSpec.from_synth(cfg)
    dem = _mosaic(tab, "dem", cfg)
    T = cfg.tile_px

    for stat, radius in (("mean", 3), ("max", 5)):
        exp = _oracle(dem, radius, stat)
        out = focal_stats(ray.data.from_arrow(tab), spec, layer="dem",
                          stat=stat, radius=radius).take_all()
        assert len(out) == cfg.tiles_x * cfg.tiles_y
        for row in out:
            cap = Caption.from_json(row["caption"])
            assert cap.layer == f"focal_{stat}"
            arr = decode_tile(row["bytes"], row["fmt"], cap)
            want = exp[cap.ty * T:(cap.ty + 1) * T,
                       cap.tx * T:(cap.tx + 1) * T]
            nd_g = arr == np.float32(ND)
            assert (nd_g == (want == np.float32(ND))).all()
            assert np.allclose(arr[~nd_g], want[~nd_g],
                               rtol=1e-5, atol=1e-3), (stat, cap.tx, cap.ty)


def test_focal_stats_drops_cells_with_missing_neighbour(ray_session):
    import ray.data

    cfg = SynthConfig(tiles_x=3, tiles_y=2, tile_px=32)
    tab = tiles_table(cfg)
    spec = GridSpec.from_synth(cfg)
    # drop the dem tile at (0, 0): it and every neighbouring cell lose
    # completeness; only cells not adjacent to (0,0) may compute
    keep = []
    for i in range(tab.num_rows):
        cap = Caption.from_json(tab.column("caption")[i].as_py())
        if cap.layer == "dem" and (cap.tx, cap.ty) == (0, 0):
            continue
        keep.append(i)
    tab2 = tab.take(pa.array(keep, pa.int64()))

    out = focal_stats(ray.data.from_arrow(tab2), spec, layer="dem",
                      stat="mean", radius=2).take_all()
    got = set()
    for row in out:
        cap = Caption.from_json(row["caption"])
        got.add((cap.tx, cap.ty))
    expect = {(tx, ty) for tx in range(3) for ty in range(2)
              if abs(tx - 0) > 1 or abs(ty - 0) > 1}
    assert got == expect


def test_focal_stats_radius_guard():
    import ray.data

    cfg = SynthConfig(tiles_x=2, tiles_y=2, tile_px=16)
    spec = GridSpec.from_synth(cfg)
    with pytest.raises(ValueError, match="radius"):
        focal_stats(ray.data.from_arrow(tiles_table(cfg)), spec,
                    stat="mean", radius=16)
