"""Distributed polygonize vs a whole-raster BFS oracle: global region
count, per-region (value, n_px, bbox) multiset, and pixel conservation
-- regions spanning tile boundaries must fold into single rows."""

from collections import deque

import numpy as np
import pytest

from balrog_ray.stages.halo import GridSpec
from balrog_ray.stages.polygonize import _label_tile, polygonize
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
        out[cap.ty * T:(cap.ty + 1) * T, cap.tx * T:(cap.tx + 1) * T] = arr
    return out


def _bfs_regions(raster, ps, y_north):
    """Whole-raster 4-connectivity BFS -- the independent oracle."""
    H, W = raster.shape
    seen = np.zeros((H, W), bool)
    regions = []
    for si in range(H):
        for sj in range(W):
            if seen[si, sj] or raster[si, sj] == np.float32(ND):
                continue
            v = raster[si, sj]
            q = deque([(si, sj)])
            seen[si, sj] = True
            n = 0
            rmin = rmax = si
            cmin = cmax = sj
            while q:
                i, j = q.popleft()
                n += 1
                rmin, rmax = min(rmin, i), max(rmax, i)
                cmin, cmax = min(cmin, j), max(cmax, j)
                for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                    ii, jj = i + di, j + dj
                    if (0 <= ii < H and 0 <= jj < W and not seen[ii, jj]
                            and raster[ii, jj] == v):
                        seen[ii, jj] = True
                        q.append((ii, jj))
            regions.append((float(v), n, cmin * ps,
                            y_north - (rmax + 1) * ps,
                            (cmax + 1) * ps, y_north - rmin * ps))
    return regions


def test_label_tile_matches_bfs():
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 3, (20, 17)).astype(np.float32)
    arr[rng.random((20, 17)) < 0.15] = ND
    labels, n = _label_tile(arr, ND)
    assert (labels >= 0).sum() == (arr != np.float32(ND)).sum()
    # every label is one BFS region: counts multiset must match
    oracle = _bfs_regions(arr, 1.0, 0.0)
    assert n == len(oracle)
    got_counts = sorted(np.bincount(labels[labels >= 0]).tolist())
    assert got_counts == sorted(r[1] for r in oracle)


def test_polygonize_matches_whole_raster_oracle(ray_session):
    import ray.data

    cfg = SynthConfig(tiles_x=3, tiles_y=2, tile_px=32)
    tab = tiles_table(cfg)
    spec = GridSpec.from_synth(cfg)
    veg = _mosaic(tab, "veg", cfg)

    rows = polygonize(ray.data.from_arrow(tab), spec,
                      layer="veg").take_all()
    got = sorted((round(r["value"], 3), r["n_px"], r["xmin"], r["ymin"],
                  r["xmax"], r["ymax"]) for r in rows)
    exp = sorted((round(v, 3), n, x0, y0, x1, y1) for v, n, x0, y0, x1, y1
                 in _bfs_regions(veg, cfg.pixel_size, cfg.y_north))
    assert len(got) == len(exp)
    assert got == exp
    # pixel conservation: regions partition the valid pixels
    assert sum(r["n_px"] for r in rows) == int(
        (veg != np.float32(ND)).sum())
    # at least one region must span a tile boundary, else the test
    # exercises nothing distributed
    T = cfg.tile_px * cfg.pixel_size
    spanning = [r for r in rows
                if int(r["xmin"] // T) != int((r["xmax"] - 1e-9) // T)
                or int((cfg.y_north - r["ymax"]) // T)
                != int((cfg.y_north - r["ymin"] - 1e-9) // T)]
    assert spanning, "fixture has no boundary-spanning region"


def test_polygonize_region_id_is_min_member(ray_session):
    import ray.data

    cfg = SynthConfig(tiles_x=2, tiles_y=1, tile_px=16)
    tab = tiles_table(cfg)
    spec = GridSpec.from_synth(cfg)
    rows = polygonize(ray.data.from_arrow(tab), spec,
                      layer="veg").take_all()
    ids = [r["region_id"] for r in rows]
    assert len(ids) == len(set(ids))


def test_polygonize_tile_px_guard():
    import ray.data

    spec = GridSpec(2, 2, 2048, 25.0, 102400.0)
    with pytest.raises(ValueError, match="labels"):
        polygonize(ray.data.from_items([]), spec, layer="veg")
