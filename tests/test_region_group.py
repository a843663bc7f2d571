"""RegionGroup vs a whole-raster BFS labeling oracle: dense anchor-
ordered ids, cross-tile regions, nodata passthrough, attribute table."""

import numpy as np
import pyarrow as pa
import pytest

from balrog_ray.stages.halo import GridSpec
from balrog_ray.tiles.synth import SynthConfig
from test_hydrology import _mosaic, _tiles_from_array

ND = -99.0


def _classy(shape, seed, n_classes=4, nodata_frac=0.05):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, n_classes + 1,
                     (shape[0] // 3 + 1, shape[1] // 3 + 1))
    a = np.kron(a, np.ones((3, 3), np.int64))[:shape[0], :shape[1]]
    a = a.astype(np.float32)
    a[rng.random(shape) < nodata_frac] = ND
    return a


def _ref_regions(arr):
    """Row-major BFS labeling: ids are 1-based in anchor order (the
    scan order IS anchor order)."""
    H, W = arr.shape
    lab = np.zeros((H, W), np.int64)
    regions = []
    nid = 0
    for r in range(H):
        for c in range(W):
            if arr[r, c] == np.float32(ND) or lab[r, c]:
                continue
            nid += 1
            v = arr[r, c]
            anchor = r * W + c
            stack = [(r, c)]
            lab[r, c] = nid
            npx = 0
            while stack:
                y, x = stack.pop()
                npx += 1
                for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                    yy, xx = y + dy, x + dx
                    if (0 <= yy < H and 0 <= xx < W and not lab[yy, xx]
                            and arr[yy, xx] == v):
                        lab[yy, xx] = nid
                        stack.append((yy, xx))
            regions.append((nid, float(v), npx, anchor))
    return lab, regions


@pytest.mark.usefixtures("ray_session")
def test_region_group_matches_bfs_oracle():
    import ray
    import ray.data

    from balrog_ray.stages.sieve import region_group

    cfg = SynthConfig(tiles_x=3, tiles_y=2, tile_px=16)
    arr = _classy((32, 48), seed=61)
    spec = GridSpec(cfg.tiles_x, cfg.tiles_y, cfg.tile_px,
                    cfg.pixel_size, y_north=cfg.y_north)
    ds = ray.data.from_arrow(_tiles_from_array(arr, cfg, layer="veg"))
    labels_ds, regions = region_group(ds, spec, layer="veg")
    out = labels_ds.materialize()
    tabs = [t for t in (ray.get(r) for r in out.to_arrow_refs())
            if t.num_rows]
    got = _mosaic(pa.concat_tables(tabs), "regions_veg", cfg)

    want_lab, want_regions = _ref_regions(arr)
    nd = arr == np.float32(ND)
    assert np.array_equal(got == np.float32(ND), nd)
    assert np.array_equal(got[~nd].astype(np.int64), want_lab[~nd])

    got_rows = [(r["region_id"], r["value"], r["n_px"], r["anchor"])
                for r in regions.to_pylist()]
    assert got_rows == want_regions
    # cross-tile regions exist in this world (ids fewer than fragments)
    assert len(want_regions) < sum(
        len(_ref_regions(arr[y * 16:(y + 1) * 16,
                             x * 16:(x + 1) * 16])[1])
        for y in range(2) for x in range(3))


@pytest.mark.usefixtures("ray_session")
def test_region_group_distributed_matches_oracle():
    """max_regions=2 forces the past-gate distributed path (bucketed
    anchor rank + cell-keyed relabel); labels and the regions DATASET
    must match the BFS oracle exactly -- same contract as the
    driver-map path."""
    import ray
    import ray.data

    from balrog_ray.stages.sieve import region_group

    cfg = SynthConfig(tiles_x=3, tiles_y=2, tile_px=16)
    arr = _classy((32, 48), seed=61)
    spec = GridSpec(cfg.tiles_x, cfg.tiles_y, cfg.tile_px,
                    cfg.pixel_size, y_north=cfg.y_north)
    ds = ray.data.from_arrow(_tiles_from_array(arr, cfg, layer="veg"))
    labels_ds, regions_ds = region_group(ds, spec, layer="veg",
                                         max_regions=2)
    out = labels_ds.materialize()
    tabs = [t for t in (ray.get(r) for r in out.to_arrow_refs())
            if t.num_rows]
    got = _mosaic(pa.concat_tables(tabs), "regions_veg", cfg)

    want_lab, want_regions = _ref_regions(arr)
    nd = arr == np.float32(ND)
    assert np.array_equal(got == np.float32(ND), nd)
    assert np.array_equal(got[~nd].astype(np.int64), want_lab[~nd])

    got_rows = sorted(
        (r["region_id"], r["value"], r["n_px"], r["anchor"])
        for r in regions_ds.take_all())
    assert got_rows == want_regions


@pytest.mark.usefixtures("ray_session")
def test_region_group_dense_id_cap():
    import ray
    import ray.data

    from balrog_ray.stages import sieve

    cfg = SynthConfig(tiles_x=2, tiles_y=1, tile_px=16)
    arr = _classy((16, 32), seed=62)
    spec = GridSpec(2, 1, 16, cfg.pixel_size, y_north=cfg.y_north)
    ds = ray.data.from_arrow(_tiles_from_array(arr, cfg, layer="veg"))
    orig = sieve._DENSE_ID_CAP
    sieve._DENSE_ID_CAP = 2
    try:
        with pytest.raises(RuntimeError, match="2\\*\\*24|format cap"):
            region = sieve.region_group(ds, spec, layer="veg",
                                        max_regions=2)
    finally:
        sieve._DENSE_ID_CAP = orig
