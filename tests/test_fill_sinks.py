"""Depression filling: tiled active-front run vs the whole-raster
minimax relaxation oracle, bit-exact."""

import numpy as np
import pyarrow as pa
import pytest

from balrog_ray.stages.fill_sinks import fill_relax_kernel, fill_sinks
from balrog_ray.stages.halo import GridSpec
from balrog_ray.tiles.synth import SynthConfig
from test_hydrology import _bumpy_dem, _mosaic, _tiles_from_array

ND = -99.0


def _basin_dem(shape, seed):
    """Terrain with two carved depressions, one spanning tile seams."""
    arr = _bumpy_dem(shape, seed).astype(np.float64)
    yy, xx = np.mgrid[0:shape[0], 0:shape[1]]
    nd = arr == ND
    # bowl centred on the (16,16) tile corner -> crosses 4 tiles at T=16
    arr -= 40.0 * np.exp(-(((yy - 16) / 7.0) ** 2
                           + ((xx - 16) / 7.0) ** 2))
    arr -= 25.0 * np.exp(-(((yy - 8) / 4.0) ** 2
                           + ((xx - 38) / 4.0) ** 2))
    arr = arr.astype(np.float32)
    arr[nd] = ND
    return arr


def test_kernel_fills_monotone_and_idempotent():
    arr = _basin_dem((32, 48), 71)
    fill = fill_relax_kernel(arr, ND)
    valid = arr != np.float32(ND)
    z = arr.astype(np.float64)
    assert (fill[valid] >= z[valid]).all()
    assert (fill[valid] > z[valid]).any()        # something was filled
    assert not np.isfinite(fill[~valid]).any()   # nodata -> -inf
    refill = fill_relax_kernel(fill.astype(np.float32), ND)
    assert np.array_equal(refill[valid], fill[valid])  # idempotent


def test_kernel_flat_bowl_spill():
    # 1-px rim at 10, bowl at 2, one spill notch at 5 -> bowl fills to 5
    arr = np.full((7, 7), 10.0, np.float32)
    arr[1:6, 1:6] = 10.0
    arr[2:5, 2:5] = 2.0
    arr[3, 1] = 5.0                               # notch on the rim
    arr[3, 0] = 4.0                               # drains off the edge
    fill = fill_relax_kernel(arr, ND)
    assert fill[3, 3] == 5.0
    assert (fill[2:5, 2:5] == 5.0).all()
    assert fill[0, 0] == 10.0


@pytest.mark.usefixtures("ray_session")
def test_tiled_parity_cross_tile_basin():
    import ray
    import ray.data

    cfg = SynthConfig(tiles_x=3, tiles_y=2, tile_px=16)
    arr = _basin_dem((32, 48), 72)
    spec = GridSpec(cfg.tiles_x, cfg.tiles_y, cfg.tile_px,
                    cfg.pixel_size, y_north=cfg.y_north)
    ds = ray.data.from_arrow(_tiles_from_array(arr, cfg, layer="dem"))
    out = fill_sinks(ds, spec, layer="dem").materialize()
    tabs = [t for t in (ray.get(r) for r in out.to_arrow_refs())
            if t.num_rows]
    got = _mosaic(pa.concat_tables(tabs), "filled", cfg)

    want64 = fill_relax_kernel(arr, ND)
    valid = arr != np.float32(ND)
    want = np.where(valid, want64, np.float64(ND)).astype(np.float32)
    assert np.array_equal(got, want)
    # the carved bowl spans 4 tiles and actually filled
    z = arr.astype(np.float64)
    filled_px = valid & (want64 > z + 1e-6)
    tiles_touched = {(int(y) // 16, int(x) // 16)
                     for y, x in zip(*np.where(filled_px))}
    assert len(tiles_touched) >= 3
