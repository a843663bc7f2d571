"""fill_nodata vs a per-pixel brute-force nearest-valid oracle (same
documented tie-break), whole-raster == tiled parity across tile borders,
and the unreachable-hole contract."""

import numpy as np
import pytest

from balrog_ray.stages.fillnodata import (fill_nodata, fillnodata_kernel,
                                          _offsets)
from balrog_ray.stages.halo import GridSpec
from balrog_ray.tiles.codec import Caption, decode_tile
from balrog_ray.tiles.synth import SynthConfig, tiles_table

ND = -99.0


def _brute(arr, max_dist, ps):
    """Per-pixel oracle: nearest valid by (d^2, dy, dx) over the disk."""
    a = arr.astype(np.float32, copy=True)
    H, W = a.shape
    R = int(np.floor(max_dist / ps))
    offs = _offsets(R)
    out = a.copy()
    for i in range(H):
        for j in range(W):
            if a[i, j] != np.float32(ND):
                continue
            for dy, dx in offs:
                y, x = i + dy, j + dx
                if 0 <= y < H and 0 <= x < W \
                        and a[y, x] != np.float32(ND):
                    out[i, j] = a[y, x]
                    break
    return out


def test_kernel_matches_brute_oracle():
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 90, (28, 24)).astype(np.float32)
    arr[rng.random((28, 24)) < 0.25] = ND      # scattered holes
    arr[10:16, 5:12] = ND                      # a wide void (partly out
    for max_dist in (1.0, 3.2, 6.0):           # of reach at small R)
        got = fillnodata_kernel(arr, max_dist, 1.0, ND)
        exp = _brute(arr, max_dist, 1.0)
        np.testing.assert_array_equal(got, exp), max_dist


def test_kernel_unreachable_stays_nodata():
    arr = np.full((20, 20), ND, np.float32)
    arr[0, 0] = 7.0
    got = fillnodata_kernel(arr, 3.0, 1.0, ND)
    assert got[0, 3] == np.float32(7.0)
    assert got[0, 4] == np.float32(ND)        # d=4 > 3
    assert got[10, 10] == np.float32(ND)


def test_pipeline_matches_whole_raster(ray_session):
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

    # synth puts its nodata patch inside tile (1,1); also carve a hole
    # ACROSS the (0,0)/(1,0) tile border so cross-tile donors are load-
    # bearing, then rebuild the table from the edited world
    dem[28:36, 60:68] = ND
    rows = []
    from balrog_ray.tiles.codec import encode_tile, phash64
    from balrog_ray.tiles.synth import TILES_SCHEMA
    import pyarrow as pa
    for ty in range(cfg.tiles_y):
        for tx in range(cfg.tiles_x):
            w = dem[ty * T:(ty + 1) * T, tx * T:(tx + 1) * T]
            cap = Caption(layer="dem", x0=tx * T * cfg.pixel_size,
                          y0=cfg.y_north - ty * T * cfg.pixel_size,
                          pixel_size=cfg.pixel_size,
                          edge={"n": ty == 0, "s": ty == cfg.tiles_y - 1,
                                "w": tx == 0, "e": tx == cfg.tiles_x - 1},
                          tx=tx, ty=ty)
            payload, cap = encode_tile(w, "npz", cap)
            rows.append({"image_id": f"dem/{tx}/{ty}", "bytes": payload,
                         "w": np.int32(T), "h": np.int32(T), "fmt": "npz",
                         "caption": cap.to_json(),
                         "phash": np.int64(phash64(w))})
    tab2 = pa.table({n: [r[n] for r in rows] for n in TILES_SCHEMA.names},
                    schema=TILES_SCHEMA)

    max_dist = 5.0 * cfg.pixel_size
    exp = fillnodata_kernel(dem, max_dist, cfg.pixel_size, ND)
    out = fill_nodata(ray.data.from_arrow(tab2), spec, layer="dem",
                      max_dist=max_dist).take_all()
    assert len(out) == cfg.tiles_x * cfg.tiles_y
    filled_something = False
    for row in out:
        cap = Caption.from_json(row["caption"])
        arr = decode_tile(row["bytes"], row["fmt"], cap)
        want = exp[cap.ty * T:(cap.ty + 1) * T, cap.tx * T:(cap.tx + 1) * T]
        np.testing.assert_array_equal(arr, want, err_msg=str((cap.tx,
                                                              cap.ty)))
        filled_something = True
    assert filled_something
    # the border hole actually filled from the neighbouring tile
    assert (exp[28:36, 60:68] != np.float32(ND)).all()


def test_radius_guard():
    import ray.data

    cfg = SynthConfig(tiles_x=2, tiles_y=2, tile_px=16)
    with pytest.raises(ValueError, match="smaller than one pixel"):
        fill_nodata(ray.data.from_arrow(tiles_table(cfg)),
                    GridSpec.from_synth(cfg),
                    max_dist=0.5 * cfg.pixel_size)
