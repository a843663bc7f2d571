"""Grid alignment (veg -> DEM resample, reference bal.py:55-57): NN
resample parity with a direct numpy oracle, identity on the same grid, and
the wired bal_pipeline(veg_ds=...) path."""

import numpy as np
import pyarrow as pa
from numpy.testing import assert_array_equal

from balrog_ray.core.kernels import compute_bal, slope_aspect
from balrog_ray.core.remap import ASPECT_RECLASS, apply_remap, slope_reclass
from balrog_ray.pipelines import bal_pipeline as bp
from balrog_ray.stages.halo import GridSpec
from balrog_ray.stages.regrid import regrid_to_grid
from balrog_ray.tiles import synth
from balrog_ray.tiles.codec import Caption, decode_tile

# DEM world: 4x4 tiles of 64 px at 25 m; veg world: SAME extent but 2x2
# tiles of 64 px at 50 m (half resolution, different tiling)
CFG = synth.SynthConfig(tiles_x=4, tiles_y=4, tile_px=64, pixel_size=25.0)
CFG_VEG = synth.SynthConfig(tiles_x=2, tiles_y=2, tile_px=64,
                            pixel_size=50.0)
SPEC = GridSpec.from_synth(CFG)


def nn_resampled_veg() -> np.ndarray:
    """Direct numpy oracle: coarse veg sampled at DEM pixel centers."""
    coarse = synth.veg_window(CFG_VEG, synth.make_veg_polygons(CFG_VEG),
                              0, 0, *CFG_VEG.world_px)
    rows, cols = CFG.world_px
    cc = np.floor((np.arange(cols) + 0.5) * 25.0 / 50.0).astype(int)
    rr = np.floor((np.arange(rows) + 0.5) * 25.0 / 50.0).astype(int)
    return coarse[np.ix_(rr, cc)].astype(np.float32)


def test_regrid_matches_numpy_oracle(ray_session):
    import ray.data

    veg_tiles = synth.tiles_table(CFG_VEG, layers=("veg",))
    out = regrid_to_grid(ray.data.from_arrow(veg_tiles), SPEC).take_all()
    assert len(out) == CFG.tiles_x * CFG.tiles_y
    got = np.full(CFG.world_px, np.nan, dtype=np.float32)
    T = CFG.tile_px
    for r in out:
        cap = Caption.from_json(r["caption"])
        assert cap.layer == "veg" and cap.pixel_size == 25.0
        arr = decode_tile(r["bytes"], r["fmt"], cap)
        got[cap.ty * T:(cap.ty + 1) * T, cap.tx * T:(cap.tx + 1) * T] = arr
    assert_array_equal(got, nn_resampled_veg())


def test_regrid_same_grid_is_identity(ray_session):
    import ray.data

    tiles = synth.tiles_table(CFG, layers=("veg",))
    out = {r["image_id"]: r
           for r in regrid_to_grid(ray.data.from_arrow(tiles),
                                   SPEC).take_all()}
    for row in tiles.to_pylist():
        cap = Caption.from_json(row["caption"])
        src = decode_tile(row["bytes"], row["fmt"], cap)
        back = out[row["image_id"]]
        assert_array_equal(
            decode_tile(back["bytes"], back["fmt"],
                        Caption.from_json(back["caption"])),
            np.asarray(src, dtype=np.float32))


def test_bal_pipeline_with_offgrid_veg(ray_session):
    """bal_pipeline(veg_ds=...) on half-resolution veg matches the
    whole-raster oracle computed on the NN-resampled array."""
    import ray.data

    dem_tiles = synth.tiles_table(CFG, layers=("dem",))
    veg_tiles = synth.tiles_table(CFG_VEG, layers=("veg",))
    rows = bp.bal_pipeline(ray.data.from_arrow(dem_tiles), SPEC, fdi=80,
                           veg_ds=ray.data.from_arrow(veg_tiles)).take_all()

    dem, _ = synth.global_arrays(CFG)
    slope, aspect = slope_aspect(dem, 25.0, 25.0)
    aspect_c = apply_remap(aspect, ASPECT_RECLASS).astype(np.float64)
    slope_c = apply_remap(slope, slope_reclass()).astype(np.float64)
    expected = compute_bal(nn_resampled_veg(), slope_c, aspect_c, 25.0, 80)

    T = CFG.tile_px
    got = np.full(CFG.world_px, np.nan, dtype=np.float32)
    for r in rows:
        cap = Caption.from_json(r["caption"])
        if cap.layer != "bal_max":
            continue
        arr = decode_tile(r["bytes"], r["fmt"], cap)
        got[cap.ty * T:(cap.ty + 1) * T, cap.tx * T:(cap.tx + 1) * T] = arr
    assert not np.isnan(got).any()
    assert_array_equal(got, expected["max"].astype(np.float32))


def test_bal_pipeline_partial_veg_coverage(ray_session):
    """find_common_area (op 7, bal.py:281-323): veg covering only the
    LEFT HALF of the DEM world restricts output to the footprint
    intersection, boundary cells keep exact whole-raster parity (the
    completeness gate counts veg strips only from covered neighbours),
    and uncovered cells are pruned, not silently dropped mid-grid."""
    import ray.data

    cfg_half = synth.SynthConfig(tiles_x=1, tiles_y=2, tile_px=64,
                                 pixel_size=50.0)
    dem_tiles = synth.tiles_table(CFG, layers=("dem",))
    veg_tiles = synth.tiles_table(cfg_half, layers=("veg",))
    rows = bp.bal_pipeline(ray.data.from_arrow(dem_tiles), SPEC, fdi=80,
                           veg_ds=ray.data.from_arrow(veg_tiles)).take_all()

    # oracle: whole-raster compute with veg resampled where covered,
    # nodata to the east of the veg footprint
    coarse = synth.veg_window(cfg_half, synth.make_veg_polygons(cfg_half),
                              0, 0, *cfg_half.world_px)
    rows_px, cols_px = CFG.world_px
    veg_full = np.full((rows_px, cols_px), -99.0, dtype=np.float64)
    cov_cols = cols_px // 2
    cc = np.floor((np.arange(cov_cols) + 0.5) * 25.0 / 50.0).astype(int)
    rr = np.floor((np.arange(rows_px) + 0.5) * 25.0 / 50.0).astype(int)
    veg_full[:, :cov_cols] = coarse[np.ix_(rr, cc)]

    dem, _ = synth.global_arrays(CFG)
    slope, aspect = slope_aspect(dem, 25.0, 25.0)
    aspect_c = apply_remap(aspect, ASPECT_RECLASS).astype(np.float64)
    slope_c = apply_remap(slope, slope_reclass()).astype(np.float64)
    expected = compute_bal(veg_full, slope_c, aspect_c, 25.0, 80)

    T = CFG.tile_px
    seen_cells = set()
    for r in rows:
        cap = Caption.from_json(r["caption"])
        seen_cells.add((cap.tx, cap.ty))
        if cap.layer != "bal_max":
            continue
        arr = decode_tile(r["bytes"], r["fmt"], cap)
        exp = expected["max"][cap.ty * T:(cap.ty + 1) * T,
                              cap.tx * T:(cap.tx + 1) * T]
        assert_array_equal(arr, exp.astype(np.float32)), (cap.tx, cap.ty)
    # exactly the covered half of the grid (tx 0..1), nothing east of it
    assert seen_cells == {(tx, ty) for tx in (0, 1) for ty in range(4)}


def test_bal_pipeline_veg_mosaic_hole(ray_session):
    """Non-rectangular veg coverage (a missing interior mosaic tile):
    coverage comes from actual source captions, not the hull bbox, so
    the hole's cells are pruned while every covered cell -- including
    the hole's neighbours -- keeps exact whole-raster parity."""
    import ray.data

    dem_tiles = synth.tiles_table(CFG, layers=("dem",))
    veg_tab = synth.tiles_table(CFG_VEG, layers=("veg",))
    keep = [i for i, cap_json in enumerate(
        veg_tab.column("caption").to_pylist())
        if not (Caption.from_json(cap_json).tx == 1
                and Caption.from_json(cap_json).ty == 1)]
    veg_holed = veg_tab.take(keep)          # drop bottom-right veg tile

    rows = bp.bal_pipeline(ray.data.from_arrow(dem_tiles), SPEC, fdi=80,
                           veg_ds=ray.data.from_arrow(veg_holed)).take_all()

    veg_full = nn_resampled_veg().astype(np.float64)
    half_r, half_c = (CFG.world_px[0] // 2, CFG.world_px[1] // 2)
    veg_full[half_r:, half_c:] = -99.0       # the hole

    dem, _ = synth.global_arrays(CFG)
    slope, aspect = slope_aspect(dem, 25.0, 25.0)
    aspect_c = apply_remap(aspect, ASPECT_RECLASS).astype(np.float64)
    slope_c = apply_remap(slope, slope_reclass()).astype(np.float64)
    expected = compute_bal(veg_full, slope_c, aspect_c, 25.0, 80)

    T = CFG.tile_px
    seen = set()
    for r in rows:
        cap = Caption.from_json(r["caption"])
        seen.add((cap.tx, cap.ty))
        if cap.layer != "bal_max":
            continue
        arr = decode_tile(r["bytes"], r["fmt"], cap)
        exp = expected["max"][cap.ty * T:(cap.ty + 1) * T,
                              cap.tx * T:(cap.tx + 1) * T]
        assert_array_equal(arr, exp.astype(np.float32))
    hole = {(tx, ty) for tx in (2, 3) for ty in (2, 3)}
    assert seen == {(tx, ty) for tx in range(4) for ty in range(4)} - hole


def test_regrid_retiles_same_resolution_exactly(ray_session):
    """Retiling (op 25's re-chunk concern): same pixel size, different
    tile size -- regrid_to_grid must be an exact pixel-preserving
    re-partition of the mosaic (NN at equal resolution is identity)."""
    import ray.data

    src_cfg = synth.SynthConfig(tiles_x=4, tiles_y=4, tile_px=32,
                                pixel_size=25.0)
    tgt = GridSpec(tiles_x=2, tiles_y=2, tile_px=64, pixel_size=25.0,
                   y_north=src_cfg.y_north)
    tab = synth.tiles_table(src_cfg, layers=("dem",))
    mosaic = np.full(src_cfg.world_px, np.nan, dtype=np.float32)
    T = src_cfg.tile_px
    for i in range(tab.num_rows):
        cap = Caption.from_json(tab.column("caption")[i].as_py())
        arr = decode_tile(tab.column("bytes")[i].as_py(),
                          tab.column("fmt")[i].as_py(), cap)
        mosaic[cap.ty * T:(cap.ty + 1) * T,
               cap.tx * T:(cap.tx + 1) * T] = arr

    out = regrid_to_grid(ray.data.from_arrow(tab), tgt,
                         layer="dem").take_all()
    assert len(out) == 4
    for r in out:
        cap = Caption.from_json(r["caption"])
        arr = decode_tile(r["bytes"], r["fmt"], cap)
        want = mosaic[cap.ty * 64:(cap.ty + 1) * 64,
                      cap.tx * 64:(cap.tx + 1) * 64]
        assert_array_equal(arr, want)
