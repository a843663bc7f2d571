"""Tiled Ray pipeline vs whole-raster NumPy oracle: exact parity, plus
checkpoint/resume byte-identity (F10) and the streaming histogram."""

import os

import numpy as np
import pyarrow as pa
import pytest
from numpy.testing import assert_array_equal

from balrog_ray.core.kernels import compute_bal, slope_aspect
from balrog_ray.core.remap import ASPECT_RECLASS, apply_remap, slope_reclass
from balrog_ray.pipelines import bal_pipeline as bp
from balrog_ray.stages.halo import GridSpec
from balrog_ray.tiles import synth
from balrog_ray.tiles.codec import Caption, decode_tile

CFG = synth.SynthConfig(tiles_x=4, tiles_y=4, tile_px=64)
SPEC = GridSpec.from_synth(CFG)


def oracle_bands(cfg):
    """Whole-raster reference run (the Gen-1 execution model)."""
    dem, veg = synth.global_arrays(cfg)
    slope, aspect = slope_aspect(dem, cfg.pixel_size, cfg.pixel_size)
    aspect_c = apply_remap(aspect, ASPECT_RECLASS).astype(np.float64)
    slope_c = apply_remap(slope, slope_reclass()).astype(np.float64)
    return compute_bal(veg, slope_c, aspect_c, cfg.pixel_size, 80)


def reassemble(rows, band, cfg):
    out = np.full(cfg.world_px, np.nan, dtype=np.float32)
    T = cfg.tile_px
    for row in rows:
        cap = Caption.from_json(row["caption"])
        if cap.layer != f"bal_{band}":
            continue
        arr = decode_tile(row["bytes"], row["fmt"], cap)
        out[cap.ty * T:(cap.ty + 1) * T, cap.tx * T:(cap.tx + 1) * T] = arr
    assert not np.isnan(out).any()
    return out


@pytest.fixture(scope="module")
def bal_rows(ray_session):
    import ray.data

    ds = ray.data.from_arrow(synth.tiles_table(CFG))
    return bp.bal_pipeline(ds, SPEC, fdi=80).take_all()


def test_tiled_matches_whole_raster_oracle(bal_rows):
    expected = oracle_bands(CFG)
    for band in bp.ALL_BANDS:
        got = reassemble(bal_rows, band, CFG)
        assert_array_equal(got, expected[band].astype(np.float32),
                           err_msg=f"band {band}")


def test_output_rows_complete(bal_rows):
    assert len(bal_rows) == CFG.tiles_x * CFG.tiles_y * len(bp.ALL_BANDS)
    ids = {r["image_id"] for r in bal_rows}
    assert "bal_max/0/0" in ids and "bal_w/3/3" in ids


def test_checkpoint_resume_byte_identical(ray_session, tmp_path):
    import ray.data

    tiles = synth.tiles_table(CFG)
    clean_dir = str(tmp_path / "clean")
    part_dir = str(tmp_path / "resumable")

    # uninterrupted run
    ds = ray.data.from_arrow(tiles)
    lineage = bp.bal_pipeline(ds, SPEC, out_dir=clean_dir).take_all()
    assert len(lineage) == 16
    assert all(r["status"] == "done" for r in lineage)

    # "killed" run: only the first two tile rows (cells 0..7) make it in
    def keep_first_cells(batch: pa.Table) -> pa.Table:
        caps = [Caption.from_json(c) for c in batch.column("caption").to_pylist()]
        keep = [SPEC.cell_id(c.tx, c.ty) < 8 for c in caps]
        return batch.filter(pa.array(keep))

    partial = ray.data.from_arrow(tiles).map_batches(
        keep_first_cells, batch_format="pyarrow")
    bp.bal_pipeline(partial, SPEC, out_dir=part_dir).take_all()
    done = bp.completed_cells(part_dir)
    # only cells whose full halo neighbourhood was present may commit:
    # the top row (0..3) has every neighbour within cells 0..7
    assert done == {0, 1, 2, 3}

    # resume with the full input: must process exactly the missing cells
    resumed = bp.bal_pipeline(ray.data.from_arrow(tiles), SPEC,
                              out_dir=part_dir, resume=True).take_all()
    assert {r["cell_id"] for r in resumed} == set(range(16)) - done

    # byte-identical partitioned output vs the clean run
    for cell in range(16):
        a = open(os.path.join(clean_dir, f"cell={cell}", "bands.parquet"),
                 "rb").read()
        b = open(os.path.join(part_dir, f"cell={cell}", "bands.parquet"),
                 "rb").read()
        assert a == b, f"cell {cell} differs after resume"


def test_band_histogram(ray_session):
    import ray.data

    ds = ray.data.from_arrow(synth.tiles_table(CFG))
    bal = bp.bal_pipeline(ds, SPEC)
    hist = bp.band_histogram(bal).take_all()
    total_px = CFG.world_px[0] * CFG.world_px[1]
    per_band = {}
    for r in hist:
        per_band.setdefault(r["band"], 0)
        per_band[r["band"]] += r["pixels"]
    assert set(per_band) == set(bp.ALL_BANDS)
    for band, n in per_band.items():
        assert n == total_px, f"band {band} histogram incomplete"


def test_aoi_extent_prunes_and_masks(ray_session, bal_rows):
    """find_aoi/extract_by_mask parity: an AOI run produces exactly the
    intersecting cells, pixels inside the AOI byte-match the full run,
    pixels outside are nodata (sa_tools.py:48-136 semantics)."""
    import ray.data

    ps, T = CFG.pixel_size, CFG.tile_px
    # rectangle covering tiles (1..2, 1..2) plus a half-tile fringe
    xmin, xmax = 1.5 * T * ps, 2.5 * T * ps
    ymax = SPEC.y_north - 1.5 * T * ps
    ymin = SPEC.y_north - 2.5 * T * ps
    extent = f"{xmin} {ymin} {xmax} {ymax}"

    ds = ray.data.from_arrow(synth.tiles_table(CFG))
    rows = bp.bal_pipeline(ds, SPEC, fdi=80, extent=extent).take_all()

    cells = {Caption.from_json(r["caption"]).tx
             + 4 * Caption.from_json(r["caption"]).ty for r in rows}
    assert cells == {5, 6, 9, 10}          # the 2x2 tile block hit

    full = {(r["image_id"]): r for r in bal_rows}
    for r in rows:
        cap = Caption.from_json(r["caption"])
        got = decode_tile(r["bytes"], r["fmt"], cap)
        fr = full[r["image_id"]]
        ref = decode_tile(fr["bytes"], fr["fmt"],
                          Caption.from_json(fr["caption"]))
        xs = cap.tx * T * ps + (np.arange(T) + 0.5) * ps
        ys = SPEC.y_north - cap.ty * T * ps - (np.arange(T) + 0.5) * ps
        inside = ((ys[:, None] >= ymin) & (ys[:, None] <= ymax)
                  & (xs[None, :] >= xmin) & (xs[None, :] <= xmax))
        assert_array_equal(got[inside], ref[inside])
        assert (got[~inside] == np.float32(-99.0)).all()


def test_polygon_mask_matches_whole_raster_mask(ray_session, bal_rows):
    """Arbitrary-polygon extract_by_mask (sa_tools.py:48-136): pixels with
    centers inside the polygon byte-match the full run, outside are nodata,
    and cells outside the polygon bbox are pruned from the shuffle."""
    import ray.data

    from balrog_ray.geo.geometry import Polygon, polygon_contains
    from balrog_ray.geo.wkb import polygon_to_wkb

    ps, T = CFG.pixel_size, CFG.tile_px
    W = CFG.tiles_x * T * ps
    H = SPEC.y_north
    # pentagon over the middle of the world (crosses tile borders)
    poly = Polygon(np.array([
        [0.30 * W, 0.25 * H], [0.70 * W, 0.30 * H], [0.75 * W, 0.65 * H],
        [0.45 * W, 0.80 * H], [0.25 * W, 0.55 * H]]))

    ds = ray.data.from_arrow(synth.tiles_table(CFG))
    rows = bp.bal_pipeline(ds, SPEC, fdi=80,
                           mask=polygon_to_wkb(poly)).take_all()
    assert rows
    # pruning: only cells whose tile bbox intersects the polygon bbox
    emitted = {Caption.from_json(r["caption"]).tx
               + CFG.tiles_x * Caption.from_json(r["caption"]).ty
               for r in rows}
    bb = poly.bbox
    for cell in emitted:
        tx, ty = cell % CFG.tiles_x, cell // CFG.tiles_x
        x0, x1 = tx * T * ps, (tx + 1) * T * ps
        y1 = SPEC.y_north - ty * T * ps
        y0 = y1 - T * ps
        assert x0 <= bb[2] and x1 >= bb[0] and y0 <= bb[3] and y1 >= bb[1]

    full = {r["image_id"]: r for r in bal_rows}
    for r in rows:
        cap = Caption.from_json(r["caption"])
        got = decode_tile(r["bytes"], r["fmt"], cap)
        fr = full[r["image_id"]]
        ref = decode_tile(fr["bytes"], fr["fmt"],
                          Caption.from_json(fr["caption"]))
        xs = cap.tx * T * ps + (np.arange(T) + 0.5) * ps
        ys = SPEC.y_north - cap.ty * T * ps - (np.arange(T) + 0.5) * ps
        gx, gy = np.meshgrid(xs, ys)
        inside = polygon_contains(
            np.column_stack([gx.ravel(), gy.ravel()]), poly).reshape(T, T)
        assert_array_equal(got[inside], ref[inside])
        assert (got[~inside] == np.float32(-99.0)).all()

    with pytest.raises(ValueError):
        bp.bal_pipeline(ds, SPEC, mask=polygon_to_wkb(Polygon(np.array(
            [[-500.0, -500.0], [-400.0, -500.0], [-400.0, -400.0]]))))


def test_find_aoi_default_and_errors():
    assert bp.find_aoi("DEFAULT", SPEC) == bp.find_aoi(None, SPEC)
    full = bp.find_aoi("MINOF", SPEC)
    assert full[0] == 0.0 and full[3] == SPEC.y_north
    with pytest.raises(ValueError):
        bp.find_aoi((-10, -10, -5, -5), SPEC)


def test_veg_remap_path_matches_oracle(ray_session):
    """bal_pipeline(veg_remap=...) applies the reclass DSL to the veg layer
    before classification, identically to a whole-raster run."""
    import ray.data

    remap = "1 2;2 3;3 1;4 4;5 5;6 6;7 7"     # permute classes 1..3
    ds = ray.data.from_arrow(synth.tiles_table(CFG))
    rows = bp.bal_pipeline(ds, SPEC, fdi=80, veg_remap=remap).take_all()

    dem, veg = synth.global_arrays(CFG)
    from balrog_ray.core.remap import apply_remap as _ar
    veg_r = _ar(veg, remap).astype(np.float64)
    slope, aspect = slope_aspect(dem, CFG.pixel_size, CFG.pixel_size)
    aspect_c = apply_remap(aspect, ASPECT_RECLASS).astype(np.float64)
    slope_c = apply_remap(slope, slope_reclass()).astype(np.float64)
    expect = compute_bal(veg_r, slope_c, aspect_c, CFG.pixel_size, 80)

    got = reassemble(rows, "max", CFG)
    assert_array_equal(got, expect["max"].astype(np.float32))


def test_png_tiles_match_oracle_on_decoded_layers(ray_session):
    """PNG-encoded input parity (regression: affine quantization decoded
    veg class 3 as 3.0000305 -> class_index misclassified it as 4).  The
    oracle runs on the DECODED tile layers, so any codec drift that changes
    classification fails exactly."""
    import ray.data

    cfg = synth.SynthConfig(tiles_x=4, tiles_y=4, tile_px=64, fmt="png")
    spec = GridSpec.from_synth(cfg)
    tiles = synth.tiles_table(cfg)

    # reassemble the decoded dem/veg exactly as the pipeline will see them
    T = cfg.tile_px
    layers = {"dem": np.full(cfg.world_px, np.nan),
              "veg": np.full(cfg.world_px, np.nan)}
    for row in tiles.to_pylist():
        cap = Caption.from_json(row["caption"])
        arr = decode_tile(row["bytes"], row["fmt"], cap)
        layers[cap.layer][cap.ty * T:(cap.ty + 1) * T,
                          cap.tx * T:(cap.tx + 1) * T] = arr
    # veg classes must decode value-exact (the codec contract)
    veg = layers["veg"]
    valid = veg != -99.0
    assert_array_equal(veg[valid], np.round(veg[valid]))

    slope, aspect = slope_aspect(layers["dem"], cfg.pixel_size, cfg.pixel_size)
    aspect_c = apply_remap(aspect, ASPECT_RECLASS).astype(np.float64)
    slope_c = apply_remap(slope, slope_reclass()).astype(np.float64)
    expected = compute_bal(veg, slope_c, aspect_c, cfg.pixel_size, 80)

    rows = bp.bal_pipeline(ray.data.from_arrow(tiles), spec,
                           fdi=80).take_all()
    got = reassemble(rows, "max", cfg)
    assert_array_equal(got, expected["max"].astype(np.float32))


def test_aoi_subpixel_sliver_emits_all_nodata(ray_session):
    """An AOI that intersects a tile's bbox but contains no pixel centers
    must emit that tile fully masked, never unmasked (regression: the
    empty-mask case was treated as 'handled by cell prune')."""
    import ray.data

    ps, T = CFG.pixel_size, CFG.tile_px
    # sliver over tile (1,1): inside its bbox, between pixel centers
    x_edge = 1 * T * ps
    extent = (x_edge + 0.05 * ps, SPEC.y_north - 2 * T * ps + 0.05 * ps,
              x_edge + 0.4 * ps, SPEC.y_north - 1 * T * ps - 0.05 * ps)
    ds = ray.data.from_arrow(synth.tiles_table(CFG))
    rows = bp.bal_pipeline(ds, SPEC, fdi=80, extent=extent).take_all()
    assert rows, "sliver AOI intersects tile bbox -> cell must be emitted"
    for r in rows:
        cap = Caption.from_json(r["caption"])
        arr = decode_tile(r["bytes"], r["fmt"], cap)
        assert (arr == np.float32(-99.0)).all()
