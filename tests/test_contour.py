"""Marching-squares contour extraction: kernel truth cases (crossing
interpolation, saddle disambiguation, nodata skip) and exact whole-raster
parity of the tiled stage."""

import numpy as np
import pyarrow as pa

from balrog_ray.stages.contour import contour_lines, contour_segments
from balrog_ray.stages.halo import GridSpec
from balrog_ray.tiles.codec import Caption, decode_tile
from balrog_ray.tiles.synth import SynthConfig, tiles_table

ND = -99.0


def _seg_set(lev, ra, ca, rb, cb, digits=9):
    """Canonical multiset of segments: endpoint-sorted, rounded tuples."""
    out = []
    for i in range(len(lev)):
        a = (round(float(ra[i]), digits), round(float(ca[i]), digits))
        b = (round(float(rb[i]), digits), round(float(cb[i]), digits))
        lo, hi = (a, b) if a <= b else (b, a)
        out.append((round(float(lev[i]), digits), lo, hi))
    return sorted(out)


def test_single_cell_crossing_interpolation():
    # TL above only (case 1): crossings on top and left edges
    arr = np.array([[10.0, 0.0], [0.0, 0.0]], np.float32)
    lev, ra, ca, rb, cb = contour_segments(arr, [5.0], ND)
    assert len(lev) == 1
    segs = _seg_set(lev, ra, ca, rb, cb)
    # top edge: t = (5-10)/(0-10) = 0.5 -> (0, 0.5); left edge: (0.5, 0)
    assert segs == [(5.0, (0.0, 0.5), (0.5, 0.0))]


def test_full_cell_and_empty_cell_emit_nothing():
    hi = np.full((3, 3), 9.0, np.float32)
    lo = np.zeros((3, 3), np.float32)
    for arr in (hi, lo):
        lev, *_ = contour_segments(arr, [5.0], ND)
        assert len(lev) == 0


def test_saddle_disambiguation_by_center():
    # TR and BL above (case 6).  Center mean decides the pairing.
    arr_hi = np.array([[0.0, 10.0], [10.0, 4.0]], np.float32)   # center 6>5
    lev, ra, ca, rb, cb = contour_segments(arr_hi, [5.0], ND)
    assert len(lev) == 2
    segs = _seg_set(lev, ra, ca, rb, cb)
    # center above: T-L and R-B
    assert segs[0][1:] == ((0.0, 0.5), (0.5, 0.0))
    arr_lo = np.array([[0.0, 10.0], [10.0, 0.0]], np.float32)   # center 5==5
    lev2, ra2, ca2, rb2, cb2 = contour_segments(arr_lo, [5.0], ND)
    segs2 = _seg_set(lev2, ra2, ca2, rb2, cb2)
    # center not above: T-R and L-B
    assert segs2[0][1:] == ((0.0, 0.5), (0.5, 1.0))
    assert len(segs2) == 2


def test_nodata_corner_skips_cell():
    arr = np.array([[10.0, ND], [0.0, 0.0]], np.float32)
    lev, *_ = contour_segments(arr, [5.0], ND)
    assert len(lev) == 0


def test_keep_mask_restricts_cells():
    rng = np.random.default_rng(3)
    arr = rng.uniform(0, 10, (6, 6)).astype(np.float32)
    keep = np.zeros((5, 5), bool)
    keep[1, 2] = True
    lev, ra, ca, rb, cb = contour_segments(arr, [5.0], ND, keep=keep)
    full = contour_segments(arr, [5.0], ND)
    assert len(lev) <= len(full[0])
    for r, c in zip(ra, ca):
        assert 1.0 <= r <= 2.0 and 2.0 <= c <= 3.0


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


def test_tiled_contours_match_whole_raster(ray_session):
    import ray.data

    cfg = SynthConfig(tiles_x=3, tiles_y=3, tile_px=48)
    tab = tiles_table(cfg)
    spec = GridSpec.from_synth(cfg)
    levels = [40.0, 70.0, 100.0, 125.0]

    rows = (contour_lines(ray.data.from_arrow(tab), spec, levels=levels,
                          layer="dem").take_all())
    assert len(rows) > 200

    dem = _mosaic(tab, "dem", cfg)
    lev, ra, ca, rb, cb = contour_segments(dem, levels, ND)
    ps, yn = cfg.pixel_size, cfg.y_north
    want = _seg_set(lev, (yn - (ra + 0.5) * ps), (ca + 0.5) * ps,
                    (yn - (rb + 0.5) * ps), (cb + 0.5) * ps, digits=6)
    got = _seg_set([r["level"] for r in rows], [r["ay"] for r in rows],
                   [r["ax"] for r in rows], [r["by"] for r in rows],
                   [r["bx"] for r in rows], digits=6)
    assert got == want


def test_incomplete_input_emits_nothing_for_missing_neighborhood(
        ray_session):
    import ray.data

    cfg = SynthConfig(tiles_x=3, tiles_y=3, tile_px=48)
    tab = tiles_table(cfg)
    # drop the dem tile at (1, 1): its 8 neighbours lose completeness too
    caps = [Caption.from_json(tab.column("caption")[i].as_py())
            for i in range(tab.num_rows)]
    keep = [i for i, c in enumerate(caps)
            if not (c.layer == "dem" and c.tx == 1 and c.ty == 1)]
    tab2 = tab.take(pa.array(keep, pa.int64()))
    spec = GridSpec.from_synth(cfg)
    rows = (contour_lines(ray.data.from_arrow(tab2), spec,
                          levels=[70.0], layer="dem").take_all())
    cells = {r["cell_id"] for r in rows}
    # every cell in the 3x3 grid neighbours (1,1) -> nothing computes
    assert cells == set()
