"""Distributed attribute-burn rasterization vs a whole-raster paint
oracle: the tiled groupby(cell) output, mosaicked back, must equal one
global ``geometry.rasterize`` pass in ascending-gid paint order, and
cells no polygon bbox touches must emit no rows at all."""

import numpy as np
import pyarrow as pa
import pytest

from balrog_ray.geo.geometry import Polygon, rasterize
from balrog_ray.geo.wkb import multipolygon_to_wkb, polygon_to_wkb
from balrog_ray.stages.halo import GridSpec
from balrog_ray.stages.rasterize import NODATA, rasterize_polygons
from balrog_ray.tiles.codec import Caption, decode_tile


def _mosaic(tab, spec):
    T = spec.tile_px
    out = np.full((spec.tiles_y * T, spec.tiles_x * T), NODATA, np.float32)
    touched = set()
    for i in range(tab.num_rows):
        cap = Caption.from_json(tab.column("caption")[i].as_py())
        arr = decode_tile(tab.column("bytes")[i].as_py(),
                          tab.column("fmt")[i].as_py(), cap)
        out[cap.ty * T:(cap.ty + 1) * T, cap.tx * T:(cap.tx + 1) * T] = arr
        touched.add((cap.tx, cap.ty))
    return out, touched


def _polys_fixture(spec, seed=7):
    """Rectangles, triangles and one multipolygon scattered over (and
    slightly past) the grid; overlapping on purpose so paint order
    matters."""
    rng = np.random.default_rng(seed)
    W = spec.tiles_x * spec.tile_px * spec.pixel_size
    H = spec.tiles_y * spec.tile_px * spec.pixel_size
    rows = []
    gid = 0
    for _ in range(14):
        x = rng.uniform(-4, W)
        y = rng.uniform(-4, H)
        w = rng.uniform(2, W * 0.5)
        h = rng.uniform(2, H * 0.5)
        if rng.random() < 0.5:
            ring = [(x, y), (x + w, y), (x + w, y + h), (x, y + h)]
        else:
            ring = [(x, y), (x + w, y + rng.uniform(0, h)), (x + w / 2, y + h)]
        rows.append((gid, float(rng.integers(1, 30)),
                     polygon_to_wkb(Polygon(np.array(ring, float)))))
        gid += 1
    # one multipolygon whose parts land in different tiles
    p1 = Polygon(np.array([(1.0, 1.0), (6.0, 1.0), (6.0, 6.0), (1.0, 6.0)]))
    p2 = Polygon(np.array([(W - 7, H - 7), (W - 2, H - 7), (W - 2, H - 2)]))
    rows.append((gid, 42.0, multipolygon_to_wkb([p1, p2])))
    return rows


def _oracle(rows, spec):
    """One global paint in ascending gid order (later gid overwrites)."""
    from balrog_ray.geo.wkb import from_wkb
    T, ps = spec.tile_px, spec.pixel_size
    polys, vals = [], []
    for gid, val, wkb in sorted(rows, key=lambda r: r[0]):
        obj = from_wkb(wkb)
        parts = obj if isinstance(obj, list) else [obj]
        polys.extend(parts)
        vals.extend([val] * len(parts))
    return rasterize(polys, vals, 0.0, spec.y_north, ps,
                     spec.tiles_y * T, spec.tiles_x * T,
                     fill=NODATA).astype(np.float32)


def test_rasterize_matches_whole_raster_paint(ray_session):
    import ray.data

    spec = GridSpec(tiles_x=3, tiles_y=2, tile_px=16, pixel_size=1.0,
                    y_north=32.0)
    rows = _polys_fixture(spec)
    ds = ray.data.from_arrow(pa.table({
        "gid": pa.array([r[0] for r in rows], pa.int64()),
        "bal_number": pa.array([r[1] for r in rows], pa.float64()),
        "geom": pa.array([r[2] for r in rows], pa.binary()),
    })).repartition(4)

    import ray
    tiles = pa.concat_tables(ray.get(
        rasterize_polygons(ds, spec).to_arrow_refs()))
    got, touched = _mosaic(tiles, spec)
    want = _oracle(rows, spec)
    np.testing.assert_array_equal(got, want)

    # no-coverage cells emit nothing: every un-emitted tile is all-fill
    # in the oracle too
    T = spec.tile_px
    for ty in range(spec.tiles_y):
        for tx in range(spec.tiles_x):
            if (tx, ty) not in touched:
                assert (want[ty * T:(ty + 1) * T,
                             tx * T:(tx + 1) * T] == NODATA).all()


def test_rasterize_gid_order_not_input_order(ray_session):
    """Shuffled input rows must still paint in gid order."""
    import ray
    import ray.data

    spec = GridSpec(tiles_x=1, tiles_y=1, tile_px=8, pixel_size=1.0,
                    y_north=8.0)
    sq = lambda x0, y0, s: Polygon(np.array(
        [(x0, y0), (x0 + s, y0), (x0 + s, y0 + s), (x0, y0 + s)], float))
    # gid 1 paints over gid 0 where they overlap, regardless of row order
    rows = [(1, 9.0, polygon_to_wkb(sq(2, 2, 4))),
            (0, 5.0, polygon_to_wkb(sq(0, 0, 5)))]
    ds = ray.data.from_arrow(pa.table({
        "gid": pa.array([r[0] for r in rows], pa.int64()),
        "bal_number": pa.array([r[1] for r in rows], pa.float64()),
        "geom": pa.array([r[2] for r in rows], pa.binary())}))
    tiles = pa.concat_tables(ray.get(
        rasterize_polygons(ds, spec).to_arrow_refs()))
    got, _ = _mosaic(tiles, spec)
    want = _oracle(rows, spec)
    np.testing.assert_array_equal(got, want)
    assert (got[got != NODATA] == 9.0).sum() >= 16  # overlap went to gid 1
