"""Polygon boolean kit (Greiner-Hormann) + the per-class union tree-reduce
(reference 04_merge_geometries.py:129-205): exact rasterized-mask parity
with the painted input parts is the oracle throughout."""

import numpy as np
import pyarrow as pa
import pytest
from numpy.testing import assert_array_equal

from balrog_ray.geo.boolean import (intersection_area, polygon_union,
                                    ring_boolean, _nest, union_all)
from balrog_ray.geo.geometry import Polygon, rasterize

A = np.array([[0.0, 0], [10, 0], [10, 10], [0, 10]])
B = np.array([[5.0, 5], [15, 5], [15, 15], [5, 15]])


def test_pairwise_ops_exact_areas():
    for op, expect in (("union", 175.0), ("intersection", 25.0),
                       ("difference", 75.0)):
        polys = _nest(ring_boolean(A, B, op))
        assert np.isclose(sum(p.area for p in polys), expect), op
    assert np.isclose(intersection_area(Polygon(A), Polygon(B)), 25.0)
    # disjoint / contained special cases
    assert len(union_all([Polygon(A), Polygon(A + 100)])) == 2
    assert np.isclose(
        sum(p.area for p in union_all([Polygon(A), Polygon(A * 0.5 + 2)])),
        100.0)
    assert intersection_area(Polygon(A), Polygon(A + 100)) == 0.0


def test_difference_creates_hole():
    C = np.array([[0.0, 0], [30, 0], [30, 30], [0, 30]])
    D = np.array([[10.0, 10], [20, 10], [20, 20], [10, 20]])
    polys = _nest(ring_boolean(C, D, "difference"))
    assert len(polys) == 1 and len(polys[0].holes) == 1
    assert np.isclose(polys[0].area, 800.0)


def test_union_frame_creates_hole():
    # four jittered bars forming a frame (general position: no shared
    # collinear edges, which the kit documents as out of scope)
    bars = [
        Polygon(np.array([[-1.0, -1], [31, -0.5], [30.5, 6], [-0.5, 5.5]])),
        Polygon(np.array([[-0.7, 24.5], [30.8, 25], [31.2, 31], [-1.1, 30.6]])),
        Polygon(np.array([[-1.2, -2], [5.3, -1.8], [5.8, 31.5], [-0.9, 31.2]])),
        Polygon(np.array([[24.6, -1.4], [31.3, -1.6], [30.9, 31.8],
                          [25.1, 31.4]])),
    ]
    u = union_all(bars)
    assert len(u) == 1 and len(u[0].holes) == 1
    ref = rasterize(bars, [1.0] * 4, -5.0, 40.0, 0.25, 200, 200, fill=0.0)
    got = rasterize(u, [1.0] * len(u), -5.0, 40.0, 0.25, 200, 200, fill=0.0)
    assert_array_equal(ref, got)


def _blob(rng, cx, cy, r, nv=9):
    ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
    rad = rng.uniform(0.4, 1.0, nv) * r
    return Polygon(np.column_stack([cx + rad * np.cos(ang),
                                    cy + rad * np.sin(ang)]))


def test_union_all_random_blobs_rasterized_parity():
    rng = np.random.default_rng(11)
    for trial in range(12):
        k = int(rng.integers(3, 12))
        polys = [_blob(rng, rng.uniform(10, 90), rng.uniform(10, 90),
                       rng.uniform(4, 28), nv=int(rng.integers(5, 13)))
                 for _ in range(k)]
        u = union_all(polys)
        ref = rasterize(polys, [1.0] * k, 0.0, 100.0, 0.5, 200, 200,
                        fill=0.0)
        got = rasterize(u, [1.0] * len(u), 0.0, 100.0, 0.5, 200, 200,
                        fill=0.0)
        assert_array_equal(ref, got, err_msg=f"trial {trial}")
        # dissolve invariants
        assert sum(p.area for p in u) <= sum(p.area for p in polys) + 1e-6
        assert len(u) <= k


def test_intersection_area_matches_raster_estimate():
    rng = np.random.default_rng(3)
    for _ in range(8):
        a = _blob(rng, 45, 45, 30)
        b = _blob(rng, 55, 55, 30)
        exact = intersection_area(a, b)
        ra = rasterize([a], [1.0], 0.0, 100.0, 0.125, 800, 800, fill=0.0)
        rb = rasterize([b], [1.0], 0.0, 100.0, 0.125, 800, 800, fill=0.0)
        est = float(((ra == 1) & (rb == 1)).sum()) * 0.125 * 0.125
        assert abs(exact - est) < 0.05 * max(exact, 1.0)


def test_class_union_pipeline(ray_session):
    """Partial/final union tree: per-class dissolve area equals the
    rasterized paint of that class's parts, independent of block split."""
    import ray.data

    from balrog_ray.geo.wkb import from_wkb
    from balrog_ray.pipelines.veg_prep import (class_union_pipeline,
                                               veg_prep_pipeline)
    from balrog_ray.tiles.synth import SynthConfig, raw_nvis_table

    cfg = SynthConfig(tiles_x=4, tiles_y=4, tile_px=64, n_polygons=48)
    raw = raw_nvis_table(cfg)
    prepped, _ = veg_prep_pipeline(
        ray.data.from_arrow(raw).repartition(6), max_vertices=32)
    prepped_rows = prepped.take_all()
    rows = class_union_pipeline(prepped).take_all()
    assert rows and all(r["n_parts"] >= 1 for r in rows)

    ps = 12.0
    W = cfg.tiles_x * cfg.tile_px * cfg.pixel_size
    for r in rows:
        cls = r["bal_number"]
        parts = [from_wkb(p["geom"]) for p in prepped_rows
                 if p["bal_number"] == cls]
        merged = from_wkb(r["geom"])
        merged = merged if isinstance(merged, list) else [merged]
        n = int(np.ceil(W / ps))
        ref = rasterize(parts, [1.0] * len(parts), 0.0, W, ps, n, n,
                        fill=0.0)
        got = rasterize(merged, [1.0] * len(merged), 0.0, W, ps, n, n,
                        fill=0.0)
        assert_array_equal(ref, got, err_msg=f"class {cls}")
        assert r["union_area_m2"] <= sum(p.area for p in parts) + 1e-6
