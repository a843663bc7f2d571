"""Veg data-prep pipeline: explode / classify / subdivide / roll-up
parity with a driver-side oracle over the same raw table."""

import numpy as np
import pyarrow as pa

from balrog_ray.core.remap import NVIS_LOOKUP, apply_nvis_lookup
from balrog_ray.geo.geometry import Polygon
from balrog_ray.geo.wkb import from_wkb
from balrog_ray.pipelines.veg_prep import veg_prep_pipeline
from balrog_ray.tiles.synth import SynthConfig, raw_nvis_table

CFG = SynthConfig(tiles_x=4, tiles_y=4, tile_px=64)


def oracle(raw: pa.Table, max_vertices=32):
    """Scalar reference computation of the per-class roll-up."""
    per_class = {}
    for src, mvg, wkb in zip(raw.column("src_id").to_pylist(),
                             raw.column("mvg_number").to_pylist(),
                             raw.column("geom").to_pylist()):
        cls = NVIS_LOOKUP.get(int(mvg), -9999)
        if cls <= 0 or cls > 7:
            continue
        g = from_wkb(wkb)
        for p in (g if isinstance(g, list) else [g]):
            if not isinstance(p, Polygon) or len(p.exterior) < 4 \
                    or p.area <= 0:
                continue
            e = per_class.setdefault(cls, {"n": 0, "area": 0.0,
                                           "bb": [np.inf, np.inf,
                                                  -np.inf, -np.inf]})
            e["area"] += p.area
            bb = p.bbox
            e["bb"] = [min(e["bb"][0], bb[0]), min(e["bb"][1], bb[1]),
                       max(e["bb"][2], bb[2]), max(e["bb"][3], bb[3])]
    return per_class


def test_veg_prep_rollup_matches_oracle(ray_session):
    import ray.data

    raw = raw_nvis_table(CFG)
    prepped, summary = veg_prep_pipeline(ray.data.from_arrow(raw),
                                         max_vertices=32)
    rows = {r["bal_number"]: r for r in summary.take_all()}
    exp = oracle(raw)
    assert set(rows) == set(exp)
    for cls, e in exp.items():
        r = rows[cls]
        # subdivision preserves total area (rectangle clips are exact
        # up to float round-off) and the class bbox
        assert abs(r["total_area_m2"] - e["area"]) / e["area"] < 1e-6
        assert np.allclose([r["xmin"], r["ymin"], r["xmax"], r["ymax"]],
                           e["bb"], atol=1e-6)

    parts = prepped.take_all()
    # every part obeys the vertex bound (+1 for ring closure slack)
    assert all(p["n_points"] <= 33 for p in parts)
    # degenerate slivers and not-applicable MVGs never survive
    assert all(1 <= p["bal_number"] <= 7 and p["area_m2"] > 0
               for p in parts)


def test_nvis_lookup_is_value_keyed():
    """MVG 1 -> class 6 (rainforest): the sequential Gen-1 remap string
    would re-capture it into class 2; the pipeline must use the value-keyed
    Gen-2 lookup (02_create_nvis_bal_map_table.sql:46-49)."""
    got = apply_nvis_lookup(np.array([1, 2, 5, 14, 15, 19, 23, 26, 99, 50]))
    assert got.tolist() == [6, 1, 2, 5, 3, 7, -9999, 4, -9999, -9999]


def test_simplify_properties():
    """DP simplify: vertices are a subset of input, every dropped vertex
    stays within tolerance of the simplified outline, area drift is
    bounded, and degenerate inputs drop cleanly."""
    import numpy as np

    from balrog_ray.geo.geometry import (Polygon, _seg_nearest, simplify)

    rng = np.random.default_rng(8)
    # noisy circle: 200 vertices, radius 100 +- 0.5 jitter
    th = np.linspace(0, 2 * np.pi, 201)[:-1]
    r = 100.0 + rng.uniform(-0.5, 0.5, len(th))
    ring = np.stack([r * np.cos(th), r * np.sin(th)], axis=1)
    poly = Polygon(ring)
    tol = 2.0
    out = simplify(poly, tol)
    assert out is not None
    # far fewer vertices, all drawn from the input set
    assert len(out.exterior) < len(poly.exterior) / 3
    in_set = {(round(x, 9), round(y, 9)) for x, y in poly.exterior}
    assert all((round(x, 9), round(y, 9)) in in_set
               for x, y in out.exterior)
    # every original vertex within tol of the simplified outline
    d, _ = _seg_nearest(poly.exterior, out.exterior)
    assert d.max() <= tol + 1e-9
    # area drift bounded by perimeter * tol
    assert abs(out.area - poly.area) <= tol * 2 * np.pi * 101
    # tiny tolerance: nothing dropped
    same = simplify(poly, 1e-12)
    assert len(same.exterior) == len(poly.exterior)
    # degenerate: all points coincide -> dropped
    assert simplify(Polygon(np.zeros((5, 2))), 1.0) is None


def _inside_hull(hull: np.ndarray, pts: np.ndarray, eps=1e-7) -> bool:
    """Every point on/inside the CCW hull (cross-product half-plane)."""
    n = len(hull)
    for i in range(n):
        a, b = hull[i], hull[(i + 1) % n]
        cr = ((b[0] - a[0]) * (pts[:, 1] - a[1])
              - (b[1] - a[1]) * (pts[:, 0] - a[0]))
        if (cr < -eps * max(1.0, np.abs(pts).max())).any():
            return False
    return True


def test_convex_hull_properties():
    from balrog_ray.geo.geometry import convex_hull, hull_area

    # known square + interior/edge points
    pts = np.array([[0, 0], [4, 0], [4, 4], [0, 4],
                    [2, 2], [2, 0], [4, 2]], float)
    h = convex_hull(pts)
    assert len(h) == 4 and hull_area(h) == 16.0
    assert _inside_hull(h, pts)
    # keep_collinear retains the edge midpoints
    hk = convex_hull(pts, keep_collinear=True)
    assert len(hk) == 6
    # random clouds: hull contains everything, vertices are inputs
    rng = np.random.default_rng(3)
    for _ in range(5):
        p = rng.normal(size=(200, 2)) * 10
        h = convex_hull(p)
        assert _inside_hull(h, p)
        assert all(any(np.all(np.isclose(v, q)) for q in p) for v in h)
    # degenerate: collinear + tiny inputs
    assert len(convex_hull(np.array([[0, 0], [1, 1], [2, 2]], float))) <= 3
    assert len(convex_hull(np.array([[1, 2]], float))) == 1


def test_class_hull_pipeline_matches_direct(ray_session):
    import ray.data

    from balrog_ray.geo.geometry import convex_hull, hull_area
    from balrog_ray.pipelines.veg_prep import (class_hull_pipeline,
                                               veg_prep_pipeline)
    from balrog_ray.tiles.synth import raw_nvis_table

    raw = raw_nvis_table(CFG)
    prepped, _ = veg_prep_pipeline(ray.data.from_arrow(raw),
                                   max_vertices=32)
    prepped = prepped.materialize()
    got = {r["bal_number"]: r
           for r in class_hull_pipeline(prepped).take_all()}

    # direct oracle: hull over ALL part vertices per class, one pass
    by_cls = {}
    for r in prepped.take_all():
        g = from_wkb(r["geom"])
        for p in (g if isinstance(g, list) else [g]):
            by_cls.setdefault(r["bal_number"], []).append(p.exterior[:-1])
    assert set(got) == set(by_cls)
    for cls, chunks in by_cls.items():
        want = convex_hull(np.concatenate(chunks))
        gh = from_wkb(got[cls]["geom"]).exterior[:-1]
        assert np.allclose(np.sort(gh, axis=0), np.sort(want, axis=0)), cls
        assert got[cls]["n_vertices"] == len(want)
        assert abs(got[cls]["hull_area"] - hull_area(want)) < 1e-6
        assert _inside_hull(gh, np.concatenate(chunks))


# ---------------------------------------------------------------------------
# geodesic (spherical-excess) polygon area -- metric="geodesic_sphere"

def _lhuilier_tri_area(p0, p1, p2):
    """Spherical triangle area from haversine side lengths (l'Huilier):
    shares nothing with the line-integral implementation under test."""
    from balrog_ray.geo.geodesic import EARTH_R, haversine_m

    a = haversine_m(p1[0], p1[1], p2[0], p2[1]) / EARTH_R
    b = haversine_m(p0[0], p0[1], p2[0], p2[1]) / EARTH_R
    c = haversine_m(p0[0], p0[1], p1[0], p1[1]) / EARTH_R
    s = (a + b + c) / 2.0
    t = np.sqrt(max(0.0, np.tan(s / 2) * np.tan((s - a) / 2)
                    * np.tan((s - b) / 2) * np.tan((s - c) / 2)))
    return 4.0 * np.arctan(t) * EARTH_R ** 2


def test_spherical_area_matches_triangulated_oracle():
    from balrog_ray.geo.geodesic import spherical_polygon_area_m2

    # a convex quadrilateral at mid latitude (fan-triangulated oracle)
    ring = np.array([[115.0, -35.0], [115.4, -35.05],
                     [115.5, -34.6], [115.1, -34.55]])
    got = spherical_polygon_area_m2(Polygon(ring))
    want = (_lhuilier_tri_area(ring[0], ring[1], ring[2])
            + _lhuilier_tri_area(ring[0], ring[2], ring[3]))
    assert abs(got - want) / want < 0.005      # VERDICT bar: 0.5%
    # winding must not matter
    assert np.isclose(got, spherical_polygon_area_m2(Polygon(ring[::-1])))


def test_spherical_area_matches_cap_and_subtracts_holes():
    from balrog_ray.geo.geodesic import (EARTH_R, geodesic_point_buffer,
                                         spherical_polygon_area_m2)

    r = 50_000.0                                 # 50 km circle at -35
    circle = geodesic_point_buffer(116.0, -35.0, r, n_seg=512)
    cap = 2 * np.pi * EARTH_R ** 2 * (1 - np.cos(r / EARTH_R))
    got = spherical_polygon_area_m2(circle)
    assert abs(got - cap) / cap < 0.005
    hole = geodesic_point_buffer(116.0, -35.0, r / 2, n_seg=512)
    with_hole = Polygon(circle.exterior, holes=[hole.exterior])
    want = cap - 2 * np.pi * EARTH_R ** 2 * (1 - np.cos(r / 2 / EARTH_R))
    assert abs(spherical_polygon_area_m2(with_hole) - want) / want < 0.005


def test_veg_prep_geodesic_metric(ray_session):
    """metric='geodesic_sphere' flows through the pipeline: lon/lat
    input polygons get spherical areas; the planar default is
    untouched."""
    import ray.data

    from balrog_ray.geo.geodesic import spherical_polygon_area_m2
    from balrog_ray.geo.wkb import polygon_to_wkb

    ring = np.array([[115.0, -35.0], [115.2, -35.0],
                     [115.2, -34.8], [115.0, -34.8]])
    raw = pa.table({
        "src_id": pa.array([1], pa.int64()),
        "mvg_number": pa.array([3], pa.int64()),   # maps to a 1..7 class
        "geom": pa.array([polygon_to_wkb(Polygon(ring))], pa.binary())})
    prepped, _ = veg_prep_pipeline(
        ray.data.from_arrow(raw), max_vertices=64,
        metric="geodesic_sphere")
    rows = prepped.take_all()
    assert len(rows) == 1
    want = spherical_polygon_area_m2(Polygon(ring))
    assert np.isclose(rows[0]["area_m2"], want, rtol=1e-12)
    # planar default unchanged: degree-shoelace, a very different number
    prepped_p, _ = veg_prep_pipeline(ray.data.from_arrow(raw))
    assert np.isclose(prepped_p.take_all()[0]["area_m2"],
                      Polygon(ring).area, rtol=1e-12)
    import pytest as _pt

    with _pt.raises(ValueError, match="metric"):
        veg_prep_pipeline(ray.data.from_arrow(raw), metric="bogus")


def test_class_union_geodesic_metric(ray_session):
    """metric='geodesic_sphere' flows through the union tree: the
    dissolved multipolygon's area is spherical; planar default
    untouched."""
    import ray.data

    from balrog_ray.geo.geodesic import spherical_polygon_area_m2
    from balrog_ray.geo.wkb import polygon_to_wkb
    from balrog_ray.pipelines.veg_prep import (PREPPED_SCHEMA,
                                               class_union_pipeline)

    ring = np.array([[115.0, -35.0], [115.2, -35.0],
                     [115.2, -34.8], [115.0, -34.8]])
    p = Polygon(ring)
    bb = p.bbox
    prepped = pa.table({
        "part_id": pa.array([0], pa.int64()),
        "src_id": pa.array([1], pa.int64()),
        "bal_number": pa.array([2], pa.int16()),
        "area_m2": pa.array([p.area], pa.float64()),
        "n_points": pa.array([len(p.exterior)], pa.int32()),
        "xmin": pa.array([bb[0]], pa.float64()),
        "ymin": pa.array([bb[1]], pa.float64()),
        "xmax": pa.array([bb[2]], pa.float64()),
        "ymax": pa.array([bb[3]], pa.float64()),
        "geom": pa.array([polygon_to_wkb(p)], pa.binary()),
    }, schema=PREPPED_SCHEMA)
    ds = ray.data.from_arrow(prepped)
    geo = class_union_pipeline(ds, metric="geodesic_sphere").take_all()
    assert np.isclose(geo[0]["union_area_m2"],
                      spherical_polygon_area_m2(p), rtol=1e-12)
    plan = class_union_pipeline(ds).take_all()
    assert np.isclose(plan[0]["union_area_m2"], p.area, rtol=1e-12)
