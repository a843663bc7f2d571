"""Vegetation data-prep pipeline: the reference's Gen-2 polygon flow
re-expressed Ray-Data-first.

Reference flow (PostGIS, serial, 9.5 h + 36 h):
  explode multipolygons + validity fix      03_explode_multipolygons_and_classify.sql:2-31
  NVIS MVG -> BAL class lookup UPDATE       02_create_nvis_bal_map_table.sql:54-101
  st_union group by class (partial/final)   04_merge_geometries.py:129-205
  st_subdivide big polygons (skew fix)      03_explode_multipolygons_and_classify.sql:66-80

Here: one streaming pass of ``map_batches`` stages and ONE ``groupby``:

  raw (src_id, mvg_number, geom WKB poly/multipoly)
    -> explode: 1 row in -> N polygon rows (drop degenerate parts)
    -> classify: MVG -> AS 3959 class 1..7 via the broadcast NVIS map;
       'not applicable' classes (-99, e.g. mangroves) dropped
    -> subdivide: halve big polygons until <= max_vertices / max_extent
    -> groupby(bal_number): partial per-block (count/area/bbox) reduced
       by a final per-class merge -- the partial/final aggregate shape of
       the reference's chunked union.

The GEOMETRIC st_union tree-reduce is :func:`class_union_pipeline`:
per-block partial dissolve (geo/boolean.union_all) + one groupby-final
merge per class -- the reference's two-level chunked ``ST_Union`` shape
(``04_merge_geometries.py:129-205``) with holes preserved through WKB.
Downstream consumers (spatial join, rasterize) may still use the
subdivided parts directly, which is cheaper and skew-free.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core.remap import apply_nvis_lookup
from ..geo.geometry import Polygon, subdivide
from ..geo.wkb import from_wkb, polygon_to_wkb

PREPPED_SCHEMA = pa.schema([
    ("part_id", pa.int64()),        # dense, deterministic within a block
    ("src_id", pa.int64()),
    ("bal_number", pa.int16()),
    ("area_m2", pa.float64()),
    ("n_points", pa.int32()),
    # part bbox emitted at explode time: the per-class summary then needs
    # no second WKB decode pass over the whole dataset
    ("xmin", pa.float64()), ("ymin", pa.float64()),
    ("xmax", pa.float64()), ("ymax", pa.float64()),
    ("geom", pa.binary()),
])

CLASS_SCHEMA = pa.schema([
    ("bal_number", pa.int16()),
    ("n_polygons", pa.int64()),
    ("total_area_m2", pa.float64()),
    ("xmin", pa.float64()), ("ymin", pa.float64()),
    ("xmax", pa.float64()), ("ymax", pa.float64()),
])


def explode_classify_subdivide(max_vertices: int = 64,
                               max_extent: float | None = None,
                               classify=apply_nvis_lookup,
                               metric: str = "planar"):
    """Batch fn: raw rows -> prepped polygon part rows (PREPPED_SCHEMA).

    ``metric="geodesic_sphere"`` computes ``area_m2`` as true spherical
    area for lon/lat (EPSG:4283-style) geometry -- the reference's
    ``pyproj.Geod.geometry_area_perimeter``
    (``04_merge_geometries.py:188``) / ``st_area(geography)``
    (``03_explode_multipolygons_and_classify.sql:44``) semantics; the
    default planar shoelace is exact for projected-metre inputs.
    Degeneracy checks, subdivision and bboxes stay in the native
    coordinate plane either way."""
    if metric not in ("planar", "geodesic_sphere"):
        raise ValueError(
            f"metric must be planar|geodesic_sphere, got {metric!r}")
    if metric == "geodesic_sphere":
        from ..geo.geodesic import spherical_polygon_area_m2 as _area
    else:
        def _area(p: Polygon) -> float:
            return p.area

    def fn(batch: pa.Table) -> pa.Table:
        src_ids = batch.column("src_id").to_pylist()
        mvgs = np.asarray(batch.column("mvg_number").to_pylist(),
                          dtype=np.int64)
        classes = classify(mvgs)
        out = {n: [] for n in PREPPED_SCHEMA.names}
        part_id = 0
        for src, cls, wkb in zip(src_ids, classes,
                                 batch.column("geom").to_pylist()):
            if cls <= 0 or cls > 7:          # 'not applicable' -> dropped
                continue
            geom = from_wkb(wkb)
            parts = geom if isinstance(geom, list) else [geom]
            for p in parts:
                if not isinstance(p, Polygon) or len(p.exterior) < 4 \
                        or p.area <= 0:      # degenerate, st_makevalid role
                    continue
                for piece in subdivide(p, max_vertices=max_vertices,
                                       max_extent=max_extent):
                    bb = piece.bbox
                    out["part_id"].append(part_id)
                    out["src_id"].append(int(src))
                    out["bal_number"].append(int(cls))
                    out["area_m2"].append(float(_area(piece)))
                    out["n_points"].append(len(piece.exterior))
                    out["xmin"].append(float(bb[0]))
                    out["ymin"].append(float(bb[1]))
                    out["xmax"].append(float(bb[2]))
                    out["ymax"].append(float(bb[3]))
                    out["geom"].append(polygon_to_wkb(piece))
                    part_id += 1
        return pa.table(out, schema=PREPPED_SCHEMA)

    return fn


UNION_SCHEMA = pa.schema([
    ("bal_number", pa.int16()),
    ("n_parts", pa.int64()),          # disjoint polygons in the dissolve
    ("n_holes", pa.int64()),
    ("union_area_m2", pa.float64()),
    ("geom", pa.binary()),            # MultiPolygon WKB, holes preserved
])


def _union_to_row(cls: int, polys: list[Polygon],
                  metric: str = "planar") -> dict:
    from ..geo.boolean import union_all
    from ..geo.wkb import multipolygon_to_wkb

    if metric not in ("planar", "geodesic_sphere"):
        raise ValueError(
            f"metric must be planar|geodesic_sphere, got {metric!r}")
    if metric == "geodesic_sphere":
        from ..geo.geodesic import spherical_polygon_area_m2 as _area
    else:
        def _area(p: Polygon) -> float:
            return p.area

    merged = union_all(polys)
    return {
        "bal_number": int(cls),
        "n_parts": len(merged),
        "n_holes": sum(len(p.holes) for p in merged),
        "union_area_m2": float(sum(_area(p) for p in merged)),
        "geom": multipolygon_to_wkb(merged),
    }


def _rows_to_table(rows: list[dict]) -> pa.Table:
    return pa.table({n: [r[n] for r in rows] for n in UNION_SCHEMA.names},
                    schema=UNION_SCHEMA)


def class_union_pipeline(prepped_ds, metric: str = "planar"):
    """Geometric per-class union as the reference's chunked partial/final
    ``ST_Union`` tree (``04_merge_geometries.py:129-205``);
    ``metric="geodesic_sphere"`` reports ``union_area_m2`` as true
    spherical area for lon/lat geometry (the reference's
    ``pyproj.Geod.geometry_area_perimeter``, ``04_merge_geometries.py:188``;
    any other non-planar value raises):

    * **partial** -- each block unions ITS polygons per class inside
      ``map_batches`` (bounded input, embarrassingly parallel -- the
      reference's per-chunk union);
    * **final**   -- one ``groupby(bal_number)`` merges the partial
      multipolygons per class (the reference's union-of-chunks; one task
      per class, fed pre-dissolved geometry whose size is bounded by the
      merged boundary complexity, not the raw polygon count).

    Returns a Dataset of UNION_SCHEMA rows, one per class.
    """
    if metric not in ("planar", "geodesic_sphere"):
        raise ValueError(
            f"metric must be planar|geodesic_sphere, got {metric!r}")

    def partial_fn(batch: pa.Table) -> pa.Table:
        by_cls: dict[int, list[Polygon]] = {}
        for cls, wkb in zip(batch.column("bal_number").to_pylist(),
                            batch.column("geom").to_pylist()):
            g = from_wkb(wkb)
            for p in (g if isinstance(g, list) else [g]):
                by_cls.setdefault(int(cls), []).append(p)
        return _rows_to_table(
            [_union_to_row(c, ps, metric)
             for c, ps in sorted(by_cls.items())])

    def final_fn(group: pa.Table) -> pa.Table:
        cls = int(group.column("bal_number")[0].as_py())
        polys: list[Polygon] = []
        for wkb in group.column("geom").to_pylist():
            g = from_wkb(wkb)
            polys.extend(g if isinstance(g, list) else [g])
        return _rows_to_table([_union_to_row(cls, polys, metric)])

    return (prepped_ds
            .map_batches(partial_fn, batch_format="pyarrow")
            .groupby("bal_number")
            .map_groups(final_fn, batch_format="pyarrow"))


def veg_prep_pipeline(raw_ds, max_vertices: int = 64,
                      max_extent: float | None = None,
                      classify=apply_nvis_lookup,
                      metric: str = "planar"):
    """raw polygon Dataset -> (prepped parts Dataset, per-class summary
    Dataset).  Both are lazy; the summary costs one small groupby over the
    bbox/area columns already present on the prepped rows.  ``metric``
    as in :func:`explode_classify_subdivide`."""
    import ray.data.aggregate as agg

    prepped = raw_ds.map_batches(
        explode_classify_subdivide(max_vertices, max_extent, classify,
                                   metric=metric),
        batch_format="pyarrow")
    summary = (prepped
               .groupby("bal_number")
               .aggregate(agg.Count(alias_name="n_polygons"),
                          agg.Sum("area_m2", alias_name="total_area_m2"),
                          agg.Min("xmin", alias_name="xmin"),
                          agg.Min("ymin", alias_name="ymin"),
                          agg.Max("xmax", alias_name="xmax"),
                          agg.Max("ymax", alias_name="ymax")))
    return prepped, summary


def class_hull_pipeline(prepped_ds):
    """Per-class convex hull as a two-level partial/final reduce -- the
    geometry-flavoured textbook distributed aggregate (ST_ConvexHull +
    group-by role).  EXACT by the hull-merge property: the hull of a
    union of partial hulls equals the hull of all points, so partials
    shrink each block to its extreme points (<= O(block boundary)) and
    the final per-class pass sees only those.

    * **partial** -- each block gathers its polygons' exterior vertices
      per class and keeps ``convex_hull(..., keep_collinear=True)``
      (collinear survivors must reach the final pass to decide their
      own fate under float rounding);
    * **final** -- ONE ``groupby(bal_number)`` hulls the concatenated
      partial vertices (strict turns -> canonical minimal hull).

    Returns ``(bal_number, n_vertices, hull_area, geom)`` with ``geom``
    the hull ring as WKB.
    """
    from ..geo.geometry import convex_hull, hull_area
    from ..geo.wkb import polygon_to_wkb

    _HULL_SCHEMA = pa.schema([
        ("bal_number", pa.int64()), ("pts", pa.binary())])

    def partial_fn(batch: pa.Table) -> pa.Table:
        by_cls: dict[int, list[np.ndarray]] = {}
        for cls, wkb in zip(batch.column("bal_number").to_pylist(),
                            batch.column("geom").to_pylist()):
            g = from_wkb(wkb)
            for p in (g if isinstance(g, list) else [g]):
                by_cls.setdefault(int(cls), []).append(p.exterior[:-1])
        rows = {"bal_number": [], "pts": []}
        for cls, chunks in sorted(by_cls.items()):
            hull = convex_hull(np.concatenate(chunks), keep_collinear=True)
            rows["bal_number"].append(cls)
            rows["pts"].append(np.ascontiguousarray(
                hull, dtype=np.float64).tobytes())
        return pa.table({"bal_number": pa.array(rows["bal_number"],
                                                pa.int64()),
                         "pts": pa.array(rows["pts"], pa.binary())},
                        schema=_HULL_SCHEMA)

    def final_fn(group: pa.Table) -> pa.Table:
        cls = int(group.column("bal_number")[0].as_py())
        pts = np.concatenate([
            np.frombuffer(b, np.float64).reshape(-1, 2)
            for b in group.column("pts").to_pylist()])
        hull = convex_hull(pts)
        area = hull_area(hull)
        wkb = polygon_to_wkb(Polygon(np.vstack([hull, hull[:1]])))
        return pa.table({
            "bal_number": pa.array([cls], pa.int64()),
            "n_vertices": pa.array([len(hull)], pa.int64()),
            "hull_area": pa.array([area], pa.float64()),
            "geom": pa.array([wkb], pa.binary())})

    return (prepped_ds
            .map_batches(partial_fn, batch_format="pyarrow")
            .groupby("bal_number")
            .map_groups(final_fn, batch_format="pyarrow"))
