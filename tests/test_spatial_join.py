"""Spatial join (broadcast + partitioned) and zonal stats vs single-process
oracles."""

import numpy as np
import pyarrow as pa
import pytest
from numpy.testing import assert_allclose

from balrog_ray.geo.geometry import polygon_distance
from balrog_ray.geo.wkb import from_wkb
from balrog_ray.stages import spatial_join as sj
from balrog_ray.stages.halo import GridSpec
from balrog_ray.stages.zonal import (OUT_OF_AREA as ZONAL_OOA,
                                     circular_median, zonal_stats)
from balrog_ray.core.kernels import slope_aspect
from balrog_ray.tiles import synth

CFG = synth.SynthConfig(tiles_x=4, tiles_y=4, tile_px=64)
SPEC = GridSpec.from_synth(CFG)
MAX_DIST = 100.0


def oracle_join(sites, veg):
    """Brute-force reference: PIP (lowest gid wins) + exact nearest within
    MAX_DIST (lowest gid on ties), incl. azimuth to the nearest point."""
    from balrog_ray.geo.geometry import azimuth_deg

    polys = [from_wkb(w) for w in veg.column("geom").to_pylist()]
    gids = veg.column("gid").to_pylist()
    classes = veg.column("bal_number").to_pylist()
    rows = []
    for r in sites.to_pylist():
        pt = np.array([[r["x"], r["y"]]])
        in_gid, in_cls = -1, -1
        best = (np.inf, -1, -1, None)
        for gid, cls, poly in zip(gids, classes, polys):
            d, nearest, inside = polygon_distance(pt, poly)
            if inside[0] and in_gid < 0:
                in_gid, in_cls = gid, cls
            if d[0] < best[0]:
                best = (float(d[0]), gid, cls, nearest[0])
        if best[0] <= MAX_DIST:
            az = 0.0 if best[0] == 0.0 else \
                float(azimuth_deg(pt, best[3][None, :])[0])
            near = (best[0], best[1], best[2], az)
        else:
            near = (sj.OUT_OF_AREA, -1, -1, sj.OUT_OF_AREA)
        rows.append({"site_id": r["site_id"], "in_gid": in_gid,
                     "in_bal_number": in_cls, "near_gid": near[1],
                     "near_bal_number": near[2], "distance_m": near[0],
                     "azimuth_deg": near[3]})
    return {r["site_id"]: r for r in rows}


@pytest.fixture(scope="module")
def world():
    return synth.sites_table(CFG, n=48), synth.veg_polygon_table(CFG)


def check_against_oracle(result_rows, oracle):
    assert len(result_rows) == len(oracle)
    for r in result_rows:
        o = oracle[r["site_id"]]
        assert r["in_gid"] == o["in_gid"], r["site_id"]
        assert r["in_bal_number"] == o["in_bal_number"]
        assert r["near_gid"] == o["near_gid"], r["site_id"]
        assert r["near_bal_number"] == o["near_bal_number"]
        assert np.isclose(r["distance_m"], o["distance_m"], atol=1e-9)
        assert np.isclose(r["azimuth_deg"], o["azimuth_deg"], atol=1e-9)


def test_broadcast_join_matches_oracle(ray_session, world):
    import ray.data

    sites, veg = world
    got = sj.broadcast_spatial_join(ray.data.from_arrow(sites), veg,
                                    max_dist=MAX_DIST).take_all()
    check_against_oracle(got, oracle_join(sites, veg))


def test_partitioned_join_matches_oracle(ray_session, world):
    import ray.data

    sites, veg = world
    got = sj.partitioned_spatial_join(
        ray.data.from_arrow(sites), veg, CFG.grid, max_dist=MAX_DIST,
        hot_cell_threshold=3, n_salt=2).take_all()
    check_against_oracle(got, oracle_join(sites, veg))


def test_partitioned_join_with_forced_subdivision(ray_session, world):
    """subdivide_cover=1 forces every multi-cell polygon through the op-33
    subdivision before cell expansion (the shuffle-volume bound) -- results
    must still match the brute-force oracle exactly."""
    import ray.data

    sites, veg = world
    got = sj.partitioned_spatial_join(
        ray.data.from_arrow(sites), veg, CFG.grid, max_dist=MAX_DIST,
        hot_cell_threshold=3, n_salt=2, subdivide_cover=1,
        subdivide_vertices=4).take_all()
    check_against_oracle(got, oracle_join(sites, veg))


def test_broadcast_join_multipolygon_parts(ray_session):
    """A MultiPolygon WKB row must behave as the union of its parts (the
    _PolyIndex explode path): containment in any part wins, nearest
    distance is the min over parts."""
    import ray.data

    from balrog_ray.geo.geometry import Polygon
    from balrog_ray.geo.wkb import multipolygon_to_wkb

    part_a = Polygon(np.array([[0.0, 0], [10, 0], [10, 10], [0, 10]]))
    part_b = Polygon(np.array([[50.0, 0], [60, 0], [60, 10], [50, 10]]))
    veg = pa.table({
        "gid": pa.array([7], pa.int64()),
        "bal_number": pa.array([3], pa.int16()),
        "geom": pa.array([multipolygon_to_wkb([part_a, part_b])],
                         pa.binary())})
    sites = pa.table({
        "site_id": pa.array(["inside_a", "inside_b", "between", "far"]),
        "x": pa.array([5.0, 55.0, 30.0, 500.0], pa.float64()),
        "y": pa.array([5.0, 5.0, 5.0, 500.0], pa.float64())})
    got = {r["site_id"]: r for r in sj.broadcast_spatial_join(
        ray.data.from_arrow(sites), veg, max_dist=MAX_DIST).take_all()}
    assert got["inside_a"]["in_gid"] == 7 and got["inside_b"]["in_gid"] == 7
    assert got["between"]["in_gid"] == -1
    assert got["between"]["near_gid"] == 7
    # nearest part is part_a's east edge (x=10) or part_b's west (x=50): 20 m
    assert np.isclose(got["between"]["distance_m"], 20.0)
    assert got["far"]["near_gid"] == -1
    assert got["far"]["distance_m"] == sj.OUT_OF_AREA


def test_polygons_to_cells_cover(world):
    _, veg = world
    cover = sj.polygons_to_cells(veg, CFG.grid)
    gids = set(cover.column("gid").to_pylist())
    assert gids == set(veg.column("gid").to_pylist())
    # the skew polygon (gid 1) spans many cells
    per_gid = {}
    for g, c in zip(cover.column("gid").to_pylist(),
                    cover.column("cell_id").to_pylist()):
        per_gid.setdefault(g, set()).add(c)
    assert len(per_gid[1]) >= 4
    assert max(len(v) for v in per_gid.values()) <= 16


def test_buffer_intersection_areas(ray_session):
    """Buffer-clip report (SURVEY op 39, xx_fiona_testing.py:155-170):
    exact area when the buffer is fully inside one polygon; rasterized
    estimate parity for partial overlaps."""
    import ray.data

    from balrog_ray.geo.geometry import Polygon, rasterize
    from balrog_ray.geo.wkb import from_wkb

    sites, veg = synth.sites_table(CFG, n=24), synth.veg_polygon_table(CFG)
    radius, n_seg = 150.0, 64
    rows = sj.buffer_intersection_areas(
        ray.data.from_arrow(sites), veg, radius=radius,
        n_seg=n_seg).take_all()
    assert rows
    ngon_area = 0.5 * n_seg * radius ** 2 * np.sin(2 * np.pi / n_seg)

    polys = [from_wkb(w) for w in veg.column("geom").to_pylist()]
    classes = veg.column("bal_number").to_pylist()
    def _area(w):
        g = from_wkb(w)
        return sum(p.area for p in g) if isinstance(g, list) else g.area

    areas = {g: _area(w) for g, w in zip(veg.column("gid").to_pylist(),
                                         veg.column("geom").to_pylist())}
    by_site = {}
    for r in rows:
        by_site.setdefault(r["site_id"], {})
        cls_tot = by_site[r["site_id"]]
        cls_tot[r["bal_number"]] = cls_tot.get(r["bal_number"], 0.0) \
            + r["clip_area_m2"]
        # each per-polygon clip is bounded by BOTH the buffer and the poly
        assert 0 < r["clip_area_m2"] <= ngon_area + 1e-6
        assert r["clip_area_m2"] <= areas[r["gid"]] + 1e-6

    site_xy = {r["site_id"]: (r["x"], r["y"]) for r in sites.to_pylist()}
    checked = 0
    for sid, per_class in list(by_site.items())[:8]:
        x, y = site_xy[sid]
        # rasterized oracle at 1 m pixels over the buffer bbox
        n = int(2 * radius) + 4
        x0, y0 = x - radius - 2, y + radius + 2
        ang = np.linspace(0, 2 * np.pi, n_seg, endpoint=False)
        from balrog_ray.geo.geometry import Polygon
        buf = Polygon(np.column_stack([x + radius * np.cos(ang),
                                       y + radius * np.sin(ang)]))
        bmask = rasterize([buf], [1.0], x0, y0, 1.0, n, n, fill=0.0) == 1.0
        for cls in set(classes):
            cls_polys = [p for p, c in zip(polys, classes) if c == cls]
            vmask = np.zeros((n, n), dtype=bool)
            for p in cls_polys:
                vmask |= rasterize([p], [1.0], x0, y0, 1.0, n, n,
                                   fill=0.0) == 1.0
            est = float((bmask & vmask).sum())
            got = per_class.get(cls, 0.0)
            # per-polygon rows double-count class-internal overlap; the
            # raster estimate dissolves it -- got must cover est (minus
            # raster discretization slack) and be zero only when est is
            assert got >= est - 0.02 * ngon_area - 40.0, (sid, cls)
            if got == 0.0:
                assert est < 0.02 * ngon_area + 40.0, (sid, cls)
        checked += 1
    assert checked


def test_geodesic_helpers():
    from balrog_ray.geo import geodesic as gd

    # 1 degree of latitude ~ 111.2 km on the sphere
    d = gd.haversine_m(0.0, 0.0, 0.0, 1.0)
    assert abs(d - 111195) < 100
    # due-east bearing at the equator
    assert np.isclose(gd.sphere_azimuth_deg(0, 0, 1, 0), 90.0)
    # buffer vertices sit at the exact great-circle radius
    buf = gd.geodesic_point_buffer(115.8, -31.9, 5000.0, n_seg=16)
    ring = buf.exterior[:-1]
    dd = gd.haversine_m(115.8, -31.9, ring[:, 0], ring[:, 1])
    assert np.allclose(dd, 5000.0, rtol=1e-6)
    # local frame round-trips small offsets
    xy = gd.local_meter_frame([115.81, 115.8], [-31.9, -31.89],
                              115.8, -31.9)
    assert abs(xy[0, 0] - gd.haversine_m(115.8, -31.9, 115.81, -31.9)) < 2
    assert abs(xy[1, 1] - gd.haversine_m(115.8, -31.9, 115.8, -31.89)) < 2


def test_circular_median():
    assert circular_median(np.array([10.0, 350.0, 5.0])) == pytest.approx(5.0)
    assert circular_median(np.array([100.0, 120.0, 140.0])) == 120.0
    assert circular_median(np.array([])) == sj.OUT_OF_AREA


def test_zonal_stats_matches_oracle(ray_session, world):
    import ray.data

    sites, _ = world
    dem_tiles = synth.tiles_table(CFG, layers=("dem",))
    got = {r["site_id"]: r for r in
           zonal_stats(ray.data.from_arrow(sites), dem_tiles, SPEC,
                       buffer_m=100.0).take_all()}
    # single-process oracle over the same decoded mosaic
    dem, _ = synth.global_arrays(CFG)
    slope, aspect = slope_aspect(dem, CFG.pixel_size, CFG.pixel_size)
    ps = CFG.pixel_size
    for r in sites.to_pylist():
        res = got[r["site_id"]]
        col, row = r["x"] / ps, (CFG.y_north - r["y"]) / ps
        r_px = 100.0 / ps
        c0, c1 = int(np.floor(col - r_px)), int(np.ceil(col + r_px)) + 1
        r0, r1 = int(np.floor(row - r_px)), int(np.ceil(row + r_px)) + 1
        c0c, c1c = max(0, c0), min(slope.shape[1], c1)
        r0c, r1c = max(0, r0), min(slope.shape[0], r1)
        vals = np.empty(0)
        if c0c < c1c and r0c < r1c:
            cc = (np.arange(c0c, c1c) + 0.5) - col
            rr = (np.arange(r0c, r1c) + 0.5) - row
            gx, gy = np.meshgrid(cc, rr)
            m = (gx * gx + gy * gy <= r_px * r_px) \
                & (slope[r0c:r1c, c0c:c1c] != -99.0)
            vals = slope[r0c:r1c, c0c:c1c][m]
        if len(vals) == 0:
            assert res["pixel_count"] == 0
            assert res["slope_avg"] == ZONAL_OOA
        else:
            assert res["pixel_count"] == len(vals)
            assert_allclose(res["slope_avg"], vals.mean(), rtol=1e-5, atol=1e-5)
            assert_allclose(res["slope_med"], np.median(vals), rtol=1e-5, atol=1e-5)
            assert_allclose(res["slope_std"], vals.std(), rtol=1e-4, atol=1e-5)


def test_asof_join_semantics(ray_session):
    """Tie-break = greatest payload at the latest ts; lefts before any
    right are dropped (inner as-of)."""
    import pyarrow as pa
    import ray.data

    from balrog_ray.stages.asof import asof_join

    left = pa.table({
        "k": pa.array([1, 1, 1, 2, 3], pa.int64()),
        "t": pa.array([5, 10, 2, 7, 9], pa.int64()),
        "lid": pa.array([100, 101, 102, 103, 104], pa.int64())})
    right = pa.table({
        "k": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "t": pa.array([3, 5, 5, 8, 9], pa.int64()),
        "rid": pa.array([7, 8, 9, 6, 5], pa.int64())})
    out = asof_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                    left_key="k", right_key="k", left_ts="t", right_ts="t",
                    right_payload=["rid"]).take_all()
    got = {r["lid"]: r["rid"] for r in out}
    # lid=100 (t=5): rights at t<=5 are {3:7, 5:8, 5:9} -> tie at t=5 -> 9
    # lid=101 (t=10): latest right t=8 -> 6
    # lid=102 (t=2): no right at or before -> dropped
    # lid=103 (k=2, t=7): right t=9 is later -> dropped
    # lid=104 (k=3): no rights for key -> dropped
    assert got == {100: 9, 101: 6}


def test_geodesic_join_matches_bruteforce(ray_session):
    """Degree-CRS contract: lon/lat world around Sydney-ish latitudes;
    nearest point chosen in planar degrees (the reference's own
    composition), distance/azimuth great-circle metres."""
    import ray.data

    from balrog_ray.geo.geodesic import haversine_m, sphere_azimuth_deg
    from balrog_ray.geo.geometry import Polygon, polygon_distance
    from balrog_ray.geo.wkb import polygon_to_wkb

    rng = np.random.default_rng(8)
    lon0, lat0 = 150.0, -33.5
    polys, gids, classes = [], [], []
    for g in range(6):
        cx = lon0 + rng.uniform(-0.05, 0.05)
        cy = lat0 + rng.uniform(-0.05, 0.05)
        ang = np.sort(rng.uniform(0, 2 * np.pi, 6))
        rad = rng.uniform(0.004, 0.012)
        ring = np.column_stack([cx + rad * np.cos(ang),
                                cy + rad * np.sin(ang)])
        polys.append(Polygon(ring))
        gids.append(g)
        classes.append(int(rng.integers(1, 8)))
    veg = pa.table({
        "gid": pa.array(gids, pa.int64()),
        "bal_number": pa.array(classes, pa.int16()),
        "geom": pa.array([polygon_to_wkb(p) for p in polys], pa.binary())})
    n = 200
    sites = pa.table({
        "site_id": pa.array([f"g{i:04d}" for i in range(n)], pa.string()),
        "x": pa.array(lon0 + rng.uniform(-0.07, 0.07, n)),
        "y": pa.array(lat0 + rng.uniform(-0.07, 0.07, n))})
    max_m = 800.0

    got = {r["site_id"]: r for r in sj.broadcast_spatial_join(
        ray.data.from_arrow(sites), veg, max_dist=max_m,
        metric="geodesic_sphere").take_all()}

    n_in = n_near = 0
    for r in sites.to_pylist():
        pt = np.array([[r["x"], r["y"]]])
        in_gid = -1
        best = (np.inf, -1, None)
        for gid, poly in zip(gids, polys):
            d, nearest, inside = polygon_distance(pt, poly)
            if inside[0] and in_gid < 0:
                in_gid = gid
            if d[0] < best[0]:
                best = (float(d[0]), gid, nearest[0])
        o = got[r["site_id"]]
        assert o["in_gid"] == in_gid, r["site_id"]
        if best[0] == np.inf:
            assert o["near_gid"] == -1
            continue
        gd = 0.0 if best[0] == 0.0 else float(haversine_m(
            r["x"], r["y"], best[2][0], best[2][1]))
        if gd <= max_m:
            n_near += 1
            n_in += in_gid >= 0
            assert o["near_gid"] == best[1], r["site_id"]
            assert np.isclose(o["distance_m"], gd, atol=1e-6)
            if gd > 0:
                az = float(sphere_azimuth_deg(
                    r["x"], r["y"], best[2][0], best[2][1]))
                assert np.isclose(o["azimuth_deg"], az, atol=1e-6)
        else:
            assert o["near_gid"] == -1, r["site_id"]
    # the scenario exercises all three outcomes
    assert n_near > 10 and n_in > 1


def test_join_metric_validation():
    with pytest.raises(ValueError, match="metric"):
        sj.broadcast_spatial_join(None, None, metric="spherical")


def test_within_distance_join_matches_bruteforce(ray_session):
    """Range join (all polygons within max_dist) and k-NN join (k
    nearest) against a per-site brute-force polygon_distance sweep,
    planar metric, multipolygon parts collapsing to their gid."""
    import ray.data

    from balrog_ray.geo.geometry import Polygon, polygon_distance
    from balrog_ray.geo.wkb import multipolygon_to_wkb, polygon_to_wkb
    from balrog_ray.stages.spatial_join import within_distance_join

    rng = np.random.default_rng(17)
    polys, gids, classes, wkbs = [], [], [], []
    for g in range(8):
        cx, cy = rng.uniform(50, 950, 2)
        ang = np.sort(rng.uniform(0, 2 * np.pi, 7))
        rad = rng.uniform(30, 120)
        ring = np.column_stack([cx + rad * np.cos(ang),
                                cy + rad * np.sin(ang)])
        p = Polygon(ring)
        polys.append([p])
        gids.append(g)
        classes.append(int(rng.integers(1, 8)))
        wkbs.append(polygon_to_wkb(p))
    # one 2-part multipolygon: its parts must collapse to min distance
    pa_ = Polygon(np.array([[0.0, 0.0], [60, 0], [60, 60], [0, 60],
                            [0, 0]]))
    pb_ = Polygon(np.array([[900.0, 900], [980, 900], [980, 980],
                            [900, 980], [900, 900]]))
    polys.append([pa_, pb_])
    gids.append(8)
    classes.append(4)
    wkbs.append(multipolygon_to_wkb([pa_, pb_]))
    veg = pa.table({
        "gid": pa.array(gids, pa.int64()),
        "bal_number": pa.array(classes, pa.int16()),
        "geom": pa.array(wkbs, pa.binary())})
    n = 300
    sites = pa.table({
        "site_id": pa.array([f"s{i:04d}" for i in range(n)], pa.string()),
        "x": pa.array(rng.uniform(0, 1000, n)),
        "y": pa.array(rng.uniform(0, 1000, n))})
    max_m = 250.0

    def brute(k=None):
        want = {}
        for r in sites.to_pylist():
            pt = np.array([[r["x"], r["y"]]])
            rows = []
            for gid, parts in zip(gids, polys):
                best, inside = np.inf, False
                for p in parts:
                    d, _, ins = polygon_distance(pt, p)
                    dd = 0.0 if ins[0] else float(d[0])
                    if ins[0]:
                        inside = True
                    best = min(best, dd)
                if best <= max_m:
                    rows.append((best, gid, inside))
            rows.sort()
            if k is not None:
                rows = rows[:k]
            want[r["site_id"]] = {(g, round(d, 9), i)
                                  for d, g, i in rows}
        return want

    for k in (None, 2):
        got_rows = within_distance_join(
            ray.data.from_arrow(sites), veg, max_dist=max_m,
            k=k).take_all()
        got = {}
        for r in got_rows:
            got.setdefault(r["site_id"], set()).add(
                (r["gid"], round(r["distance_m"], 9), r["contains"]))
        want = brute(k)
        for sid_, w in want.items():
            assert got.get(sid_, set()) == w, (k, sid_, w,
                                               got.get(sid_))
        extra = set(got) - set(want)
        assert not any(got[s] for s in extra)


def test_partitioned_within_join_matches_broadcast(ray_session):
    """The cell-partitioned range / k-NN join must emit exactly the
    broadcast plan's pair set, including with forced salting and
    subdivision (low thresholds), for both range (k=None) and k-NN."""
    import ray.data

    from balrog_ray.geo.cells import CellGrid
    from balrog_ray.geo.geometry import Polygon
    from balrog_ray.geo.wkb import multipolygon_to_wkb, polygon_to_wkb
    from balrog_ray.stages.spatial_join import (partitioned_within_join,
                                                within_distance_join)

    rng = np.random.default_rng(23)
    gids, classes, wkbs = [], [], []
    for g in range(10):
        cx, cy = rng.uniform(50, 950, 2)
        ang = np.sort(rng.uniform(0, 2 * np.pi, 9))
        rad = rng.uniform(40, 150)
        ring = np.column_stack([cx + rad * np.cos(ang),
                                cy + rad * np.sin(ang)])
        gids.append(g)
        classes.append(int(rng.integers(1, 8)))
        wkbs.append(polygon_to_wkb(Polygon(ring)))
    # multipolygon whose parts straddle distinct cells
    p1 = Polygon(np.array([[10.0, 10], [120, 10], [120, 120], [10, 120],
                           [10, 10]]))
    p2 = Polygon(np.array([[800.0, 800], [950, 800], [950, 950],
                           [800, 950], [800, 800]]))
    gids.append(10)
    classes.append(5)
    wkbs.append(multipolygon_to_wkb([p1, p2]))
    veg = pa.table({
        "gid": pa.array(gids, pa.int64()),
        "bal_number": pa.array(classes, pa.int16()),
        "geom": pa.array(wkbs, pa.binary())})
    n = 250
    sites = pa.table({
        "site_id": pa.array([f"w{i:04d}" for i in range(n)], pa.string()),
        "x": pa.array(rng.uniform(-50, 1050, n)),   # some out-of-window
        "y": pa.array(rng.uniform(-50, 1050, n))})
    grid = CellGrid(x0=0.0, y0=1000.0, cell_size=200.0, nx=5, ny=5)

    def collect(ds):
        got = {}
        for r in ds.take_all():
            got.setdefault(r["site_id"], set()).add(
                (r["gid"], round(r["distance_m"], 9), r["contains"]))
        return got

    for k in (None, 3):
        want = collect(within_distance_join(
            ray.data.from_arrow(sites), veg, max_dist=180.0, k=k))
        got = collect(partitioned_within_join(
            ray.data.from_arrow(sites), veg, grid, max_dist=180.0, k=k,
            hot_cell_threshold=2, n_salt=3, subdivide_cover=1,
            subdivide_vertices=4))
        assert got == want, k
        assert sum(len(v) for v in want.values()) > 100


def test_within_distance_join_broadcast_gate(ray_session):
    """Past the broadcast gate the range join must route to the
    partitioned plan when a grid is supplied, and raise loudly when
    not."""
    import ray.data

    from balrog_ray.geo.cells import CellGrid
    from balrog_ray.geo.geometry import Polygon
    from balrog_ray.geo.wkb import polygon_to_wkb
    from balrog_ray.stages.spatial_join import within_distance_join

    veg = pa.table({
        "gid": pa.array([0, 1], pa.int64()),
        "bal_number": pa.array([3, 4], pa.int16()),
        "geom": pa.array([
            polygon_to_wkb(Polygon(np.array(
                [[0.0, 0], [100, 0], [100, 100], [0, 100], [0, 0]]))),
            polygon_to_wkb(Polygon(np.array(
                [[300.0, 300], [400, 300], [400, 400], [300, 400],
                 [300, 300]])))], pa.binary())})
    sites = pa.table({
        "site_id": pa.array(["a", "b"], pa.string()),
        "x": pa.array([50.0, 350.0]),
        "y": pa.array([50.0, 350.0])})
    grid = CellGrid(x0=0.0, y0=500.0, cell_size=250.0, nx=2, ny=2)

    with pytest.raises(RuntimeError, match="broadcast gate"):
        within_distance_join(ray.data.from_arrow(sites), veg,
                             max_dist=50.0, max_broadcast_polys=1)
    got = within_distance_join(
        ray.data.from_arrow(sites), veg, max_dist=50.0,
        max_broadcast_polys=1, grid=grid).take_all()
    assert {(r["site_id"], r["gid"], r["contains"]) for r in got} == {
        ("a", 0, True), ("b", 1, True)}
