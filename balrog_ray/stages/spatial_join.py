"""Spatial join of sites/tiles against vegetation polygons.

Two physical plans for the same logical join, mirroring the scale split the
reference handles with PostGIS GiST + fiona spatial filters
(``xx_fiona_testing.py:153-218``):

* **Broadcast** (:class:`VegJoinActor`): the polygon table is ``ray.put``
  once; every actor builds an STR-tree in ``__init__`` and probes batches in
  ``__call__`` -- the open-once-per-worker pattern of
  ``testing/02_get_slope_from_buffer.py:204-206``.  Right for dimension-
  sized polygon sets (the common case: polygons are tiny next to 10^12
  tiles).
* **Partitioned** (:func:`partitioned_spatial_join`): polygons are
  flat-mapped to every grid cell they (padded) intersect, probes keyed by
  their cell, one ``groupby(cell)`` co-locates both sides, and a per-group
  STR-tree joins locally.  Hot cells are salted: probes spread across
  ``n_salt`` sub-keys and the cell's polygons are replicated per salt --
  the ``st_subdivide`` + per-class-process skew handling of the reference
  (``03_explode_multipolygons_and_classify.sql:66-80``) done as keyspace
  surgery instead.

Join outputs: per-site containment (gid, bal_number) plus nearest polygon
within ``max_dist`` (gid, distance, azimuth) -- the reference's
point-in-polygon + distance-to-vegetation semantics
(``xx_fiona_testing.py:205-218``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geo.geometry import azimuth_deg
from ..geo.strtree import STRtree
from ..geo.wkb import from_wkb

OUT_OF_AREA = -9999.0

JOIN_SCHEMA = pa.schema([
    ("site_id", pa.string()),
    ("x", pa.float64()),
    ("y", pa.float64()),
    ("in_gid", pa.int64()),          # containing polygon gid, -1 if none
    ("in_bal_number", pa.int16()),   # containing class, -1 if none
    ("near_gid", pa.int64()),        # nearest polygon within max_dist, -1
    ("near_bal_number", pa.int16()),
    ("distance_m", pa.float64()),    # 0 when inside; OUT_OF_AREA if none
    ("azimuth_deg", pa.float64()),
])


class _PolyIndex:
    """Decoded polygon set + STR-tree; built once, probed many times."""

    def __init__(self, veg_table: pa.Table):
        gids = veg_table.column("gid").to_numpy()
        classes = veg_table.column("bal_number").to_numpy()
        # sort by gid so row index order == gid order: winner selection
        # below tie-breaks on row index, and group/row order coming out of
        # a shuffle is NOT gid-sorted -- without this the partitioned plan
        # would be polygon-order-dependent
        order = np.argsort(gids, kind="stable")
        geoms = veg_table.column("geom").to_pylist()
        # MultiPolygon WKB decodes to a list of parts: explode, each part
        # carrying its row's gid/class (winner selection stays gid-correct
        # because parts of one gid are adjacent after the sort)
        polys, gid_out, cls_out = [], [], []
        for i in order:
            g = from_wkb(geoms[i])
            for p in (g if isinstance(g, list) else [g]):
                polys.append(p)
                gid_out.append(gids[i])
                cls_out.append(classes[i])
        self.polys = polys
        self.gids = np.asarray(gid_out, dtype=np.int64)
        self.classes = np.asarray(cls_out, dtype=np.int16)
        boxes = (np.stack([p.bbox for p in self.polys])
                 if self.polys else np.empty((0, 4)))
        self.tree = STRtree(boxes)
        # flattened "edge soup": every ring edge (exterior + holes) of every
        # polygon in contiguous per-polygon runs, so candidate refinement is
        # ONE vectorized pass over all (site, polygon) pairs instead of a
        # numpy-kernel call per polygon (the per-call fixed overhead was the
        # hot spot: ~15 pairs/call at bench density)
        a_parts, d_parts = [], []
        starts = np.zeros(len(polys) + 1, dtype=np.int64)
        for j, p in enumerate(polys):
            e = 0
            for ring in (p.exterior, *p.holes):
                a_parts.append(ring[:-1])
                d_parts.append(ring[1:] - ring[:-1])
                e += len(ring) - 1
            starts[j + 1] = starts[j] + e
        self.edge_starts = starts
        if a_parts:
            self.edge_a = np.concatenate(a_parts)
            self.edge_d = np.concatenate(d_parts)
            len2 = (self.edge_d * self.edge_d).sum(axis=1)
            len2[len2 == 0] = 1.0
            self.edge_len2 = len2
        else:
            self.edge_a = np.empty((0, 2))
            self.edge_d = np.empty((0, 2))
            self.edge_len2 = np.empty(0)

    def join_points(self, site_id, x, y, max_dist: float,
                    metric: str = "planar") -> pa.Table:
        """Vectorized candidate refinement: the (site, polygon) candidate
        pairs from the STR-tree are grouped BY POLYGON, so the exact
        point-in-polygon / distance kernels run once per polygon over an
        array of sites instead of once per pair (the per-site scalar loop
        was the hot spot at 200k+ sites/batch).  Winner selection follows
        the scalar semantics exactly: lowest gid among minimum-distance
        candidates; lowest gid among containing polygons.

        ``metric="geodesic_sphere"`` is the EPSG:4283 degree-CRS contract
        (``geo/geodesic.py``): coordinates are lon/lat degrees and
        ``max_dist`` is METERS.  Faithful to the reference's own
        composition (planar shapely ``nearest_points`` in degree space,
        then geodesic distance/azimuth -- ``xx_fiona_testing.py:205-218``):
        the nearest point and winner are chosen in planar degree space
        (anisotropic by cos(lat), exactly like the reference), then the
        reported distance is great-circle meters and the winner is kept
        only if it is within ``max_dist`` meters.

        ``metric="geodesic_wgs84"`` is identical except distance/azimuth
        come from the WGS84 ellipsoid (``geo/wgs84.py`` Vincenty), the
        numbers pyproj's ``Geod.inv`` reports -- closing the ~0.3%
        spherical bias against the reference's PostGIS/pyproj output."""
        geodesic = metric in ("geodesic_sphere", "geodesic_wgs84")
        if metric not in ("planar", "geodesic_sphere", "geodesic_wgs84"):
            raise ValueError(
                "metric must be planar|geodesic_sphere|geodesic_wgs84, "
                f"got {metric!r}")
        n = len(x)
        in_gid = np.full(n, -1, dtype=np.int64)
        in_cls = np.full(n, -1, dtype=np.int16)
        near_gid = np.full(n, -1, dtype=np.int64)
        near_cls = np.full(n, -1, dtype=np.int16)
        dist = np.full(n, OUT_OF_AREA, dtype=np.float64)
        azim = np.full(n, OUT_OF_AREA, dtype=np.float64)

        xs = np.asarray(x, dtype=np.float64)
        ys = np.asarray(y, dtype=np.float64)
        if geodesic:
            # conservative degree pad: meters -> degrees with 5% slack,
            # lon widened by 1/cos(lat)
            pad_lat = max_dist / 111320.0 * 1.05
            pad_lon = pad_lat / np.maximum(
                np.cos(np.deg2rad(np.abs(ys))), 0.01)
            qboxes = np.column_stack([xs - pad_lon, ys - pad_lat,
                                      xs + pad_lon, ys + pad_lat])
        else:
            qboxes = np.column_stack([xs - max_dist, ys - max_dist,
                                      xs + max_dist, ys + max_dist])
        I, J = self.tree.query_many(qboxes)
        if len(I) and not geodesic:
            # exact bbox-distance prune: the tree's padded-box test admits
            # corner pairs up to sqrt(2)*max_dist away; any pair with bbox
            # distance > max_dist can neither contain the site (it is
            # outside the bbox) nor beat an accepted nearest winner (true
            # distance >= bbox distance > max_dist)
            bb = self.tree.boxes[J]
            dx = np.maximum(np.maximum(bb[:, 0] - xs[I], 0.0), xs[I] - bb[:, 2])
            dy = np.maximum(np.maximum(bb[:, 1] - ys[I], 0.0), ys[I] - bb[:, 3])
            keep = dx * dx + dy * dy <= max_dist * max_dist
            I, J = I[keep], J[keep]
        if len(I):
            pts = np.column_stack([xs, ys])
            # expand every candidate pair to its polygon's edge rows:
            # (pair p, edge e of poly J[p]); segments are contiguous per
            # pair, so reduceat / first-of-run reductions replace any
            # per-polygon loop
            counts = self.edge_starts[J + 1] - self.edge_starts[J]
            nr = int(counts.sum())
            pair_ptr = np.concatenate([[0], np.cumsum(counts)])
            pair_of_row = np.repeat(np.arange(len(I)), counts)
            row_local = np.arange(nr) - np.repeat(pair_ptr[:-1], counts)
            e_idx = np.repeat(self.edge_starts[J], counts) + row_local
            P = pts[I][pair_of_row]                     # (R, 2)
            A = self.edge_a[e_idx]
            Dd = self.edge_d[e_idx]
            # nearest point on each edge segment (same kernel as
            # geometry._seg_nearest, flattened across polygons)
            t = np.clip(((P - A) * Dd).sum(axis=1) / self.edge_len2[e_idx],
                        0.0, 1.0)
            proj = A + t[:, None] * Dd
            dvec = P - proj
            dist2 = (dvec * dvec).sum(axis=1)
            # min edge per pair (segments are contiguous): reduceat min,
            # then first row matching the min per segment -- O(R), no sort;
            # tie -> first edge (deterministic)
            minv = np.minimum.reduceat(dist2, pair_ptr[:-1])
            eq_rows = np.flatnonzero(dist2 == minv[pair_of_row])
            pair_eq = pair_of_row[eq_rows]
            first = np.concatenate(
                [[True], pair_eq[1:] != pair_eq[:-1]])
            wrow = eq_rows[first]                       # one row per pair
            D = np.sqrt(dist2[wrow])
            NEAR = proj[wrow]
            # containment: even-odd crossing count over ALL rings (holes
            # included) -- identical semantics to geometry.ring_contains
            # (half-open convention), summed per pair with reduceat
            py, px = P[:, 1], P[:, 0]
            y0 = A[:, 1]
            y1 = A[:, 1] + Dd[:, 1]
            crosses = (y0 > py) != (y1 > py)
            with np.errstate(divide="ignore", invalid="ignore"):
                xin = A[:, 0] + (py - y0) * Dd[:, 0] / Dd[:, 1]
            hits = crosses & (px < xin)
            INS = (np.add.reduceat(hits, pair_ptr[:-1]) % 2).astype(bool)
            D = np.where(INS, 0.0, D)
            NEAR = np.where(INS[:, None], pts[I], NEAR)

            # containing polygon: lowest gid (== lowest j) per site
            if INS.any():
                ii, jj = I[INS], J[INS]
                first = np.lexsort((jj, ii))
                keep = np.concatenate([[True], ii[first][1:] != ii[first][:-1]])
                win = first[keep]
                in_gid[ii[win]] = self.gids[jj[win]]
                in_cls[ii[win]] = self.classes[jj[win]]

            # nearest polygon: min distance, tie -> lowest gid (winner
            # chosen in coordinate space -- planar degrees when geodesic,
            # matching the reference's nearest_points-in-degrees)
            first = np.lexsort((J, D, I))
            keep = np.concatenate([[True], I[first][1:] != I[first][:-1]])
            win = first[keep]
            if geodesic:
                p0 = pts[I[win]]
                if metric == "geodesic_wgs84":
                    from ..geo.wgs84 import wgs84_inverse

                    gd_all, az_all, _ = wgs84_inverse(
                        p0[:, 0], p0[:, 1],
                        NEAR[win][:, 0], NEAR[win][:, 1])
                else:
                    from ..geo.geodesic import (haversine_m,
                                                sphere_azimuth_deg)

                    gd_all = haversine_m(p0[:, 0], p0[:, 1],
                                         NEAR[win][:, 0], NEAR[win][:, 1])
                    az_all = None
                gd = np.where(D[win] == 0.0, 0.0, gd_all)
                ok = gd <= max_dist
                win, gd = win[ok], gd[ok]
                wi, wj, wd = I[win], J[win], gd
                if az_all is not None:
                    az = np.asarray(az_all)[ok]
                else:
                    az = sphere_azimuth_deg(pts[wi][:, 0], pts[wi][:, 1],
                                            NEAR[win][:, 0],
                                            NEAR[win][:, 1])
            else:
                ok = D[win] <= max_dist
                win = win[ok]
                wi, wj, wd = I[win], J[win], D[win]
                az = azimuth_deg(pts[wi], NEAR[win])
            near_gid[wi] = self.gids[wj]
            near_cls[wi] = self.classes[wj]
            dist[wi] = wd
            azim[wi] = np.where(wd == 0.0, 0.0, az)
        return pa.table({
            "site_id": site_id, "x": x, "y": y,
            "in_gid": in_gid, "in_bal_number": in_cls,
            "near_gid": near_gid, "near_bal_number": near_cls,
            "distance_m": dist, "azimuth_deg": azim,
        }, schema=JOIN_SCHEMA)


PAIRS_SCHEMA = pa.schema([
    ("site_id", pa.string()),
    ("gid", pa.int64()),
    ("bal_number", pa.int16()),
    ("distance_m", pa.float64()),
    ("contains", pa.bool_()),
])


def _pairs_within(idx: "_PolyIndex", site_id, x, y, max_dist: float,
                  metric: str = "planar",
                  k: int | None = None) -> pa.Table:
    """RANGE / k-NN generalization of :meth:`_PolyIndex.join_points`:
    ONE ROW PER (site, polygon) pair within ``max_dist`` -- or, with
    ``k``, each site's k nearest polygons (distance ties: lowest gid)
    -- with ``distance_m`` (0 inside) and a ``contains`` flag.  Shares
    the join_points candidate kernel (STR-tree query, per-pair min
    edge distance, even-odd containment); multipolygon parts collapse
    to their gid's minimum distance before selection."""
    geodesic = metric in ("geodesic_sphere", "geodesic_wgs84")
    if metric not in ("planar", "geodesic_sphere", "geodesic_wgs84"):
        raise ValueError(
            "metric must be planar|geodesic_sphere|geodesic_wgs84, "
            f"got {metric!r}")
    empty = pa.table({
        "site_id": pa.array([], pa.string()),
        "gid": pa.array([], pa.int64()),
        "bal_number": pa.array([], pa.int16()),
        "distance_m": pa.array([], pa.float64()),
        "contains": pa.array([], pa.bool_())}, schema=PAIRS_SCHEMA)
    xs = np.asarray(x, dtype=np.float64)
    ys = np.asarray(y, dtype=np.float64)
    if len(xs) == 0:
        return empty
    if geodesic:
        pad_lat = max_dist / 111320.0 * 1.05
        pad_lon = pad_lat / np.maximum(
            np.cos(np.deg2rad(np.abs(ys))), 0.01)
        qboxes = np.column_stack([xs - pad_lon, ys - pad_lat,
                                  xs + pad_lon, ys + pad_lat])
    else:
        qboxes = np.column_stack([xs - max_dist, ys - max_dist,
                                  xs + max_dist, ys + max_dist])
    I, J = idx.tree.query_many(qboxes)
    if len(I) and not geodesic:
        bb = idx.tree.boxes[J]
        dx = np.maximum(np.maximum(bb[:, 0] - xs[I], 0.0),
                        xs[I] - bb[:, 2])
        dy = np.maximum(np.maximum(bb[:, 1] - ys[I], 0.0),
                        ys[I] - bb[:, 3])
        keep = dx * dx + dy * dy <= max_dist * max_dist
        I, J = I[keep], J[keep]
    if len(I) == 0:
        return empty
    pts = np.column_stack([xs, ys])
    counts = idx.edge_starts[J + 1] - idx.edge_starts[J]
    nr = int(counts.sum())
    pair_ptr = np.concatenate([[0], np.cumsum(counts)])
    pair_of_row = np.repeat(np.arange(len(I)), counts)
    row_local = np.arange(nr) - np.repeat(pair_ptr[:-1], counts)
    e_idx = np.repeat(idx.edge_starts[J], counts) + row_local
    P = pts[I][pair_of_row]
    A = idx.edge_a[e_idx]
    Dd = idx.edge_d[e_idx]
    t = np.clip(((P - A) * Dd).sum(axis=1) / idx.edge_len2[e_idx],
                0.0, 1.0)
    proj = A + t[:, None] * Dd
    dvec = P - proj
    dist2 = (dvec * dvec).sum(axis=1)
    minv = np.minimum.reduceat(dist2, pair_ptr[:-1])
    eq_rows = np.flatnonzero(dist2 == minv[pair_of_row])
    pair_eq = pair_of_row[eq_rows]
    first = np.concatenate([[True], pair_eq[1:] != pair_eq[:-1]])
    wrow = eq_rows[first]
    D = np.sqrt(dist2[wrow])
    NEAR = proj[wrow]
    py, px = P[:, 1], P[:, 0]
    y0 = A[:, 1]
    y1 = A[:, 1] + Dd[:, 1]
    crosses = (y0 > py) != (y1 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xin = A[:, 0] + (py - y0) * Dd[:, 0] / Dd[:, 1]
    hits = crosses & (px < xin)
    INS = (np.add.reduceat(hits, pair_ptr[:-1]) % 2).astype(bool)
    D = np.where(INS, 0.0, D)
    NEAR = np.where(INS[:, None], pts[I], NEAR)

    # collapse exploded multipolygon parts: min distance per
    # (site, gid); containment wins over proximity
    G = idx.gids[J]
    order = np.lexsort((~INS, D, G, I))
    I, G, D, INS, NEAR = (I[order], G[order], D[order], INS[order],
                          NEAR[order])
    J = J[order]
    firstg = np.concatenate(
        [[True], (I[1:] != I[:-1]) | (G[1:] != G[:-1])])
    I, G, D, INS, NEAR, J = (I[firstg], G[firstg], D[firstg],
                             INS[firstg], NEAR[firstg], J[firstg])

    if geodesic:
        p0 = pts[I]
        if metric == "geodesic_wgs84":
            from ..geo.wgs84 import wgs84_inverse

            gd, _, _ = wgs84_inverse(p0[:, 0], p0[:, 1],
                                     NEAR[:, 0], NEAR[:, 1])
        else:
            from ..geo.geodesic import haversine_m

            gd = haversine_m(p0[:, 0], p0[:, 1],
                             NEAR[:, 0], NEAR[:, 1])
        D = np.where(INS, 0.0, gd)
    keep = D <= max_dist
    I, G, D, INS, J = I[keep], G[keep], D[keep], INS[keep], J[keep]
    if k is not None and len(I):
        order = np.lexsort((G, D, I))
        I, G, D, INS, J = (I[order], G[order], D[order], INS[order],
                           J[order])
        starts = np.flatnonzero(np.r_[True, I[1:] != I[:-1]])
        rank = np.arange(len(I)) - np.repeat(starts,
                                             np.diff(np.r_[starts,
                                                           len(I)]))
        keep = rank < k
        I, G, D, INS, J = I[keep], G[keep], D[keep], INS[keep], J[keep]
    sid_arr = (site_id if isinstance(site_id, (pa.Array,
                                               pa.ChunkedArray))
               else pa.array(site_id))
    if isinstance(sid_arr, pa.ChunkedArray):
        sid_arr = sid_arr.combine_chunks()
    sid = sid_arr.take(pa.array(I, pa.int64()))
    return pa.table({
        "site_id": sid.cast(pa.string()),
        "gid": pa.array(G, pa.int64()),
        "bal_number": pa.array(idx.classes[J], pa.int16()),
        "distance_m": pa.array(D, pa.float64()),
        "contains": pa.array(INS)}, schema=PAIRS_SCHEMA)


class WithinJoinActor:
    """Actor-pool stage for the range / k-NN polygon join: polygons
    ride the object store once, the STR-tree is built per actor, each
    batch of sites emits its (site, polygon) pair rows."""

    def __init__(self, veg_ref, max_dist: float, metric: str = "planar",
                 k: int | None = None):
        import ray

        self.index = _PolyIndex(ray.get(veg_ref))
        self.max_dist = max_dist
        self.metric = metric
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _pairs_within(
            self.index, batch.column("site_id"),
            batch.column("x").to_numpy(), batch.column("y").to_numpy(),
            self.max_dist, metric=self.metric, k=self.k)


def within_distance_join(sites_ds, veg_table: pa.Table, *,
                         max_dist: float, k: int | None = None,
                         metric: str = "planar", concurrency=(1, 4),
                         batch_size: int = 4096, grid=None,
                         max_broadcast_polys: int = 500_000):
    """All (site, polygon) pairs within ``max_dist`` (the RANGE spatial
    join), or each site's ``k`` nearest polygons within ``max_dist`` --
    the k>1 / range generalization of :func:`broadcast_spatial_join`
    (the reference reports only the single nearest vegetation polygon,
    xx_fiona_testing.py:205-218; factor analysis wants the
    neighborhood).  Brute-force parity in tests/test_spatial_join.py.

    The broadcast is GATED at ``max_broadcast_polys`` rows (mirroring
    the single-nearest join's two-plan split): past the gate a
    continent-scale polygon table would pin every actor's heap, so the
    join routes to :func:`partitioned_within_join` when a planar
    ``grid`` is supplied, and raises loudly otherwise."""
    import ray

    if veg_table.num_rows > max_broadcast_polys:
        if grid is not None and metric == "planar":
            return partitioned_within_join(
                sites_ds, veg_table, grid, max_dist=max_dist, k=k)
        raise RuntimeError(
            f"within_distance_join: polygon table has "
            f"{veg_table.num_rows} rows, past the "
            f"{max_broadcast_polys}-row broadcast gate; pass a planar "
            "CellGrid via grid= to use the cell-partitioned plan "
            "(partitioned_within_join) instead of broadcasting an "
            "unbounded polygon table (geodesic metrics need a "
            "degree-space grid sized to the data)")
    veg_ref = ray.put(veg_table)
    return sites_ds.map_batches(
        WithinJoinActor,
        fn_constructor_args=(veg_ref, max_dist, metric, k),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


class VegJoinActor:
    """Actor-pool stage: ``map_batches(VegJoinActor, fn_constructor_args=
    (veg_ref, max_dist), concurrency=N)``.  The polygon table rides the
    object store once (``ray.put``) and the tree is built per actor."""

    def __init__(self, veg_ref, max_dist: float = 100.0,
                 metric: str = "planar"):
        import ray

        table = ray.get(veg_ref) if not isinstance(veg_ref, pa.Table) \
            else veg_ref
        self.index = _PolyIndex(table)
        self.max_dist = max_dist
        self.metric = metric

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.index.join_points(
            batch.column("site_id").to_pylist(),
            batch.column("x").to_numpy(),
            batch.column("y").to_numpy(), self.max_dist,
            metric=self.metric)


def broadcast_spatial_join(sites_ds, veg_table: pa.Table,
                           max_dist: float = 100.0, concurrency=(1, 4),
                           batch_size: int = 4096,
                           metric: str = "planar"):
    """The default plan: broadcast polygons, stream sites through an
    STR-tree actor pool.  ``metric="geodesic_sphere"`` activates the
    degree-CRS contract (lon/lat coordinates, max_dist in meters);
    ``metric="geodesic_wgs84"`` the same with WGS84-ellipsoid
    distances/azimuths -- see :meth:`_PolyIndex.join_points`."""
    import ray

    if metric not in ("planar", "geodesic_sphere", "geodesic_wgs84"):
        raise ValueError(
            "metric must be planar|geodesic_sphere|geodesic_wgs84, "
            f"got {metric!r}")
    veg_ref = ray.put(veg_table)
    return sites_ds.map_batches(
        VegJoinActor, fn_constructor_args=(veg_ref, max_dist, metric),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


AREAS_SCHEMA = pa.schema([
    ("site_id", pa.string()),
    ("gid", pa.int64()),
    ("bal_number", pa.int16()),
    ("clip_area_m2", pa.float64()),    # buffer ^ this polygon's overlap
])


class BufferClipActor:
    """Actor-pool stage: per-site circular buffer intersected with every
    candidate veg polygon, overlap area summed per class -- the reference's
    ``buffer.intersection(veg_geom)`` + per-class report
    (``xx_fiona_testing.py:155-170``) on the Greiner-Hormann kit.

    The buffer circle is a regular ``n_seg``-gon inscribed at the exact
    radius (documented approximation; raise ``n_seg`` for tighter areas).
    Geometry per (site, candidate) pair is inherently scalar work; the
    STR-tree bounds candidates and the actor pool spreads sites."""

    def __init__(self, veg_ref, radius: float = 100.0, n_seg: int = 32):
        import ray

        table = ray.get(veg_ref) if not isinstance(veg_ref, pa.Table) \
            else veg_ref
        self.index = _PolyIndex(table)
        self.radius = radius
        ang = np.linspace(0.0, 2 * np.pi, n_seg, endpoint=False)
        self.ring = np.column_stack([np.cos(ang), np.sin(ang)]) * radius

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..geo.geometry import Polygon
        from ..geo.boolean import intersection_area

        ids = batch.column("site_id").to_pylist()
        xs = batch.column("x").to_numpy()
        ys = batch.column("y").to_numpy()
        r = self.radius
        qboxes = np.column_stack([xs - r, ys - r, xs + r, ys + r])
        I, J = self.index.tree.query_many(qboxes)
        out = {"site_id": [], "gid": [], "bal_number": [],
               "clip_area_m2": []}
        for i in np.unique(I):
            buf = Polygon(self.ring + np.array([xs[i], ys[i]]))
            # one row per (site, veg polygon), like the reference's
            # per-polygon report -- same-class overlaps are NOT dissolved
            per_gid: dict[int, float] = {}
            for j in J[I == i]:
                # polygon first: intersection_area subtracts the FIRST
                # argument's holes (the buffer n-gon has none)
                a = intersection_area(self.index.polys[j], buf)
                if a > 0.0:       # multipolygon parts share a gid: sum
                    per_gid[int(j)] = per_gid.get(int(j), 0.0) + a
            by_gid: dict[int, tuple[int, float]] = {}
            for j, a in per_gid.items():
                g = int(self.index.gids[j])
                cls = int(self.index.classes[j])
                prev = by_gid.get(g, (cls, 0.0))
                by_gid[g] = (cls, prev[1] + a)
            for g in sorted(by_gid):
                cls, a = by_gid[g]
                out["site_id"].append(ids[int(i)])
                out["gid"].append(g)
                out["bal_number"].append(cls)
                out["clip_area_m2"].append(a)
        return pa.table(out, schema=AREAS_SCHEMA)


def buffer_intersection_areas(sites_ds, veg_table: pa.Table,
                              radius: float = 100.0, n_seg: int = 32,
                              concurrency=(1, 4), batch_size: int = 1024):
    """Broadcast plan for the per-site buffer-clip report (SURVEY op 39)."""
    import ray

    veg_ref = ray.put(veg_table)
    return sites_ds.map_batches(
        BufferClipActor, fn_constructor_args=(veg_ref, radius, n_seg),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def polygons_to_cells(veg_table: pa.Table, grid, pad: float = 0.0) -> pa.Table:
    """(gid, cell_id) cover rows: every grid cell a polygon's bbox
    (padded by ``pad``) intersects -- the tile-to-cell assignment side of
    the join parity check."""
    gids, cells = [], []
    for gid, wkb_bytes in zip(veg_table.column("gid").to_pylist(),
                              veg_table.column("geom").to_pylist()):
        poly = from_wkb(wkb_bytes)
        bb = poly.bbox
        for c in grid.cells_for_bbox(bb[0], bb[1], bb[2], bb[3], pad=pad):
            gids.append(gid)
            cells.append(int(c))
    return pa.table({"gid": pa.array(gids, pa.int64()),
                     "cell_id": pa.array(cells, pa.int64())})


def partitioned_spatial_join(sites_ds, veg_table, grid,
                             max_dist: float = 100.0,
                             hot_cell_threshold: int = 64,
                             n_salt: int = 4,
                             subdivide_cover: int = 4,
                             subdivide_vertices: int = 64):
    """Shuffle-join plan for polygon sets too big to broadcast.

    Polygons are expanded to the padded cells they cover (so any probe
    within ``max_dist`` of a polygon shares a key with it); sites take
    their nearest in-window cell (clamped, so just-outside probes still
    meet boundary polygons).  Cells whose polygon count exceeds
    ``hot_cell_threshold`` are salted: sites hash into ``n_salt`` sub-keys,
    polygons replicate to all.  Both the cover-count pass and the polygon
    expansion run as Ray stages over the polygon Dataset -- nothing
    polygon-sized is materialised on the driver (only the per-cell count
    table, O(#cells), comes back to plan the salting).

    Hole-free polygons covering more than ``subdivide_cover`` padded cells
    AND carrying more than ``subdivide_vertices`` vertices are subdivided
    (op 33) to ~cell extent BEFORE expansion, so shuffle volume per
    polygon is bounded by O(area / cell_area) small parts, not
    O(full WKB x cells covered).  The vertex gate matters: replicating a
    5-vertex polygon whole is cheaper than probing many cut parts
    (measured 3x at bench scale), while a 10k-vertex coastline x 100
    cells is exactly the replication blow-up the cut bounds.  Join results
    are unchanged: parts tile the polygon exactly, so containment is
    part-containment and an outside probe's distance to the nearest part
    boundary equals its distance to the original boundary (any path to an
    interior cut edge crosses the true boundary first).
    """
    tagged = _tagged_union(sites_ds, veg_table, grid, max_dist,
                           hot_cell_threshold, n_salt, subdivide_cover,
                           subdivide_vertices)

    def join_group(group: pa.Table) -> pa.Table:
        polys, sites = _split_group(group)
        if sites.num_rows == 0:
            return pa.table({n: [] for n in JOIN_SCHEMA.names},
                            schema=JOIN_SCHEMA)
        index = _PolyIndex(polys)
        return index.join_points(sites.column("site_id").to_pylist(),
                                 sites.column("x").to_numpy(),
                                 sites.column("y").to_numpy(), max_dist)

    return (tagged.groupby("key")
            .map_groups(join_group, batch_format="pyarrow"))


def partitioned_within_join(sites_ds, veg_table, grid, *,
                            max_dist: float, k: int | None = None,
                            hot_cell_threshold: int = 64,
                            n_salt: int = 4,
                            subdivide_cover: int = 4,
                            subdivide_vertices: int = 64):
    """Shuffle-join plan for the RANGE / k-NN polygon join (the
    :func:`within_distance_join` semantics past its broadcast gate):
    same cell-keyed exchange, salting and subdivision as
    :func:`partitioned_spatial_join`, with the per-group kernel
    emitting one PAIRS_SCHEMA row per (site, polygon) pair within
    ``max_dist`` (or each site's ``k`` nearest).

    Correctness under the partitioning: every polygon within
    ``max_dist`` of a site shares the site's (padded-cover) cell key,
    and each site rides exactly ONE key, so the union of per-group pair
    sets is exactly the global pair set -- no duplicate pairs, and the
    per-site ``k`` selection sees the complete candidate set.
    Multipolygon parts and subdivision pieces of one gid collapse to
    the gid's minimum distance inside ``_pairs_within``; pieces absent
    from the group are farther than ``max_dist`` and cannot change it.
    Planar metric only (the cell grid is planar)."""
    tagged = _tagged_union(sites_ds, veg_table, grid, max_dist,
                           hot_cell_threshold, n_salt, subdivide_cover,
                           subdivide_vertices)

    def join_group(group: pa.Table) -> pa.Table:
        polys, sites = _split_group(group)
        if sites.num_rows == 0:
            return pa.table({n: [] for n in PAIRS_SCHEMA.names},
                            schema=PAIRS_SCHEMA)
        index = _PolyIndex(polys)
        return _pairs_within(
            index, sites.column("site_id"),
            sites.column("x").to_numpy(),
            sites.column("y").to_numpy(), max_dist, k=k)

    return (tagged.groupby("key")
            .map_groups(join_group, batch_format="pyarrow"))


def _split_group(group: pa.Table) -> tuple[pa.Table, pa.Table]:
    """One shuffled (key) group -> (polygon table for _PolyIndex,
    site rows)."""
    import pyarrow.compute as pc

    kinds = group.column("kind")
    polys = group.filter(pc.equal(kinds, "poly"))
    sites = group.filter(pc.equal(kinds, "site"))
    return pa.table({
        "gid": polys.column("gid"),
        "bal_number": polys.column("bal_number"),
        "geom": polys.column("geom")}), sites


def _tagged_union(sites_ds, veg_table, grid, max_dist: float,
                  hot_cell_threshold: int, n_salt: int,
                  subdivide_cover: int, subdivide_vertices: int):
    """Shared exchange plumbing of the partitioned spatial joins: both
    sides tagged with a (cell * n_salt + salt) key -- polygons expanded
    to every padded cell they cover (replicated across salts in hot
    cells, subdivided when large), sites clamped to one cell and one
    stable salt -- and unioned into a single keyed dataset ready for
    ``groupby("key")``."""
    from ..geo.geometry import subdivide as _subdivide
    from ..geo.wkb import polygon_to_wkb as _to_wkb
    import ray.data
    import ray.data.aggregate as agg

    veg_ds = ray.data.from_arrow(veg_table) \
        if isinstance(veg_table, pa.Table) else veg_table

    def cover_cells_batch(batch: pa.Table) -> pa.Table:
        gids, cells = [], []
        for gid, wkb_bytes in zip(batch.column("gid").to_pylist(),
                                  batch.column("geom").to_pylist()):
            g = from_wkb(wkb_bytes)
            for poly in (g if isinstance(g, list) else [g]):
                bb = poly.bbox
                cs = grid.cells_for_bbox(bb[0], bb[1], bb[2], bb[3],
                                         pad=max_dist)
                gids.extend([gid] * len(cs))
                cells.extend(cs.tolist())
        return pa.table({"gid": pa.array(gids, pa.int64()),
                         "cell_id": pa.array(cells, pa.int64())})

    # distributed cover counts; only the tiny (cell_id, n) table returns
    counts = (veg_ds.map_batches(cover_cells_batch, batch_format="pyarrow")
              .groupby("cell_id")
              .aggregate(agg.Count(alias_name="n")).take_all())
    hot = frozenset(int(r["cell_id"]) for r in counts
                    if r["n"] > hot_cell_threshold)

    tagged_schema = pa.schema([
        ("key", pa.int64()), ("kind", pa.string()), ("site_id", pa.string()),
        ("x", pa.float64()), ("y", pa.float64()), ("gid", pa.int64()),
        ("bal_number", pa.int16()), ("geom", pa.binary())])

    def expand_polys(batch: pa.Table) -> pa.Table:
        cols = {n: [] for n in tagged_schema.names}

        def emit(gid, cls, geom_bytes, bb):
            for cell in grid.cells_for_bbox(bb[0], bb[1], bb[2], bb[3],
                                            pad=max_dist):
                for s in (range(n_salt) if int(cell) in hot else (0,)):
                    cols["key"].append(int(cell) * n_salt + s)
                    cols["kind"].append("poly")
                    cols["site_id"].append("")
                    cols["x"].append(0.0)
                    cols["y"].append(0.0)
                    cols["gid"].append(gid)
                    cols["bal_number"].append(cls)
                    cols["geom"].append(geom_bytes)

        for gid, cls, wkb_bytes in zip(batch.column("gid").to_pylist(),
                                       batch.column("bal_number").to_pylist(),
                                       batch.column("geom").to_pylist()):
            g = from_wkb(wkb_bytes)
            parts = g if isinstance(g, list) else [g]
            for poly in parts:
                bb = poly.bbox
                n_cover = len(grid.cells_for_bbox(bb[0], bb[1], bb[2],
                                                  bb[3], pad=max_dist))
                if (n_cover > subdivide_cover and not poly.holes
                        and len(poly.exterior) > subdivide_vertices):
                    for piece in _subdivide(poly,
                                            max_vertices=subdivide_vertices,
                                            max_extent=grid.cell_size):
                        emit(gid, cls, _to_wkb(piece), piece.bbox)
                else:
                    emit(gid, cls, _to_wkb(poly), bb)
        return pa.table(cols, schema=tagged_schema)

    poly_ds = veg_ds.map_batches(expand_polys, batch_format="pyarrow")

    def site_key(batch: pa.Table) -> pa.Table:
        import zlib

        x = batch.column("x").to_numpy()
        y = batch.column("y").to_numpy()
        cell = grid.cell_of_clamped(x, y)
        ids = batch.column("site_id").to_pylist()
        # stable salt (crc32, not hash()) so partitioning is reproducible
        salt = np.array([zlib.crc32(i.encode()) % n_salt
                         if int(c) in hot else 0
                         for i, c in zip(ids, cell)], dtype=np.int64)
        return pa.table({
            "key": pa.array(cell * n_salt + salt, pa.int64()),
            "kind": pa.array(["site"] * len(ids)),
            "site_id": batch.column("site_id"),
            "x": batch.column("x"), "y": batch.column("y"),
            "gid": pa.array(np.zeros(len(ids), dtype=np.int64)),
            "bal_number": pa.array(np.zeros(len(ids), dtype=np.int16)),
            "geom": pa.array([b""] * len(ids), pa.binary()),
        }, schema=tagged_schema)

    tagged_sites = sites_ds.map_batches(site_key, batch_format="pyarrow")
    return tagged_sites.union(poly_ds)
