"""Dependency-free planar geometry kit (NumPy only).

The container lacks shapely/GEOS, so the engine carries its own vectorized
primitives for the spatial-join / zonal workloads the reference runs through
PostGIS + shapely (``data_prep/vegetation/xx_fiona_testing.py:153-218``,
``testing/02_get_slope_from_buffer.py:193-286``):

* point-in-polygon (crossing number, vectorized over points),
* distance / nearest-point from points to polygon boundaries,
* shoelace area, centroid, bbox,
* rectangle clip (Sutherland-Hodgman) used for ``st_subdivide``-style
  skew splitting (``03_explode_multipolygons_and_classify.sql:66-80``),
* polygon rasterization onto a pixel grid (the FeatureToRaster analogue,
  ``sa_tools.py:82``).

A polygon is an exterior ring ``(N, 2) float64`` array (closed: first ==
last vertex) plus optional hole rings.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class Polygon:
    exterior: np.ndarray                  # (N, 2), closed ring
    holes: list = field(default_factory=list)

    def __post_init__(self):
        self.exterior = _close_ring(np.asarray(self.exterior, np.float64))
        self.holes = [_close_ring(np.asarray(h, np.float64))
                      for h in self.holes]

    @property
    def bbox(self) -> np.ndarray:
        return np.array([self.exterior[:, 0].min(), self.exterior[:, 1].min(),
                         self.exterior[:, 0].max(), self.exterior[:, 1].max()])

    @property
    def area(self) -> float:
        a = _ring_area(self.exterior)
        return abs(a) - sum(abs(_ring_area(h)) for h in self.holes)

    @property
    def centroid(self) -> np.ndarray:
        x, y = self.exterior[:-1, 0], self.exterior[:-1, 1]
        x1, y1 = self.exterior[1:, 0], self.exterior[1:, 1]
        cross = x * y1 - x1 * y
        a = cross.sum() / 2.0
        if a == 0:
            return self.exterior[:-1].mean(axis=0)
        cx = ((x + x1) * cross).sum() / (6.0 * a)
        cy = ((y + y1) * cross).sum() / (6.0 * a)
        return np.array([cx, cy])


def _close_ring(ring: np.ndarray) -> np.ndarray:
    if len(ring) and not np.array_equal(ring[0], ring[-1]):
        ring = np.vstack([ring, ring[0]])
    return ring


def _ring_area(ring: np.ndarray) -> float:
    x, y = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    return float((x * y1 - x1 * y).sum() / 2.0)


def ring_contains(points: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Crossing-number point-in-ring test, vectorized over ``points`` (M,2).

    Edge-on-boundary points follow the half-open convention (consistent and
    deterministic, which is what join parity needs)."""
    pts = np.atleast_2d(points)
    x, y = pts[:, 0:1], pts[:, 1:2]            # (M,1)
    x0, y0 = ring[:-1, 0][None, :], ring[:-1, 1][None, :]
    x1, y1 = ring[1:, 0][None, :], ring[1:, 1][None, :]
    crosses = (y0 > y) != (y1 > y)
    with np.errstate(divide="ignore", invalid="ignore"):
        xin = x0 + (y - y0) * (x1 - x0) / (y1 - y0)
    hits = crosses & (x < xin)
    return (hits.sum(axis=1) % 2).astype(bool)


def polygon_contains(points: np.ndarray, poly: Polygon) -> np.ndarray:
    inside = ring_contains(points, poly.exterior)
    for hole in poly.holes:
        inside &= ~ring_contains(points, hole)
    return inside


def _seg_nearest(points: np.ndarray, ring: np.ndarray):
    """Nearest point on a closed ring for each input point.
    Returns (dist, nearest_xy) arrays."""
    pts = np.atleast_2d(points)                 # (M,2)
    a = ring[:-1]                               # (E,2)
    d = ring[1:] - a                            # (E,2)
    len2 = (d * d).sum(axis=1)                  # (E,)
    len2[len2 == 0] = 1.0
    # t = clamp(((p-a).d)/|d|^2) ; vectorized (M,E)
    diff = pts[:, None, :] - a[None, :, :]      # (M,E,2)
    t = np.clip((diff * d[None, :, :]).sum(axis=2) / len2[None, :], 0.0, 1.0)
    proj = a[None, :, :] + t[:, :, None] * d[None, :, :]
    dist2 = ((pts[:, None, :] - proj) ** 2).sum(axis=2)
    idx = dist2.argmin(axis=1)
    m = np.arange(len(pts))
    return np.sqrt(dist2[m, idx]), proj[m, idx]


def polygon_distance(points: np.ndarray, poly: Polygon):
    """(distance, nearest_point, inside) from each point to a polygon.
    Distance is 0 for interior points (matching st_distance /
    shapely.nearest_points semantics used by the reference,
    ``xx_fiona_testing.py:205-218``)."""
    pts = np.atleast_2d(points)
    dist, nearest = _seg_nearest(pts, poly.exterior)
    for hole in poly.holes:
        hd, hn = _seg_nearest(pts, hole)
        closer = hd < dist
        dist = np.where(closer, hd, dist)
        nearest = np.where(closer[:, None], hn, nearest)
    inside = polygon_contains(pts, poly)
    dist = np.where(inside, 0.0, dist)
    nearest = np.where(inside[:, None], pts, nearest)
    return dist, nearest, inside


def azimuth_deg(from_pts: np.ndarray, to_pts: np.ndarray) -> np.ndarray:
    """Compass azimuth (0-360, clockwise from north) from each point to its
    target -- the planar analogue of pyproj's forward azimuth."""
    delta = np.atleast_2d(to_pts) - np.atleast_2d(from_pts)
    return np.mod(np.degrees(np.arctan2(delta[:, 0], delta[:, 1])), 360.0)


def clip_to_rect(poly: Polygon, xmin, ymin, xmax, ymax) -> Polygon | None:
    """Sutherland-Hodgman clip of the exterior ring to a rectangle.
    Holes are clipped the same way.  Returns None when nothing remains."""
    def clip_ring(ring):
        verts = list(ring[:-1])
        for edge in range(4):
            if not verts:
                return None
            out = []
            prev = verts[-1]
            for cur in verts:
                pi, ci = _inside_edge(prev, edge, xmin, ymin, xmax, ymax), \
                    _inside_edge(cur, edge, xmin, ymin, xmax, ymax)
                if ci:
                    if not pi:
                        out.append(_isect(prev, cur, edge,
                                          xmin, ymin, xmax, ymax))
                    out.append(cur)
                elif pi:
                    out.append(_isect(prev, cur, edge,
                                      xmin, ymin, xmax, ymax))
                prev = cur
            verts = out
        if len(verts) < 3:
            return None
        return np.asarray(verts)

    ext = clip_ring(poly.exterior)
    if ext is None:
        return None
    holes = [h for h in (clip_ring(hh) for hh in poly.holes) if h is not None]
    return Polygon(ext, holes)


def _inside_edge(p, edge, xmin, ymin, xmax, ymax):
    if edge == 0:
        return p[0] >= xmin
    if edge == 1:
        return p[1] >= ymin
    if edge == 2:
        return p[0] <= xmax
    return p[1] <= ymax


def _isect(p, q, edge, xmin, ymin, xmax, ymax):
    px, py = p
    qx, qy = q
    if edge in (0, 2):
        xb = xmin if edge == 0 else xmax
        t = (xb - px) / (qx - px)
        return np.array([xb, py + t * (qy - py)])
    yb = ymin if edge == 1 else ymax
    t = (yb - py) / (qy - py)
    return np.array([px + t * (qx - px), yb])


def subdivide(poly: Polygon, max_vertices: int = 128,
              max_extent: float | None = None) -> list[Polygon]:
    """Recursively halve a polygon along its bbox's long axis until each
    part is small -- the engine's ``st_subdivide`` analogue for skew
    mitigation.  Splitting is done with two rectangle clips."""
    # a rectangle clip adds up to ~2 vertices per crossed edge, so very
    # small max_vertices can never be satisfied -- each split must make
    # measurable progress (shrink the long axis) and depth is bounded so
    # the recursion terminates on any input
    out, stack = [], [(poly, 0)]
    max_depth = 64
    while stack:
        p, depth = stack.pop()
        bb = p.bbox
        w, h = bb[2] - bb[0], bb[3] - bb[1]
        small = len(p.exterior) - 1 <= max_vertices and (
            max_extent is None or max(w, h) <= max_extent)
        if small or depth >= max_depth:
            out.append(p)
            continue
        if w >= h:
            mid = (bb[0] + bb[2]) / 2.0
            parts = [clip_to_rect(p, bb[0], bb[1], mid, bb[3]),
                     clip_to_rect(p, mid, bb[1], bb[2], bb[3])]
        else:
            mid = (bb[1] + bb[3]) / 2.0
            parts = [clip_to_rect(p, bb[0], bb[1], bb[2], mid),
                     clip_to_rect(p, bb[0], mid, bb[2], bb[3])]
        parts = [q for q in parts if q is not None]
        if len(parts) <= 1:           # degenerate; cannot split further
            out.append(p)
            continue
        # no-progress guard: if no child got smaller in vertex count and
        # the extent constraint (if any) is already met, emit as-is
        if (max_extent is None or max(w, h) <= max_extent) and all(
                len(q.exterior) >= len(p.exterior) for q in parts):
            out.append(p)
            continue
        stack.extend((q, depth + 1) for q in parts)
    return out


def rasterize(polys, values, x0: float, y0: float, pixel_size: float,
              rows: int, cols: int, fill: float = -99.0) -> np.ndarray:
    """Paint polygon ``values`` onto a pixel grid by pixel-center test.

    ``x0, y0`` = the grid's upper-left corner (row-major, y decreasing),
    matching the raster orientation used throughout the engine.  Later
    polygons win overlaps (deterministic paint order)."""
    out = np.full((rows, cols), fill, dtype=np.float64)
    xs = x0 + (np.arange(cols) + 0.5) * pixel_size
    ys = y0 - (np.arange(rows) + 0.5) * pixel_size
    for poly, val in zip(polys, values):
        bb = poly.bbox
        c0 = max(0, int(np.floor((bb[0] - x0) / pixel_size)))
        c1 = min(cols, int(np.ceil((bb[2] - x0) / pixel_size)) + 1)
        r0 = max(0, int(np.floor((y0 - bb[3]) / pixel_size)))
        r1 = min(rows, int(np.ceil((y0 - bb[1]) / pixel_size)) + 1)
        if r0 >= r1 or c0 >= c1:
            continue
        gx, gy = np.meshgrid(xs[c0:c1], ys[r0:r1])
        pts = np.column_stack([gx.ravel(), gy.ravel()])
        mask = polygon_contains(pts, poly).reshape(r1 - r0, c1 - c0)
        window = out[r0:r1, c0:c1]
        window[mask] = val
    return out


def _dp_mask(points: np.ndarray, tol: float) -> np.ndarray:
    """Douglas-Peucker keep-mask for an OPEN polyline (endpoints kept).
    Iterative stack, vectorized point-to-chord distances."""
    n = len(points)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = points[j] - points[i]
        mid = points[i + 1:j] - points[i]
        length = float(np.hypot(seg[0], seg[1]))
        if length == 0.0:
            d = np.hypot(mid[:, 0], mid[:, 1])
        else:
            d = np.abs(seg[0] * mid[:, 1] - seg[1] * mid[:, 0]) / length
        kmax = int(np.argmax(d))
        if d[kmax] > tol:
            k = i + 1 + kmax
            keep[k] = True
            stack.append((i, k))
            stack.append((k, j))
    return keep


def _simplify_ring(ring: np.ndarray, tol: float) -> np.ndarray | None:
    """Simplify a CLOSED ring: anchor at vertex 0 and the vertex farthest
    from it (so the result cannot collapse to a chord), DP each half.
    Returns a closed ring, or None when it degenerates (< 3 distinct
    vertices)."""
    pts = ring[:-1]
    if len(pts) < 4:
        return ring
    far = int(np.argmax(np.hypot(pts[:, 0] - pts[0, 0],
                                 pts[:, 1] - pts[0, 1])))
    if far == 0:
        return None                       # all vertices coincide
    half1 = pts[:far + 1]
    half2 = np.concatenate([pts[far:], pts[:1]])
    k1 = _dp_mask(half1, tol)
    k2 = _dp_mask(half2, tol)
    out = np.concatenate([half1[k1][:-1], half2[k2][:-1]])
    if len(out) < 3:
        return None
    return _close_ring(out)


def simplify(poly: Polygon, tolerance: float) -> Polygon | None:
    """Douglas-Peucker polygon simplification -- the ``ST_Simplify``
    analogue of the reference's PostGIS toolchain (its merge/subdivide
    pipeline, ``04_merge_geometries.py``, lives in the ecosystem where
    simplify is the standard companion op).  Every kept vertex is an
    input vertex; every dropped vertex lies within ``tolerance`` of the
    simplified outline.  Degenerate holes are dropped; a degenerate
    shell returns None (drop the feature)."""
    shell = _simplify_ring(poly.exterior, tolerance)
    if shell is None or abs(_ring_area(shell)) == 0.0:
        return None
    holes = []
    for h in poly.holes:
        hs = _simplify_ring(h, tolerance)
        if hs is not None and abs(_ring_area(hs)) > 0.0:
            holes.append(hs)
    return Polygon(shell, holes)


def convex_hull(points: np.ndarray, keep_collinear: bool = False) -> np.ndarray:
    """Convex hull of an (n, 2) point array via Andrew's monotone chain,
    counter-clockwise, first vertex = lexicographic minimum, no repeated
    endpoint.  ``keep_collinear=True`` keeps points lying on hull edges
    (pop only on strict right turns) -- the safe setting for PARTIAL
    hulls in a two-level reduce, where a float-borderline collinear
    point must survive to the final pass to decide its own fate there.
    Degenerate inputs (n <= 2, or all points collinear) return the
    distinct extreme points (1 or 2 rows)."""
    pts = np.unique(np.asarray(points, dtype=np.float64), axis=0)
    n = len(pts)
    if n <= 2:
        return pts
    thr = 0.0

    def build(seq):
        out = []
        for p in seq:
            while len(out) >= 2:
                cr = ((out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                      - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0]))
                if cr > thr or (keep_collinear and cr == thr):
                    break
                out.pop()
            out.append(p)
        return out

    lower = build(pts)
    upper = build(pts[::-1])
    hull = np.array(lower[:-1] + upper[:-1])
    return hull


def hull_area(hull: np.ndarray) -> float:
    """Shoelace area of a CCW hull ring (no repeated endpoint)."""
    if len(hull) < 3:
        return 0.0
    x, y = hull[:, 0], hull[:, 1]
    return 0.5 * float(np.abs(
        np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))))
