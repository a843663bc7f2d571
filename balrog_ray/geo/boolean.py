"""Polygon boolean operations (Greiner-Hormann) + n-way union dissolve.

The reference's signature skew-handling op is the per-class geometric union
of vegetation polygons, run as a chunked partial/final ``ST_Union`` tree
(``/root/reference/data_prep/vegetation/04_merge_geometries.py:129-205``).
This module supplies the geometric core on the dependency-free kit:

* :func:`ring_boolean`   -- union / intersection / difference of two simple
  rings (Greiner-Hormann traversal over cross-linked vertex lists);
* :func:`polygon_union`  -- union of two Polygons (holes supported on the
  accumulator side), returning disjoint Polygons with holes;
* :func:`union_all`      -- n-way dissolve: union-find on intersecting
  pairs, then incremental union inside each connected component;
* :func:`intersection_area` -- exact polygon-x-polygon overlap area (the
  site-buffer x veg-polygon clip of ``xx_fiona_testing.py:155-170``).

Numerical model: strict-interior edge crossings only (endpoint-degenerate
contacts are treated as non-crossing -- adequate for float data in general
position; exactly-shared edges between inputs should be pre-snapped).
"""

from __future__ import annotations

import numpy as np

from .geometry import Polygon, polygon_contains, _ring_area


class _V:
    __slots__ = ("x", "y", "next", "prev", "neighbour", "inter", "entry",
                 "visited")

    def __init__(self, x: float, y: float, inter: bool = False):
        self.x, self.y = float(x), float(y)
        self.next = self.prev = self.neighbour = None
        self.inter = inter
        self.entry = False
        self.visited = False


def _build(ring: np.ndarray) -> _V:
    head = None
    prev = None
    for x, y in ring:
        v = _V(x, y)
        if head is None:
            head = v
            v.next = v.prev = v
        else:
            v.prev, v.next = prev, head
            prev.next = v
            head.prev = v
        prev = v
    return head


def _verts(head: _V):
    v = head
    while True:
        yield v
        v = v.next
        if v is head:
            return


def _seg_inter(p1, p2, q1, q2):
    """Strict-interior intersection of two segments; None or (x, y, t, u)."""
    d1x, d1y = p2[0] - p1[0], p2[1] - p1[1]
    d2x, d2y = q2[0] - q1[0], q2[1] - q1[1]
    den = d1x * d2y - d1y * d2x
    if den == 0.0:
        return None
    ex, ey = q1[0] - p1[0], q1[1] - p1[1]
    t = (ex * d2y - ey * d2x) / den
    u = (ex * d1y - ey * d1x) / den
    eps = 1e-12
    if eps < t < 1 - eps and eps < u < 1 - eps:
        return (p1[0] + t * d1x, p1[1] + t * d1y, t, u)
    return None


def _ring_pts(ring: np.ndarray) -> np.ndarray:
    ring = np.asarray(ring, dtype=np.float64)
    if len(ring) > 1 and ring[0][0] == ring[-1][0] and ring[0][1] == ring[-1][1]:
        ring = ring[:-1]
    return ring


def _insert_intersections(a_head: _V, b_head: _V) -> int:
    """Find all edge crossings, insert cross-linked intersection vertices."""
    # capture the original edges (endpoint coords + start vertex) BEFORE
    # any insertion mutates the linked lists
    a_orig = [((v.x, v.y), (v.next.x, v.next.y), v) for v in _verts(a_head)]
    b_orig = [((w.x, w.y), (w.next.x, w.next.y), w) for w in _verts(b_head)]
    found = []
    inserts_a: dict[int, list] = {}
    inserts_b: dict[int, list] = {}
    for i, (p1, p2, _) in enumerate(a_orig):
        for j, (q1, q2, _) in enumerate(b_orig):
            hit = _seg_inter(p1, p2, q1, q2)
            if hit is None:
                continue
            x, y, t, u = hit
            va = _V(x, y, inter=True)
            vb = _V(x, y, inter=True)
            va.neighbour, vb.neighbour = vb, va
            inserts_a.setdefault(i, []).append((t, va))
            inserts_b.setdefault(j, []).append((u, vb))
            found.append(va)
    for i, items in inserts_a.items():
        cur = a_orig[i][2]
        for _, v in sorted(items, key=lambda p: p[0]):
            nxt = cur.next
            v.prev, v.next = cur, nxt
            cur.next = v
            nxt.prev = v
            cur = v
    for j, items in inserts_b.items():
        cur = b_orig[j][2]
        for _, w in sorted(items, key=lambda p: p[0]):
            nxt = cur.next
            w.prev, w.next = cur, nxt
            cur.next = w
            nxt.prev = w
            cur = w
    return len(found)


def _mark_entries(head: _V, other: Polygon, invert: bool) -> None:
    first = next(v for v in _verts(head) if not v.inter)
    status = not bool(polygon_contains(
        np.array([[first.x, first.y]]), other)[0])
    if invert:
        status = not status
    for v in _verts(head):
        if v.inter:
            v.entry = status
            status = not status


def ring_boolean(a_ring, b_ring, op: str) -> list[np.ndarray]:
    """Greiner-Hormann boolean of two simple rings.

    Returns raw result rings (open, float64 (N,2)).  Hole rings come out
    with reversed orientation; callers nest them via :func:`_nest`.
    ``op``: "union" | "intersection" | "difference" (a minus b).
    """
    a_pts = _ring_pts(a_ring)
    b_pts = _ring_pts(b_ring)
    pa_ = Polygon(a_pts)
    pb_ = Polygon(b_pts)
    a_head = _build(a_pts)
    b_head = _build(b_pts)
    n = _insert_intersections(a_head, b_head)
    if n == 0:
        a_in_b = bool(polygon_contains(a_pts[:1], pb_)[0])
        b_in_a = bool(polygon_contains(b_pts[:1], pa_)[0])
        if op == "union":
            if a_in_b:
                return [b_pts]
            if b_in_a:
                return [a_pts]
            return [a_pts, b_pts]
        if op == "intersection":
            if a_in_b:
                return [a_pts]
            if b_in_a:
                return [b_pts]
            return []
        if op == "difference":
            if a_in_b:
                return []
            if b_in_a:
                # a with hole b: emit b reversed; _nest pairs them up
                return [a_pts, b_pts[::-1]]
            return [a_pts]
        raise ValueError(op)
    # entry/exit marking; op selects which sides get inverted
    _mark_entries(a_head, pb_, invert=op in ("union", "difference"))
    _mark_entries(b_head, pa_, invert=op == "union")
    out = []
    inters = [v for v in _verts(a_head) if v.inter]
    for start in inters:
        if start.visited:
            continue
        ring = []
        cur = start
        while True:
            cur.visited = True
            if cur.neighbour is not None:
                cur.neighbour.visited = True
            if cur.entry:
                while True:
                    ring.append((cur.x, cur.y))
                    cur = cur.next
                    if cur.inter:
                        break
            else:
                while True:
                    ring.append((cur.x, cur.y))
                    cur = cur.prev
                    if cur.inter:
                        break
            cur = cur.neighbour
            if cur is start or cur.neighbour is start:
                break
        if len(ring) >= 3:
            out.append(np.asarray(ring, dtype=np.float64))
    return out


def _nest(rings: list[np.ndarray]) -> list[Polygon]:
    """Assemble raw rings into Polygons: a ring contained in an odd number
    of other rings is a hole of its innermost container."""
    if not rings:
        return []
    polys = [Polygon(r) for r in rings]  # normalizes/closes
    n = len(rings)
    depth = np.zeros(n, dtype=int)
    parent = np.full(n, -1, dtype=int)
    areas = [abs(_ring_area(p.exterior)) for p in polys]
    for i in range(n):
        pt = polys[i].exterior[:1]
        best = None
        for j in range(n):
            if i == j:
                continue
            if areas[j] > areas[i] and bool(
                    polygon_contains(pt, polys[j])[0]):
                depth[i] += 1
                if best is None or areas[j] < areas[best]:
                    best = j
        parent[i] = -1 if best is None else best
    out: dict[int, Polygon] = {}
    for i in range(n):
        if depth[i] % 2 == 0:
            out[i] = Polygon(polys[i].exterior.copy())
    for i in range(n):
        if depth[i] % 2 == 1 and parent[i] in out:
            out[parent[i]].holes.append(polys[i].exterior.copy())
    return list(out.values())


def _overlaps(a: Polygon, b: Polygon) -> bool:
    ab, bb = a.bbox, b.bbox
    if ab[0] > bb[2] or bb[0] > ab[2] or ab[1] > bb[3] or bb[1] > ab[3]:
        return False
    if bool(polygon_contains(a.exterior[:1], b)[0]):
        return True
    if bool(polygon_contains(b.exterior[:1], a)[0]):
        return True
    # any strict edge crossing
    ae = list(zip(a.exterior[:-1], a.exterior[1:]))
    be = list(zip(b.exterior[:-1], b.exterior[1:]))
    for p1, p2 in ae:
        for q1, q2 in be:
            if _seg_inter(p1, p2, q1, q2) is not None:
                return True
    return False


def polygon_union(a: Polygon, b: Polygon) -> list[Polygon]:
    """Union of two Polygons (either may carry holes).  A point of the
    union is EMPTY iff it is outside A's region and outside B's region, so
    the result's holes are: new pockets from the exterior-ring union, plus
    ``ha - Bext``, ``hb - Aext`` and every ``ha ^ hb`` (pairwise-disjoint
    by construction).  Returns disjoint Polygons."""
    merged = _nest(ring_boolean(a.exterior, b.exterior, "union"))
    hole_pieces = []
    for ha in a.holes:
        hole_pieces.extend(ring_boolean(ha, b.exterior, "difference"))
        for hb in b.holes:
            hole_pieces.extend(ring_boolean(ha, hb, "intersection"))
    for hb in b.holes:
        hole_pieces.extend(ring_boolean(hb, a.exterior, "difference"))
    out = []
    for m in merged:
        holes = list(m.holes)
        ext = Polygon(m.exterior)
        for piece in hole_pieces:
            pc = _ring_pts(np.asarray(piece, dtype=np.float64))
            if abs(_ring_area(Polygon(pc).exterior)) <= 1e-9:
                continue
            if bool(polygon_contains(pc[:1], ext)[0]):
                holes.append(pc)
        # Polygon(exterior, holes=...) re-closes every ring -- assigning
        # .holes post-construction would skip _close_ring and break the
        # crossing-number parity test
        out.append(Polygon(m.exterior.copy(), holes=holes))
    return out


def union_all(polys: list[Polygon]) -> list[Polygon]:
    """n-way dissolve: returns disjoint Polygons (with holes) covering the
    same point set as the input union."""
    polys = [p for p in polys if abs(_ring_area(p.exterior)) > 0]
    n = len(polys)
    if n == 0:
        return []
    # union-find over intersecting pairs (bbox prefilter)
    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(n):
        for j in range(i + 1, n):
            if find(i) != find(j) and _overlaps(polys[i], polys[j]):
                parent[find(j)] = find(i)
    comps: dict[int, list[Polygon]] = {}
    for i in range(n):
        comps.setdefault(find(i), []).append(polys[i])
    out: list[Polygon] = []
    for members in comps.values():
        acc = [members[0]]
        for p in members[1:]:
            nxt = []
            todo = p
            for r in acc:
                if todo is not None and _overlaps(r, todo):
                    merged = polygon_union(r, todo)
                    # the union result absorbs todo; continue merging the
                    # grown region with the remaining accumulator entries
                    todo = None
                    nxt.extend(merged)
                else:
                    nxt.append(r)
            if todo is not None:
                nxt.append(todo)
            else:
                # re-coalesce: the merged region may now overlap others
                changed = True
                while changed:
                    changed = False
                    for x in range(len(nxt)):
                        for y in range(x + 1, len(nxt)):
                            if _overlaps(nxt[x], nxt[y]):
                                merged = polygon_union(nxt[x], nxt[y])
                                nxt = ([nxt[k] for k in range(len(nxt))
                                        if k not in (x, y)] + merged)
                                changed = True
                                break
                        if changed:
                            break
            acc = nxt
        out.extend(acc)
    return out


def intersection_area(a: Polygon, b: Polygon) -> float:
    """Exact overlap area of two simple polygons (holes of ``a`` are
    subtracted)."""
    rings = ring_boolean(a.exterior, b.exterior, "intersection")
    area = sum(abs(_ring_area(Polygon(r).exterior)) for r in rings)
    for h in a.holes:
        hr = ring_boolean(h, b.exterior, "intersection")
        area -= sum(abs(_ring_area(Polygon(r).exterior)) for r in hr)
    return max(area, 0.0)
