"""Hierarchical quad-cell index: the multi-resolution half of the engine's
H3/S2 analogue (:mod:`balrog_ray.geo.cells` carries the flat single-
resolution grid used as the shuffle key).

The container has no h3/s2 bindings, so the engine packs a quadtree cell
``(resolution, cx, cy)`` into one int64 and implements the S2 operations
the pipeline needs as vectorized NumPy:

* ``qcell_id`` / ``qcell_res`` / ``qcell_xy`` — pack / unpack,
* ``qparent`` / ``qchildren`` — move between resolutions (H3
  ``cell_to_parent`` / ``cell_to_children``),
* ``point_to_qcell`` — vectorized point -> cell at a resolution,
* ``compact`` — S2 ``CellUnion::Normalize``: complete sibling quartets
  promote to their parent, level by level, until no quartet remains,
* ``expand`` — the inverse (decompose a mixed-resolution union back to a
  fixed fine resolution),
* ``adaptive_cover`` — S2 ``RegionCoverer`` over the engine's planar
  :class:`~balrog_ray.geo.geometry.Polygon`: interior cells stay coarse,
  only the boundary refines to ``max_res``, so a cover of a polygon costs
  O(perimeter * 2^max_res) cells instead of O(area * 4^max_res).

Scale role (the north rule names the H3/S2 index explicitly): a compacted
cover is the bounded replication key for polygon×point co-location — a
continent-sized vegetation polygon meets probe points through a few
hundred mixed-resolution cells rather than millions of fine ones, and the
``qparent`` chain gives the multi-resolution rollup (count per cell at
every zoom) in one shuffle per level without re-reading the input.

The reference reaches the same need through PostGIS gist indexes and
fixed tiling (``03_explode_multipolygons_and_classify.sql:66-80``); the
quadtree id is the engine's shuffle-friendly restatement.
"""

from __future__ import annotations

import numpy as np

from .geometry import Polygon, clip_to_rect

#: bit layout: | res (6 bits, 52..57) | cy (26 bits, 26..51) | cx (26 bits, 0..25) |
RES_SHIFT = 52
CY_SHIFT = 26
XY_MASK = np.int64((1 << 26) - 1)
MAX_RES = 26


def qcell_id(res, cx, cy):
    """Pack ``(res, cx, cy)`` into one int64 (vectorized)."""
    res = np.asarray(res, np.int64)
    cx = np.asarray(cx, np.int64)
    cy = np.asarray(cy, np.int64)
    return (res << RES_SHIFT) | (cy << CY_SHIFT) | cx


def qcell_res(ids):
    return np.asarray(ids, np.int64) >> RES_SHIFT


def qcell_xy(ids):
    ids = np.asarray(ids, np.int64)
    return ids & XY_MASK, (ids >> CY_SHIFT) & XY_MASK


def qparent(ids, steps: int = 1):
    """Ancestor ``steps`` resolutions up (vectorized; res must be >= steps)."""
    res = qcell_res(ids)
    cx, cy = qcell_xy(ids)
    return qcell_id(res - steps, cx >> steps, cy >> steps)


def qchildren(ids):
    """The 4 children of each cell: shape ``(n, 4)`` int64."""
    res = qcell_res(ids)
    cx, cy = qcell_xy(ids)
    res1 = (res + 1)[:, None]
    cx2 = (cx << 1)[:, None] + np.array([0, 1, 0, 1], np.int64)
    cy2 = (cy << 1)[:, None] + np.array([0, 0, 1, 1], np.int64)
    return qcell_id(res1, cx2, cy2)


def qneighbors(ids, *, include_diagonal: bool = True):
    """Same-resolution grid neighbors of each cell (H3 ``grid_disk(1)`` /
    S2 ``GetEdgeNeighbors`` role): shape ``(n, 8)`` int64 (or ``(n, 4)``
    edge-only), with ``-1`` where the neighbor falls outside the
    ``2^res x 2^res`` grid.  Vectorized bit arithmetic; the halo-exchange
    keying on the cell index (which cells must see each other's borders)
    is exactly this function."""
    ids = np.atleast_1d(np.asarray(ids, np.int64))
    res = qcell_res(ids)
    cx, cy = qcell_xy(ids)
    if include_diagonal:
        dx = np.array([-1, 0, 1, -1, 1, -1, 0, 1], np.int64)
        dy = np.array([-1, -1, -1, 0, 0, 1, 1, 1], np.int64)
    else:
        dx = np.array([0, -1, 1, 0], np.int64)
        dy = np.array([-1, 0, 0, 1], np.int64)
    nx = cx[:, None] + dx[None, :]
    ny = cy[:, None] + dy[None, :]
    lim = (np.int64(1) << res)[:, None]
    ok = (nx >= 0) & (nx < lim) & (ny >= 0) & (ny < lim)
    out = qcell_id(np.broadcast_to(res[:, None], nx.shape), nx, ny)
    return np.where(ok, out, np.int64(-1))


def point_to_qcell(x, y, res: int, x0: float, y0: float, size: float):
    """Vectorized point -> cell id at ``res`` inside the square world
    window (west edge ``x0``, NORTH edge ``y0``, side ``size``).  Points
    outside the window clamp to the border cell (same contract as
    ``CellGrid.cell_of_clamped``).  With a power-of-two ``size`` and
    integer coordinates the float path is exact (division by 2^k)."""
    n = np.int64(1 << res)
    cx = np.clip(np.floor((np.asarray(x, np.float64) - x0) / size * n),
                 0, n - 1).astype(np.int64)
    cy = np.clip(np.floor((y0 - np.asarray(y, np.float64)) / size * n),
                 0, n - 1).astype(np.int64)
    return qcell_id(res, cx, cy)


def compact(ids: np.ndarray) -> np.ndarray:
    """S2 ``Normalize``: collapse every complete sibling quartet into its
    parent, cascading coarser until no quartet remains.  Input is a cell
    union (duplicates tolerated); output is sorted, duplicate-free, and
    covers exactly the same region.  O(n log n) per level, levels bounded
    by the finest resolution present."""
    ids = np.unique(np.asarray(ids, np.int64))
    if ids.size == 0:
        return ids
    for r in range(int(qcell_res(ids).max()), 0, -1):
        at_r = qcell_res(ids) == r
        cur = ids[at_r]
        if cur.size < 4:
            continue
        par = qparent(cur)
        up, counts = np.unique(par, return_counts=True)
        full = up[counts == 4]
        if full.size == 0:
            continue
        keep = cur[~np.isin(par, full)]
        ids = np.concatenate([ids[~at_r], keep, full])
    ids.sort()
    return ids


def expand(ids: np.ndarray, res: int) -> np.ndarray:
    """Decompose a mixed-resolution union to fixed resolution ``res``
    (every input cell must be at resolution <= ``res``).  Inverse of
    :func:`compact` up to ordering."""
    ids = np.asarray(ids, np.int64)
    out = []
    for r in np.unique(qcell_res(ids)):
        cur = ids[qcell_res(ids) == r]
        steps = res - int(r)
        if steps < 0:
            raise ValueError(f"cell at res {r} finer than target {res}")
        cx, cy = qcell_xy(cur)
        k = np.arange(1 << steps, dtype=np.int64)
        gx = (cx[:, None] << steps) + k[None, :]
        gy = (cy[:, None] << steps) + k[None, :]
        # cartesian within each cell: (n, 2^s, 2^s)
        full_x = np.broadcast_to(gx[:, None, :],
                                 (cur.size, 1 << steps, 1 << steps))
        full_y = np.broadcast_to(gy[:, :, None],
                                 (cur.size, 1 << steps, 1 << steps))
        out.append(qcell_id(np.int64(res), full_x.ravel(), full_y.ravel()))
    res_ids = np.concatenate(out) if out else ids[:0]
    res_ids.sort()
    return res_ids


def _cell_rect(ids, x0: float, y0: float, size: float):
    """World-space ``(xmin, ymin, xmax, ymax)`` of each cell, shape (n, 4)."""
    res = qcell_res(ids)
    cx, cy = qcell_xy(ids)
    cs = size / (np.int64(1) << res).astype(np.float64)
    xmin = x0 + cx * cs
    ymax = y0 - cy * cs
    return np.stack([xmin, ymax - cs, xmin + cs, ymax], axis=-1)


def adaptive_cover(poly: Polygon, x0: float, y0: float, size: float,
                   max_res: int, min_res: int = 0,
                   area_tol: float = 1e-9) -> np.ndarray:
    """S2 ``RegionCoverer``: a compact mixed-resolution cell union covering
    ``poly`` inside the window.  BFS from ``min_res``: a cell fully inside
    the polygon is kept as-is (coarse), a cell not intersecting it is
    dropped, a boundary cell splits into its 4 children until ``max_res``
    (boundary leaves at ``max_res`` are kept — the cover is a superset of
    the polygon, never a subset).  Classification uses the exact
    Sutherland–Hodgman clip: clip area == cell area -> interior,
    clip None/zero -> outside.  Output is :func:`compact`-normal form."""
    start = expand(
        np.asarray([qcell_id(0, 0, 0)], np.int64), min_res)
    keep: list[np.ndarray] = []
    frontier = start
    for r in range(min_res, max_res + 1):
        if frontier.size == 0:
            break
        rects = _cell_rect(frontier, x0, y0, size)
        inside = np.zeros(frontier.size, bool)
        partial = np.zeros(frontier.size, bool)
        cell_area = (size / (1 << r)) ** 2
        for i, (xm, ym, xM, yM) in enumerate(rects):
            clipped = clip_to_rect(poly, xm, ym, xM, yM)
            if clipped is None:
                continue
            a = clipped.area
            if a >= cell_area * (1.0 - area_tol):
                inside[i] = True
            elif a > cell_area * area_tol:
                partial[i] = True
        keep.append(frontier[inside])
        if r == max_res:
            keep.append(frontier[partial])
            break
        frontier = qchildren(frontier[partial]).ravel()
    return compact(np.concatenate(keep) if keep else start[:0])
