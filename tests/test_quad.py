"""Hierarchical quad-cell index (geo/quad.py): packing, parent/child,
S2-style compaction and the adaptive polygon coverer, each pinned by an
exhaustive or brute-force oracle."""

import numpy as np
import pytest

from balrog_ray.geo.geometry import Polygon, clip_to_rect
from balrog_ray.geo.quad import (MAX_RES, adaptive_cover, compact, expand,
                                 point_to_qcell, qcell_id, qcell_res,
                                 qcell_xy, qchildren, qparent)


def test_pack_roundtrip_extremes():
    m = (1 << 26) - 1
    res = np.array([0, 1, 13, MAX_RES], np.int64)
    cx = np.array([0, 1, 12345, m], np.int64)
    cy = np.array([0, 0, 54321, m], np.int64)
    ids = qcell_id(res, cx, cy)
    assert ids.dtype == np.int64 and (ids >= 0).all()
    assert (qcell_res(ids) == res).all()
    ox, oy = qcell_xy(ids)
    assert (ox == cx).all() and (oy == cy).all()


def test_parent_child_roundtrip():
    rng = np.random.default_rng(7)
    res = rng.integers(1, 20, 64)
    cx = rng.integers(0, 1 << 19, 64).astype(np.int64)
    cy = rng.integers(0, 1 << 19, 64).astype(np.int64)
    ids = qcell_id(res, cx % (1 << res), cy % (1 << res))
    kids = qchildren(ids)
    assert kids.shape == (64, 4)
    # every child's parent is the original cell, children are distinct
    assert (qparent(kids.ravel()).reshape(64, 4) == ids[:, None]).all()
    assert all(len(set(row)) == 4 for row in kids)
    # multi-step parent == chained single steps
    deep = ids[res >= 3]
    assert (qparent(deep, 3) == qparent(qparent(qparent(deep)))).all()


def test_point_to_qcell_matches_integer_arithmetic():
    x = np.arange(0, 1000, 7)
    y = (x * 31) % 1000
    ids = point_to_qcell(x, y, 8, 0.0, 1024.0, 1024.0)
    cx, cy = qcell_xy(ids)
    assert (qcell_res(ids) == 8).all()
    assert (cx == x // 4).all()
    assert (cy == np.minimum((1024 - y) // 4, 255)).all()


def _no_complete_quartet(ids: np.ndarray) -> bool:
    s = set(ids.tolist())
    for i in ids:
        if qcell_res(np.array([i]))[0] == 0:
            continue
        sibs = qchildren(qparent(np.array([i])))
        if all(int(c) in s for c in sibs.ravel()):
            return False
    return True


def test_compact_full_grid_collapses_to_root():
    r = 4
    gx, gy = np.meshgrid(np.arange(1 << r), np.arange(1 << r))
    fine = qcell_id(np.int64(r), gx.ravel(), gy.ravel())
    out = compact(fine)
    assert out.tolist() == [int(qcell_id(0, 0, 0))]


def test_compact_random_sets_roundtrip():
    rng = np.random.default_rng(42)
    r = 6
    for trial in range(5):
        n = int(rng.integers(1, 2000))
        cx = rng.integers(0, 1 << r, n)
        cy = rng.integers(0, 1 << r, n)
        fine = qcell_id(np.int64(r), cx, cy)
        out = compact(fine)
        # exact same region, normal form, idempotent
        assert np.array_equal(expand(out, r), np.unique(fine))
        assert _no_complete_quartet(out)
        assert np.array_equal(compact(out), out)
        assert len(out) <= len(np.unique(fine))


def test_compact_mixed_resolution_cascades():
    # 3 fine siblings + 1 pre-coarsened... build a res-2 cell from its 4
    # res-3 children, three given directly and one via ITS 4 res-4 children:
    # compaction must cascade bottom-up to the single res-2 cell.
    base = qcell_id(np.int64(2), np.int64(1), np.int64(1))
    kids = qchildren(np.array([base]))[0]          # 4 cells at res 3
    grand = qchildren(kids[:1])[0]                 # res-4 children of kid 0
    ids = np.concatenate([grand, kids[1:]])
    assert compact(ids).tolist() == [int(base)]


def test_expand_rejects_coarser_target():
    with pytest.raises(ValueError):
        expand(np.array([qcell_id(3, 0, 0)], np.int64), 2)


def test_adaptive_cover_matches_fine_clip_oracle():
    # convex polygon with interior big enough for coarse cells
    poly = Polygon(np.array([[100.0, 100.0], [900.0, 150.0],
                             [850.0, 880.0], [150.0, 800.0],
                             [100.0, 100.0]]))
    x0, y0, size, max_res = 0.0, 1024.0, 1024.0, 6
    ids = compact(adaptive_cover(poly, x0, y0, size, max_res, min_res=1))
    assert _no_complete_quartet(ids)
    got = set(expand(ids, max_res).tolist())

    # oracle: every max_res cell with positive clip area, none without
    n = 1 << max_res
    cs = size / n
    want = set()
    for cy in range(n):
        for cx in range(n):
            xm, ym = x0 + cx * cs, y0 - (cy + 1) * cs
            c = clip_to_rect(poly, xm, ym, xm + cs, ym + cs)
            if c is not None and c.area > 1e-9 * cs * cs:
                want.add(int(qcell_id(max_res, cx, cy)))
    assert got == want
    # the hierarchy did real work: fewer cells than the fine cover
    assert len(ids) < len(want)
    assert int(qcell_res(ids).min()) < max_res


def test_adaptive_cover_with_hole_refines_inner_boundary():
    outer = np.array([[64.0, 64.0], [960.0, 64.0], [960.0, 960.0],
                      [64.0, 960.0], [64.0, 64.0]])
    hole = np.array([[448.0, 448.0], [576.0, 448.0], [576.0, 576.0],
                     [448.0, 576.0], [448.0, 448.0]])
    poly = Polygon(outer, [hole])
    ids = adaptive_cover(poly, 0.0, 1024.0, 1024.0, max_res=6, min_res=1)
    got = set(expand(ids, 6).tolist())
    # a cell strictly inside the hole is NOT covered
    inside_hole = point_to_qcell(np.array([512.0]), np.array([512.0]),
                                 6, 0.0, 1024.0, 1024.0)
    assert int(inside_hole[0]) not in got
    # a cell strictly inside the ring IS covered
    inside_ring = point_to_qcell(np.array([200.0]), np.array([200.0]),
                                 6, 0.0, 1024.0, 1024.0)
    assert int(inside_ring[0]) in got


def test_qneighbors_brute_force():
    """qneighbors == meshgrid brute force, including grid-edge clipping
    and the edge-only variant."""
    import numpy as np

    from balrog_ray.geo.quad import qcell_id, qneighbors

    res = 3                                 # 8x8 grid
    cells = [(0, 0), (7, 7), (0, 5), (3, 4), (7, 0)]
    ids = qcell_id(np.full(len(cells), res),
                   np.array([c[0] for c in cells]),
                   np.array([c[1] for c in cells]))
    nb = qneighbors(ids)
    assert nb.shape == (len(cells), 8)
    for i, (cx, cy) in enumerate(cells):
        want = sorted(qcell_id(res, x, y)
                      for x in range(max(cx - 1, 0), min(cx + 2, 8))
                      for y in range(max(cy - 1, 0), min(cy + 2, 8))
                      if (x, y) != (cx, cy))
        got = sorted(v for v in nb[i] if v != -1)
        assert got == want
    edge = qneighbors(ids, include_diagonal=False)
    assert edge.shape == (len(cells), 4)
    assert sorted(v for v in edge[0] if v != -1) == sorted(
        [qcell_id(res, 1, 0), qcell_id(res, 0, 1)])
