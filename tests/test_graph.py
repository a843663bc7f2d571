"""Distributed PageRank vs a single-process numpy power iteration with
the identical start, damping and iteration count."""

import numpy as np
import pyarrow as pa
import pytest


def _numpy_pagerank(src, dst, n, iters=8, d=0.85):
    deg = np.zeros(n)
    np.add.at(deg, src, 1.0)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        np.add.at(contrib, dst, d * r[src] / deg[src])
        r = (1.0 - d) / n + contrib
    return r


def _edges(n):
    """Variable out-degree (1 + i % 3): an IRREGULAR graph, so the
    stationary distribution is genuinely non-uniform (a 3-regular
    bijective graph would make uniform the exact fixed point and the
    test vacuous)."""
    src, dst = [], []
    for i in range(n):
        for j in range(1, 2 + i % 3):
            src.append(i)
            dst.append((i * 7 + j * 13) % n)
    return np.array(src, np.int64), np.array(dst, np.int64)


def test_pagerank_matches_numpy(ray_session):
    import ray.data

    from balrog_ray.functions.graph import pagerank

    n = 60
    src, dst = _edges(n)
    ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    got = {r["node"]: r["rank"]
           for r in pagerank(ds, n, iters=8).take_all()}
    want = _numpy_pagerank(src, dst, n, iters=8)
    assert sorted(got) == list(range(n))
    for node in range(n):
        assert got[node] == pytest.approx(want[node], rel=1e-10)
    # sanity: ranks sum to ~1 and actually deviate from uniform
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)
    assert max(got.values()) > 1.2 * min(got.values())


def test_pagerank_sink_source_structure(ray_session):
    """A node everyone links to must outrank a node nobody links to."""
    import ray.data

    from balrog_ray.functions.graph import pagerank

    n = 12
    src = np.arange(n, dtype=np.int64)
    dst = np.zeros(n, np.int64)       # everyone -> node 0
    dst[0] = 1                        # node 0 -> node 1
    ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    got = {r["node"]: r["rank"]
           for r in pagerank(ds, n, iters=12).take_all()}
    want = _numpy_pagerank(src, dst, n, iters=12)
    for node in range(n):
        assert got[node] == pytest.approx(want[node], rel=1e-10)
    # mass concentrates on the 0 <-> 1 cycle; unlinked nodes sit at the
    # teleport floor
    assert got[0] + got[1] > 0.7
    assert got[5] == pytest.approx(0.15 / n, rel=1e-9)
    assert got[0] > 5 * got[5]


def test_pagerank_exact_matches_fractions(ray_session):
    """Integer-numerator PageRank == exact rational power iteration
    (Fraction arithmetic), bit-for-bit, on an irregular graph."""
    from fractions import Fraction

    import ray.data

    from balrog_ray.functions.graph import pagerank_exact

    n = 30
    src, dst = _edges(n)
    ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    nums_ds, denom = pagerank_exact(ds, n, iters=6)
    got = {r["node"]: r["num"] for r in nums_ds.take_all()}

    deg = np.zeros(n, np.int64)
    np.add.at(deg, src, 1)
    r = [Fraction(1, n)] * n
    for _ in range(6):
        nxt = [Fraction(3, 20 * n)] * n
        for s, t in zip(src, dst):
            nxt[t] += Fraction(17, 20) * r[s] / int(deg[s])
        r = nxt
    for node in range(n):
        assert Fraction(got[node], denom) == r[node], node
    assert sum(Fraction(v, denom) for v in got.values()) == 1


def test_pagerank_exact_overflow_guard(ray_session):
    import ray.data

    from balrog_ray.functions.graph import pagerank_exact

    src, dst = _edges(20)
    ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    with pytest.raises(ValueError, match="overflows"):
        pagerank_exact(ds, 20, iters=30)
