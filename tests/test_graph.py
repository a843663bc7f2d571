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


def test_pagerank_exact_sink_node_path_parity(ray_session, monkeypatch):
    """ADVICE r4 regression: on a graph with SINK (dst-only) nodes the
    broadcast and distributed pagerank_exact paths must emit the same
    src-only node domain with identical numerators -- previously the
    distributed path emitted inflow-only rows for sinks while the
    broadcast path dropped them, so the result depended on the
    num_nodes gate."""
    import ray.data

    from balrog_ray.functions import graph

    n = 12
    # sources 0..9; node 10 is a pure sink (dst-only); 11 is isolated
    src = np.repeat(np.arange(10, dtype=np.int64), 2)
    dst = np.empty(20, np.int64)
    dst[0::2] = (np.arange(10) + 3) % 10
    dst[1::2] = 10
    tab = pa.table({"src": src, "dst": dst})

    got_b, denom_b = graph.pagerank_exact(
        ray.data.from_arrow(tab), n, iters=4)
    rows_b = {r["node"]: r["num"] for r in got_b.take_all()}

    monkeypatch.setattr(graph, "_BROADCAST_MAX_NODES", -1)
    got_d, denom_d = graph.pagerank_exact(
        ray.data.from_arrow(tab), n, iters=4, num_partitions=2)
    rows_d = {r["node"]: r["num"] for r in got_d.take_all()}

    assert denom_b == denom_d
    assert rows_b == rows_d
    assert sorted(rows_b) == list(range(10))   # sinks/isolated absent

    # float path: same src-only domain on the same sink graph
    got_f = {r["node"] for r in graph.pagerank(
        ray.data.from_arrow(tab), n, iters=3).take_all()}
    assert got_f == set(range(10))


def test_pagerank_exact_overflow_guard(ray_session):
    import ray.data

    from balrog_ray.functions.graph import pagerank_exact

    src, dst = _edges(20)
    ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    with pytest.raises(ValueError, match="overflows"):
        pagerank_exact(ds, 20, iters=30)


def _numpy_bfs(src, dst, seeds, n, max_hops):
    """Reference multi-source BFS: dense frontier sweep."""
    dist = np.full(n, -1, np.int64)
    dist[seeds] = 0
    frontier = set(seeds.tolist())
    for k in range(1, max_hops + 1):
        nxt = set()
        for s, d in zip(src, dst):
            if s in frontier and dist[d] < 0:
                nxt.add(int(d))
        for v in nxt:
            dist[v] = k
        frontier = nxt
        if not frontier:
            break
    return {i: int(dist[i]) for i in range(n) if dist[i] >= 0}


def test_bfs_levels_matches_numpy(ray_session):
    import ray.data

    from balrog_ray.functions.graph import bfs_levels

    n = 211
    src, dst = _edges(n)
    seeds = np.array([0, 97, 194], np.int64)
    eds = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    sds = ray.data.from_arrow(pa.table({"node": seeds}))
    got = {r["node"]: r["dist"]
           for r in bfs_levels(eds, sds, max_hops=5,
                               num_partitions=3).take_all()}
    want = _numpy_bfs(src, dst, seeds, n, 5)
    assert got == want


def test_bfs_path_parity(ray_session, monkeypatch):
    """Driver CSR sweep (under the edge gate) and the distributed
    frontier loop must emit identical (node, dist) tables."""
    import ray.data

    from balrog_ray.functions import graph

    n = 180
    src, dst = _edges(n)
    seeds = pa.table({"node": pa.array([0, 61, 122], pa.int64())})
    eds = pa.table({"src": src, "dst": dst})
    got_b = {r["node"]: r["dist"] for r in graph.bfs_levels(
        ray.data.from_arrow(eds), ray.data.from_arrow(seeds),
        max_hops=4, num_partitions=2).take_all()}
    monkeypatch.setattr(graph, "_BROADCAST_MAX_EDGES", -1)
    got_d = {r["node"]: r["dist"] for r in graph.bfs_levels(
        ray.data.from_arrow(eds), ray.data.from_arrow(seeds),
        max_hops=4, num_partitions=2).take_all()}
    assert got_b == got_d and len(got_b) > 3


def test_bfs_levels_unreachable_absent(ray_session):
    """A node with no in-path from the seeds never appears; a frontier
    that drains early terminates the loop without error."""
    import ray.data

    from balrog_ray.functions.graph import bfs_levels

    # 0 -> 1 -> 2, and an isolated pair 10 -> 11
    eds = ray.data.from_arrow(pa.table(
        {"src": pa.array([0, 1, 10], pa.int64()),
         "dst": pa.array([1, 2, 11], pa.int64())}))
    sds = ray.data.from_arrow(pa.table({"node": pa.array([0], pa.int64())}))
    got = {r["node"]: r["dist"]
           for r in bfs_levels(eds, sds, max_hops=8,
                               num_partitions=2).take_all()}
    assert got == {0: 0, 1: 1, 2: 2}


def _numpy_triangles(src, dst):
    """Reference count: canonical a<b<c enumeration over the adjacency
    set."""
    und = {(min(s, d), max(s, d)) for s, d in zip(src, dst) if s != d}
    adj = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    cnt = 0
    for a, b in und:
        for c in adj[a] & adj[b]:
            if c > b:
                cnt += 1
    return cnt


def test_triangle_count_matches_numpy(ray_session):
    import ray.data

    from balrog_ray.functions.graph import triangle_count

    n = 97
    src, dst = _edges(n)
    eds = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    assert triangle_count(eds, num_partitions=3) == \
        _numpy_triangles(src, dst)


def test_triangle_count_path_parity(ray_session, monkeypatch):
    """Broadcast (wedge-partial) and distributed (join pipeline) paths
    must agree with the numpy oracle on the same irregular graph,
    including with several wedge chunks forced."""
    import ray.data

    from balrog_ray.functions import graph

    n = 151
    src, dst = _edges(n)
    eds = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    want = _numpy_triangles(src, dst)
    assert graph.triangle_count(eds, num_partitions=3) == want
    monkeypatch.setattr(graph, "_BROADCAST_MAX_EDGES", -1)
    eds2 = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    assert graph.triangle_count(eds2, num_partitions=3) == want


def test_triangle_count_dedup_and_selfloops(ray_session):
    """Parallel edges, reversed duplicates and self-loops collapse: one
    triangle plus noise counts exactly 1."""
    import ray.data

    from balrog_ray.functions.graph import triangle_count

    src = pa.array([0, 1, 2, 1, 0, 3, 3], pa.int64())
    dst = pa.array([1, 2, 0, 0, 1, 3, 0], pa.int64())
    eds = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    assert triangle_count(eds, num_partitions=2) == 1


def _dijkstra(n, wedges, seeds):
    """Scalar multi-source Dijkstra: dict node -> min dist."""
    import heapq
    adj = {}
    for s, d, w in wedges:
        adj.setdefault(s, []).append((d, w))
    dist = {s: 0 for s in seeds}
    h = [(0, s) for s in seeds]
    heapq.heapify(h)
    while h:
        du, u = heapq.heappop(h)
        if du > dist.get(u, 1 << 62):
            continue
        for v, w in adj.get(u, ()):
            nd = du + w
            if nd < dist.get(v, 1 << 62):
                dist[v] = nd
                heapq.heappush(h, (nd, v))
    return dist


def test_sssp_converged_matches_dijkstra(ray_session):
    """With rounds >= hop diameter the frontier Bellman-Ford equals
    Dijkstra exactly; unreachable nodes are absent."""
    import ray.data

    from balrog_ray.functions.graph import sssp

    rng = np.random.default_rng(5)
    n = 60
    wedges = []
    for u in range(40):                       # nodes 40..59 unreachable
        for v in rng.choice(40, size=3, replace=False):
            if v != u:
                wedges.append((u, int(v), int(rng.integers(1, 10))))
    eds = ray.data.from_arrow(pa.table({
        "src": pa.array([e[0] for e in wedges], pa.int64()),
        "dst": pa.array([e[1] for e in wedges], pa.int64()),
        "w": pa.array([e[2] for e in wedges], pa.int64())}))
    seeds = [0, 7]
    sds = ray.data.from_arrow(pa.table(
        {"node": pa.array(seeds + [0], pa.int64())}))  # dup seed row

    got = {r["node"]: r["dist"]
           for r in sssp(eds, sds, rounds=64,
                         num_partitions=3).take_all()}
    want = _dijkstra(n, wedges, seeds)
    assert got == want
    assert all(k < 40 for k in got)


def test_sssp_path_parity(ray_session, monkeypatch):
    """The driver-merged broadcast rounds and the distributed
    join+groupby loop must produce identical (node, dist) tables --
    converged AND capped mid-convergence."""
    import ray.data

    from balrog_ray.functions import graph

    rng = np.random.default_rng(11)
    wedges = []
    for u in range(50):
        for v in rng.choice(50, size=3, replace=False):
            if v != u:
                wedges.append((u, int(v), int(rng.integers(1, 9))))
    tab = pa.table({
        "src": pa.array([e[0] for e in wedges], pa.int64()),
        "dst": pa.array([e[1] for e in wedges], pa.int64()),
        "w": pa.array([e[2] for e in wedges], pa.int64())})
    sds = pa.table({"node": pa.array([3, 17], pa.int64())})

    for rounds in (2, 32):
        got_b = {r["node"]: r["dist"] for r in graph.sssp(
            ray.data.from_arrow(tab), ray.data.from_arrow(sds),
            rounds=rounds, num_partitions=2).take_all()}
        monkeypatch.setattr(graph, "_SSSP_BROADCAST_MAX", -1)
        got_d = {r["node"]: r["dist"] for r in graph.sssp(
            ray.data.from_arrow(tab), ray.data.from_arrow(sds),
            rounds=rounds, num_partitions=2).take_all()}
        monkeypatch.setattr(graph, "_SSSP_BROADCAST_MAX", 4_000_000)
        assert got_b == got_d, rounds


def test_sssp_capped_rounds_is_k_edge_fold(ray_session):
    """rounds=k must equal min dist over paths of <= k edges (the
    invariant the SQL oracle chain relies on)."""
    import ray.data

    from balrog_ray.functions.graph import sssp

    # a chain 0->1->2->3 (w=1 each) plus a heavy shortcut 0->3 (w=10):
    # k=1 sees dist(3)=10, k=3 sees dist(3)=3
    eds = ray.data.from_arrow(pa.table({
        "src": pa.array([0, 1, 2, 0], pa.int64()),
        "dst": pa.array([1, 2, 3, 3], pa.int64()),
        "w": pa.array([1, 1, 1, 10], pa.int64())}))
    sds = ray.data.from_arrow(pa.table({"node": pa.array([0], pa.int64())}))

    one = {r["node"]: r["dist"]
           for r in sssp(eds, sds, rounds=1, num_partitions=2).take_all()}
    assert one == {0: 0, 1: 1, 3: 10}
    three = {r["node"]: r["dist"]
             for r in sssp(eds, sds, rounds=3, num_partitions=2).take_all()}
    assert three == {0: 0, 1: 1, 2: 2, 3: 3}


def _kcore_bruteforce(pairs, k):
    E = set(pairs)
    while True:
        deg = {}
        for x, y in E:
            deg[x] = deg.get(x, 0) + 1
            deg[y] = deg.get(y, 0) + 1
        keep = {v for v, c in deg.items() if c >= k}
        E2 = {(x, y) for x, y in E if x in keep and y in keep}
        if len(E2) == len(E):
            return {v: c for v, c in deg.items() if c >= k}
        E = E2


def test_kcore_matches_bruteforce(ray_session):
    """Engine peel vs a sequential peel on an irregular graph with
    duplicates, reversed edges and self-loops thrown in -- the k-core
    fixed point is unique so they must agree exactly."""
    import ray.data

    from balrog_ray.functions.graph import kcore

    n = 60
    src, dst = [], []
    for i in range(n):
        for j in range(1, 1 + (i % 5)):
            src.append(i)
            dst.append((i * 11 + j * 17) % n)
    # noise: self-loops, duplicates, reversed duplicates
    src += [5, 7, 7, 12]
    dst += [5, 7, 3, 12]
    pairs = {(min(s, d), max(s, d)) for s, d in zip(src, dst) if s != d}

    eds = ray.data.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64())}))
    for k in (2, 3):
        want = _kcore_bruteforce(pairs, k)
        got = {int(r["node"]): int(r["deg"])
               for r in kcore(eds, k, num_partitions=3).take_all()}
        assert got == want


def test_kcore_path_parity(ray_session, monkeypatch):
    """Driver-peel (under the edge gate) and distributed peel must
    produce identical (node, deg) cores."""
    import ray.data

    from balrog_ray.functions import graph

    rng = np.random.default_rng(29)
    src_ = rng.integers(0, 80, 600).astype(np.int64)
    dst_ = rng.integers(0, 80, 600).astype(np.int64)
    tab = pa.table({"src": src_, "dst": dst_})
    got_b = {(r["node"], r["deg"]) for r in graph.kcore(
        ray.data.from_arrow(tab), 4, num_partitions=2).take_all()}
    monkeypatch.setattr(graph, "_BROADCAST_MAX_EDGES", -1)
    got_d = {(r["node"], r["deg"]) for r in graph.kcore(
        ray.data.from_arrow(tab), 4, num_partitions=2).take_all()}
    assert got_b == got_d and len(got_b) > 0


def test_kcore_empty_core(ray_session):
    """A tree has an empty 2-core: the peel must drain and return a
    typed empty result rather than erroring."""
    import ray.data

    from balrog_ray.functions.graph import kcore

    src = list(range(1, 32))
    dst = [i // 2 for i in src]
    eds = ray.data.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64())}))
    assert kcore(eds, 2, num_partitions=2).count() == 0


def test_kcore_round_budget_raises(ray_session):
    """A long path peels one layer per round from each end; with
    max_rounds too small the engine must refuse (the oracle replays a
    fixed budget, silence would desync them)."""
    import ray.data

    from balrog_ray.functions.graph import kcore

    src = list(range(0, 40))
    dst = [i + 1 for i in src]
    eds = ray.data.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64())}))
    with pytest.raises(RuntimeError, match="did not converge"):
        kcore(eds, 2, max_rounds=3, num_partitions=2)
