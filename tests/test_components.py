"""connected_components / dedup_survivors vs a brute-force BFS oracle."""

import numpy as np
import pyarrow as pa

from balrog_ray.functions.components import (connected_components,
                                             dedup_survivors)


def _bfs_components(edges):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seen, comp = {}, {}
    for start in adj:
        if start in seen:
            continue
        stack, members = [start], []
        seen[start] = True
        while stack:
            v = stack.pop()
            members.append(v)
            for w in adj[v]:
                if w not in seen:
                    seen[w] = True
                    stack.append(w)
        root = min(members)
        for m in members:
            comp[m] = root
    return comp


def test_components_match_bfs_random_graph(ray_session):
    import ray.data

    rng = np.random.default_rng(11)
    edges = set()
    # several chains/cliques + random noise edges over 200 nodes
    for base in range(0, 200, 25):
        for i in range(4):
            edges.add((base + i, base + i + 1))
    for _ in range(60):
        a, b = rng.integers(0, 200, size=2)
        if a != b:
            edges.add((int(min(a, b)), int(max(a, b))))
    edges = sorted(edges)
    want = _bfs_components(edges)

    tbl = pa.table({"id_a": pa.array([a for a, _ in edges], pa.int64()),
                    "id_b": pa.array([b for _, b in edges], pa.int64())})
    for levels in (2, 3):
        got = connected_components(
            ray.data.from_arrow(tbl).repartition(7),
            levels=levels).take_all()
        got_map = {r["doc_id"]: r["component_id"] for r in got}
        assert got_map == want


def test_components_string_ids_and_empty(ray_session):
    import ray.data

    tbl = pa.table({"id_a": pa.array(["a", "b", "x"], pa.string()),
                    "id_b": pa.array(["b", "c", "y"], pa.string())})
    got = connected_components(ray.data.from_arrow(tbl)).take_all()
    got_map = {r["doc_id"]: r["component_id"] for r in got}
    assert got_map == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}

    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64())})
    assert connected_components(ray.data.from_arrow(empty)).count() == 0


def test_dedup_survivors(ray_session):
    import ray.data

    # docs 0..9; dup pairs chain 1-2-3 and pair 7-8
    docs = pa.table({"doc_id": pa.array(range(10), pa.int64()),
                     "payload": pa.array([f"d{i}" for i in range(10)])})
    pairs = pa.table({"id_a": pa.array([1, 2, 7], pa.int64()),
                      "id_b": pa.array([2, 3, 8], pa.int64())})
    comp = connected_components(ray.data.from_arrow(pairs))
    out = dedup_survivors(ray.data.from_arrow(docs), comp).take_all()
    kept = sorted(r["doc_id"] for r in out)
    # victims: 2, 3 (component min 1), 8 (component min 7)
    assert kept == [0, 1, 4, 5, 6, 7, 9]
    assert {r["payload"] for r in out} == {f"d{i}" for i in kept}
