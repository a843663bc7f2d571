"""Distributed DBSCAN vs a brute-force oracle implementing the exact
documented semantics (self-inclusive min_pts, min-id cluster labels,
smallest-cluster border attachment)."""

import numpy as np
import pyarrow as pa
import pytest

from balrog_ray.stages.dbscan import dbscan


def _brute_dbscan(ids, x, y, eps, min_pts):
    n = len(ids)
    d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
    close = d2 <= eps * eps
    deg = close.sum(axis=1)                 # includes self
    core = deg >= min_pts
    # components over core-core eps edges, label = min member id
    parent = {i: i for i in range(n) if core[i]}

    def find(i):
        while parent[i] != i:
            i = parent[i]
        return i

    for i in range(n):
        if not core[i]:
            continue
        for j in range(i + 1, n):
            if core[j] and close[i, j]:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    members = {}
    for i in range(n):
        if core[i]:
            members.setdefault(find(i), []).append(i)
    label = {}
    for root, mem in members.items():
        cl = min(ids[m] for m in mem)
        for m in mem:
            label[m] = cl
    out = {}
    for i in range(n):
        if core[i]:
            out[ids[i]] = ("core", label[i])
        else:
            cands = [label[j] for j in range(n)
                     if core[j] and close[i, j]]
            out[ids[i]] = ("border", min(cands)) if cands \
                else ("noise", "")
    return out


@pytest.mark.parametrize("seed,eps,min_pts", [(1, 6.0, 4), (2, 9.0, 3),
                                              (3, 4.0, 5)])
def test_dbscan_matches_brute_force(ray_session, seed, eps, min_pts):
    import ray.data

    rng = np.random.default_rng(seed)
    # three planted blobs + uniform noise, coordinates spanning many
    # eps-cells so cross-cell pairs are load-bearing
    blobs = [rng.normal(c, 2.5, (25, 2))
             for c in ((10, 10), (60, 15), (35, 55))]
    noise = rng.uniform(0, 80, (30, 2))
    pts = np.vstack(blobs + [noise])
    ids = np.array([f"p{i:04d}" for i in range(len(pts))])
    tab = pa.table({"site_id": ids.tolist(),
                    "x": pts[:, 0], "y": pts[:, 1]})
    got = {r["site_id"]: (r["role"], r["cluster_id"])
           for r in dbscan(ray.data.from_arrow(tab), eps=eps,
                           min_pts=min_pts).take_all()}
    want = _brute_dbscan(ids, pts[:, 0], pts[:, 1], eps, min_pts)
    assert len(got) == len(ids)
    diffs = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not diffs, list(diffs.items())[:5]
    roles = {r for r, _ in want.values()}
    assert roles == {"core", "border", "noise"}, \
        "test must exercise all three roles"


def test_dbscan_all_noise(ray_session):
    import ray.data

    tab = pa.table({"site_id": ["a", "b"], "x": [0.0, 100.0],
                    "y": [0.0, 100.0]})
    got = dbscan(ray.data.from_arrow(tab), eps=1.0,
                 min_pts=2).take_all()
    assert all(r["role"] == "noise" and r["cluster_id"] == ""
               for r in got)
    assert len(got) == 2


def test_dbscan_wide_partitions_sparse(ray_session):
    """num_partitions > 8 with near-empty data: the per-partition
    sentinel count must follow the partition count (regression for the
    fixed-8 sentinel bug that reintroduced schema-less empty blocks)."""
    import ray.data

    tab = pa.table({"site_id": ["a", "b", "c"],
                    "x": [0.0, 0.5, 100.0], "y": [0.0, 0.0, 100.0]})
    got = {r["site_id"]: r["role"]
           for r in dbscan(ray.data.from_arrow(tab), eps=1.0, min_pts=2,
                           num_partitions=16).take_all()}
    assert got == {"a": "core", "b": "core", "c": "noise"}
