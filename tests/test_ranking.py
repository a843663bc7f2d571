"""global_ranks: total-order row numbers vs a numpy lexsort oracle;
ntile_of_ranks vs SQL ntile semantics."""

import numpy as np
import pyarrow as pa

from balrog_ray.stages.ranking import global_ranks, ntile_of_ranks


def test_global_ranks_total_and_partitioned(ray_session):
    import ray.data

    rng = np.random.default_rng(3)
    n = 5000
    key = rng.choice(["a", "b", "c"], size=n)
    val = rng.integers(0, 400, size=n)      # many ties -> id break matters
    rid = rng.permutation(n)
    tab = pa.table({"k": pa.array(key), "v": pa.array(val, pa.int64()),
                    "id": pa.array(rid, pa.int64())})
    ds = ray.data.from_arrow(tab).repartition(9)

    out = global_ranks(ds, ["k", "v", "id"], rank_col="r").take_all()
    got = {row["id"]: row["r"] for row in out}
    order = np.lexsort((rid, val, key))
    for rank0, i in enumerate(order):
        assert got[rid[i]] == rank0 + 1

    outp = global_ranks(ds, ["k", "v", "id"], rank_col="r",
                        partition_col="k").take_all()
    gotp = {row["id"]: row["r"] for row in outp}
    expect = {}
    for kv in ("a", "b", "c"):
        sel = np.where(key == kv)[0]
        sub = sel[np.lexsort((rid[sel], val[sel]))]
        for rank0, i in enumerate(sub):
            expect[rid[i]] = rank0 + 1
    assert gotp == expect


def test_global_ranks_requires_leading_partition_key(ray_session):
    import pytest
    import ray.data

    ds = ray.data.from_arrow(pa.table({"a": [1], "b": [2]}))
    with pytest.raises(ValueError):
        global_ranks(ds, ["b", "a"], partition_col="a")


def test_ntile_matches_duckdb():
    import duckdb

    for n, k in ((10, 4), (8, 4), (3, 4), (1, 4), (100, 7), (6, 6)):
        ranks = np.arange(1, n + 1, dtype=np.int64)
        got = ntile_of_ranks(ranks, np.full(n, n, dtype=np.int64), k)
        want = duckdb.sql(
            f"select ntile({k}) over (order by r) from "
            f"(select unnest(range(1, {n + 1})) as r)").fetchnumpy()
        want = next(iter(want.values())).astype(np.int64)
        np.testing.assert_array_equal(got, want)


def test_global_ranks_join_path_matches_broadcast(ray_session):
    """broadcast_partitions=0 forces the high-cardinality hash-join
    path; ranks must equal the broadcast path exactly."""
    import ray.data

    rng = np.random.default_rng(11)
    n = 2000
    key = rng.integers(0, 200, size=n)      # 200 partitions
    val = rng.integers(0, 50, size=n)
    rid = rng.permutation(n)
    tab = pa.table({"k": pa.array(key, pa.int64()),
                    "v": pa.array(val, pa.int64()),
                    "id": pa.array(rid, pa.int64())})
    ds = ray.data.from_arrow(tab).repartition(7)

    bc = {r["id"]: r["r"]
          for r in global_ranks(ds, ["k", "v", "id"], rank_col="r",
                                partition_col="k").take_all()}
    jn = {r["id"]: r["r"]
          for r in global_ranks(ds, ["k", "v", "id"], rank_col="r",
                                partition_col="k",
                                broadcast_partitions=0).take_all()}
    assert jn == bc and len(jn) == n
