"""_sidecar_join property tests: the keyed-fold inner attach must match
a pandas merge for arbitrary fact/dim shapes -- ESPECIALLY the sparse
shapes that crash ray 2.49's Dataset.join (empty blocks first in
submission order, single-row sides, empty overlap, duplicate fact
keys).  Sizes are kept small; the point is shape coverage, not scale."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

CASES = [
    # (fact_keys, fact_vals, dim_keys) -- dim keys unique by contract
    ([7], [70], list(range(100))),                     # 1-row fact
    ([], [], [1, 2, 3]),                               # empty fact
    ([1, 2, 3], [10, 20, 30], []),                     # empty dim
    ([5, 5, 5, 9], [1, 2, 3, 4], [5]),                 # dup fact keys
    (list(range(50)), list(range(50)), [2, 4, 999]),   # sparse overlap
    ([10, 11], [1, 2], [99, 98]),                      # no overlap
]


def _expected(fk, fv, dk):
    f = pd.DataFrame({"k": fk, "v": fv})
    d = pd.DataFrame({"k": dk, "name": [f"n{x}" for x in dk]})
    m = f.merge(d, on="k", how="inner")
    return sorted(map(tuple, m[["k", "v", "name"]].values.tolist()))


@pytest.mark.parametrize("fk,fv,dk", CASES)
def test_sidecar_matches_pandas_merge(ray_session, fk, fv, dk):
    import ray
    import ray.data

    from balrog_ray.relational.queries import _sidecar_join

    fact_tab = pa.table({"k": pa.array(fk, pa.int64()),
                         "v": pa.array(fv, pa.int64())})
    # split the fact into blocks WITH leading empties -- the exact
    # submission shape that loses ray's join schema broadcast
    e = pa.table({"k": pa.array([], pa.int64()),
                  "v": pa.array([], pa.int64())})
    refs = [ray.put(e), ray.put(e)]
    step = max(1, fact_tab.num_rows // 2)
    for i in range(0, max(fact_tab.num_rows, 1), step):
        refs.append(ray.put(fact_tab.slice(i, step)))
    fact = ray.data.from_arrow_refs(refs)
    dim_tab = pa.table({
        "k": pa.array(dk, pa.int64()),
        "name": pa.array([f"n{x}" for x in dk], pa.string())})
    out = _sidecar_join(fact, ray.data.from_arrow(dim_tab), key="k",
                        fact_schema=fact_tab.schema,
                        dim_schema=dim_tab.schema, width=4)
    rows = sorted((r["k"], r["v"], r["name"]) for r in out.take_all())
    assert rows == _expected(fk, fv, dk)


def test_sidecar_random_shapes(ray_session):
    import ray.data

    from balrog_ray.relational.queries import _sidecar_join

    rng = np.random.default_rng(11)
    for _ in range(3):
        n_f = int(rng.integers(0, 200))
        n_d = int(rng.integers(1, 60))
        fk = rng.integers(0, 40, n_f).tolist()
        fv = rng.integers(0, 1000, n_f).tolist()
        dk = rng.choice(100, size=n_d, replace=False).tolist()
        fact_tab = pa.table({"k": pa.array(fk, pa.int64()),
                             "v": pa.array(fv, pa.int64())})
        dim_tab = pa.table({
            "k": pa.array(dk, pa.int64()),
            "name": pa.array([f"n{x}" for x in dk], pa.string())})
        out = _sidecar_join(
            ray.data.from_arrow(fact_tab),
            ray.data.from_arrow(dim_tab), key="k",
            fact_schema=fact_tab.schema, dim_schema=dim_tab.schema,
            width=3)
        rows = sorted((r["k"], r["v"], r["name"])
                      for r in out.take_all())
        assert rows == _expected(fk, fv, dk)
