"""Interval (range) join vs a brute-force O(n*m) oracle: exactly-once
band semantics, left-join zero counts, negative/positive window offsets,
string keys."""

import numpy as np
import pyarrow as pa
import pytest

from balrog_ray.stages.range_join import (interval_count_join,
                                          interval_join_pairs)


def _mk(rng, n, keys, t_max):
    return {
        "key": rng.choice(keys, size=n).tolist(),
        "ts": rng.integers(0, t_max, size=n).tolist(),
        "id": list(range(n)),
    }


def brute_counts(p, b, lo, hi):
    out = {}
    for pid, pk, pt in zip(p["id"], p["key"], p["ts"]):
        out[pid] = sum(1 for bk, bt in zip(b["key"], b["ts"])
                       if bk == pk and pt + lo <= bt < pt + hi)
    return out


def brute_pairs(p, b, lo, hi):
    return {(pid, bid)
            for pid, pk, pt in zip(p["id"], p["key"], p["ts"])
            for bid, bk, bt in zip(b["id"], b["key"], b["ts"])
            if bk == pk and pt + lo <= bt < pt + hi}


@pytest.mark.parametrize("merge_max", [4_000_000, None])
@pytest.mark.parametrize("lo,hi", [(-500, 0), (0, 300), (-250, 250),
                                   (100, 101)])
def test_interval_count_vs_brute(ray_session, lo, hi, merge_max):
    # merge_max=None forces the distributed per-probe rollup; the
    # default exercises the output-bounded driver merge
    import ray.data

    rng = np.random.default_rng(11)
    p = _mk(rng, 200, ["a", "b", "c"], 2000)
    b = _mk(rng, 300, ["a", "b", "c", "d"], 2000)
    got = interval_count_join(
        ray.data.from_arrow(pa.table(p)), ray.data.from_arrow(pa.table(b)),
        probe_key="key", build_key="key", probe_ts="ts", build_ts="ts",
        lo_us=lo, hi_us=hi, probe_id="id", out_col="n",
        driver_merge_max=merge_max).take_all()
    want = brute_counts(p, b, lo, hi)
    assert {r["id"]: r["n"] for r in got} == want
    assert len(got) == len(p["id"])            # zero-count rows kept


def test_interval_pairs_vs_brute(ray_session):
    import ray.data

    rng = np.random.default_rng(13)
    p = _mk(rng, 120, [1, 2, 3], 1000)
    b = _mk(rng, 180, [1, 2, 3, 4], 1000)
    lo, hi = -128, 64                          # window straddles bands
    got = interval_join_pairs(
        ray.data.from_arrow(pa.table(p)), ray.data.from_arrow(pa.table(b)),
        probe_key="key", build_key="key", probe_ts="ts", build_ts="ts",
        lo_us=lo, hi_us=hi, probe_id="id", build_id="id").take_all()
    pairs = [(r["probe_id"], r["build_id"]) for r in got]
    assert len(pairs) == len(set(pairs))       # exactly-once, no dedup pass
    assert set(pairs) == brute_pairs(p, b, lo, hi)


def test_interval_rejects_empty_window(ray_session):
    import ray.data

    ds = ray.data.from_arrow(pa.table({"key": [1], "ts": [0], "id": [0]}))
    with pytest.raises(ValueError):
        interval_count_join(ds, ds, probe_key="key", build_key="key",
                            probe_ts="ts", build_ts="ts", lo_us=5, hi_us=5,
                            probe_id="id")
