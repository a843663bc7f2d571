"""partitions.keyed_fold: the complete-groups-per-call guarantee the
helper's callers (large_orders, cheapest_supplier_per_part,
late_sole_supplier, segment_dedup_docs, knn_graph, ...) rely on -- a key
must never straddle two fold_fn invocations -- plus context-flip
isolation (sibling plans keep the default sort strategy)."""

import numpy as np
import pyarrow as pa


def test_keys_never_straddle_fold_calls(ray_session):
    import ray
    import ray.data

    from balrog_ray.partitions import keyed_fold

    rng = np.random.default_rng(5)
    keys = rng.integers(0, 1000, size=20_000)
    vals = rng.integers(0, 100, size=20_000)
    ds = ray.data.from_arrow(pa.table({
        "k": pa.array(keys, pa.int64()),
        "v": pa.array(vals, pa.int64())})).repartition(16)

    def fold(b: pa.Table) -> pa.Table:
        g = b.group_by(["k"]).aggregate([("v", "sum"), ([], "count_all")])
        return pa.table({"k": g.column("k"),
                         "s": g.column("v_sum"),
                         "n": g.column("count_all")})

    out = pa.concat_tables([t for t in ray.get(
        keyed_fold(ds, ["k"], fold, num_partitions=8).to_arrow_refs())
        if t.num_rows])
    got_k = out.column("k").to_numpy()
    # every key exactly once across ALL fold outputs => no straddling
    assert len(got_k) == len(np.unique(keys))
    assert len(np.unique(got_k)) == len(got_k)
    # and the per-key sums/counts are globally correct in one pass
    import collections
    want_n = collections.Counter(keys.tolist())
    want_s = collections.defaultdict(int)
    for k, v in zip(keys.tolist(), vals.tolist()):
        want_s[k] += v
    for k, s, n in zip(got_k.tolist(), out.column("s").to_pylist(),
                       out.column("n").to_pylist()):
        assert n == want_n[k] and s == want_s[k]


def test_context_flip_is_per_plan(ray_session):
    import ray.data
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    from balrog_ray.partitions import keyed_fold

    before = DataContext.get_current().shuffle_strategy
    ds = ray.data.range(100)

    def ident(b: pa.Table) -> pa.Table:
        return b

    folded = keyed_fold(ds, ["id"], ident, num_partitions=2)
    # the flip lives on the plan's captured context ...
    assert folded.context.shuffle_strategy == ShuffleStrategy.HASH_SHUFFLE
    # ... not on the process-global one, nor on sibling plans
    assert DataContext.get_current().shuffle_strategy == before
    sibling = ray.data.range(10)
    assert sibling.context.shuffle_strategy == before
    assert folded.count() == 100
