"""pack_sequences: every chunk packed exactly once, no sequence over
budget, FFD fill beats the trivial one-chunk-per-sequence floor, and
determinism across repartitions."""

import numpy as np
import pyarrow as pa
import pytest

from balrog_ray.functions.packing import pack_sequences, packing_stats


def _chunks_table(rng, n_docs=60):
    rows_d, rows_c, rows_l = [], [], []
    for d in range(n_docs):
        for c in range(int(rng.integers(1, 6))):
            rows_d.append(d)
            rows_c.append(c)
            rows_l.append(int(rng.integers(16, 256)))
    return pa.table({"doc_id": pa.array(rows_d, pa.int64()),
                     "chunk_id": pa.array(rows_c, pa.int64()),
                     "n_tok": pa.array(rows_l, pa.int64())})


def test_pack_exactly_once_within_budget(ray_session):
    import ray.data

    rng = np.random.default_rng(9)
    tab = _chunks_table(rng)
    budget = 512
    packed = pack_sequences(ray.data.from_arrow(tab).repartition(5),
                            budget=budget, n_shards=4).take_all()
    assert len(packed) == tab.num_rows
    assert ({(r["doc_id"], r["chunk_id"]) for r in packed}
            == set(zip(tab.column("doc_id").to_pylist(),
                       tab.column("chunk_id").to_pylist())))
    fill: dict = {}
    for r in packed:
        fill[(r["shard"], r["seq_id"])] = \
            fill.get((r["shard"], r["seq_id"]), 0) + r["n_tok"]
    assert all(v <= budget for v in fill.values())
    # FFD must do meaningfully better than one chunk per sequence
    assert len(fill) < tab.num_rows * 0.6
    # determinism across block layouts
    packed2 = pack_sequences(ray.data.from_arrow(tab).repartition(11),
                             budget=budget, n_shards=4).take_all()
    key = lambda r: (r["shard"], r["doc_id"], r["chunk_id"], r["seq_id"])
    assert sorted(map(key, packed)) == sorted(map(key, packed2))


def test_pack_stats_and_oversize(ray_session):
    import ray.data

    tab = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                    "chunk_id": pa.array([0, 0], pa.int64()),
                    "n_tok": pa.array([100, 9999], pa.int64())})
    with pytest.raises(Exception, match="exceeds the packing budget"):
        pack_sequences(ray.data.from_arrow(tab),
                       budget=512).materialize()

    rng = np.random.default_rng(2)
    good = _chunks_table(rng, n_docs=30)
    packed = pack_sequences(ray.data.from_arrow(good), budget=512)
    row = packing_stats(packed, budget=512)
    assert row["n_chunks"] == good.num_rows
    assert row["n_tokens"] == int(good.column("n_tok").to_numpy().sum())
    assert row["over_budget"] == 0
    assert row["n_seq"] >= -(-row["n_tokens"] // 512)   # >= LP lower bound


def test_curate_corpus_funnel(ray_session):
    """Composite curation chain: monotone funnel, exact conservation
    (tokens in surviving docs == tokens packed), zero over-budget."""
    from balrog_ray.relational.rows_only import q_curate_corpus

    t = q_curate_corpus("/root/testdata/sf0.001")
    row = {c: t.column(c)[0].as_py() for c in t.column_names}
    assert (row["docs_in"] >= row["after_quality"]
            >= row["after_langid"] >= row["after_exact_dedup"]
            >= row["after_neardup"] > 0)
    assert row["over_budget"] == 0
    assert row["n_chunks"] >= row["after_neardup"]   # >=1 chunk per doc
    assert row["n_seq"] * 512 >= row["n_tokens"]     # budget arithmetic
