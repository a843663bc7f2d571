"""Incremental sharded-actor MinHash index: build over a corpus, probe
a new batch -- planted perturbed copies must hit their exact source doc,
disjoint-vocab fresh docs must miss, and the admit path must be
exactly-once (never self-matching within a batch, matching on re-probe).
"""

import numpy as np
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _corpus():
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/documents.parquet",
                      columns=["doc_id", "text"])
    return t.column("doc_id").to_pylist(), t.column("text").to_pylist()


@pytest.fixture(scope="module")
def index(ray_session):
    import ray.data

    from balrog_ray.functions.incremental import build_minhash_index

    corpus = ray.data.read_parquet(f"{SF_DIR}/documents.parquet",
                                   columns=["doc_id", "text"])
    return build_minhash_index(corpus, num_shards=4)


def _probe_table(index, ids, texts, **kw) -> pa.Table:
    import ray
    import ray.data

    from balrog_ray.functions.incremental import probe_minhash_index

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string())}))
    out = probe_minhash_index(index, ds, **kw)
    tabs = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(tabs) if tabs else pa.table(
        {"new_id": pa.array([], pa.int64()),
         "dup_of": pa.array([], pa.int64()),
         "est_e6": pa.array([], pa.int64())})


def test_perturbed_docs_hit_their_source(index):
    ids, texts = _corpus()
    new_ids, new_texts, want = [], [], {}
    for j in range(0, len(ids), 25):
        toks = texts[j].split(" ")
        toks[len(toks) // 2] = "zzqxj"
        nid = 1_000_000 + ids[j]
        new_ids.append(nid)
        new_texts.append(" ".join(toks))
        want[nid] = ids[j]
    got = _probe_table(index, new_ids, new_texts, threshold=0.5)
    matched = {}
    for r in got.to_pylist():
        # keep the best match per new doc
        if (r["new_id"] not in matched
                or r["est_e6"] > matched[r["new_id"]][1]):
            matched[r["new_id"]] = (r["dup_of"], r["est_e6"])
    for nid, src in want.items():
        assert nid in matched, f"perturbed copy of {src} not found"
        assert matched[nid][0] == src
        assert matched[nid][1] >= 500_000


def test_fresh_docs_miss(index):
    new_ids = [2_000_000 + j for j in range(10)]
    new_texts = [" ".join(f"qq{j}w{i}" for i in range(40))
                 for j in range(10)]
    got = _probe_table(index, new_ids, new_texts, threshold=0.5)
    assert got.num_rows == 0


def test_admit_is_exactly_once(ray_session):
    """A batch admitted with admit=True: no self/batchmate matches on
    the first probe, exact matches on the second probe of the same
    text."""
    import ray.data

    from balrog_ray.functions.incremental import build_minhash_index

    corpus = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["the quick brown fox jumps over a lazy dog "
                          * 4], pa.string())}))
    idx = build_minhash_index(corpus, num_shards=2)
    ids = [10, 11]
    texts = ["completely different content about ray data pipelines "
             * 4] * 2           # 10 and 11 are identical batchmates
    first = _probe_table(idx, ids, texts, threshold=0.9, admit=True)
    assert first.num_rows == 0          # admitted AFTER verdicts
    second = _probe_table(idx, [12], [texts[0]], threshold=0.9)
    got = sorted(second.column("dup_of").to_pylist())
    assert got == [10, 11]
    assert all(e == 1_000_000 for e in second.column("est_e6").to_pylist())


def test_save_kill_load_is_byte_identical(ray_session, tmp_path):
    """Kill-and-rebuild: save the index, KILL every shard actor, restore
    from the snapshot -- the restored index must yield byte-identical
    probe verdicts AND admit decisions to the uninterrupted run
    (VERDICT r3 item 5: ingest-dedup survives a driver restart)."""
    import ray
    import ray.data

    from balrog_ray.functions.incremental import (build_minhash_index,
                                                  load_minhash_index)

    def canon(t: pa.Table):
        return sorted(zip(t.column("new_id").to_pylist(),
                          t.column("dup_of").to_pylist(),
                          t.column("est_e6").to_pylist()))

    ids, texts = _corpus()
    probe_ids, probe_texts = [], []
    for j in range(0, len(ids), 25):
        toks = texts[j].split(" ")
        toks[len(toks) // 2] = "zzqxj"
        probe_ids.append(1_000_000 + ids[j])
        probe_texts.append(" ".join(toks))

    def build():
        corpus = ray.data.read_parquet(
            f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
        return build_minhash_index(corpus, num_shards=4)

    # uninterrupted control: probe + admit + re-probe
    control = build()
    c1 = canon(_probe_table(control, probe_ids, probe_texts,
                            threshold=0.5, admit=True))
    c2 = canon(_probe_table(control, [9_999_999], [probe_texts[0]],
                            threshold=0.5))

    # save BEFORE any admits, kill, restore, replay the same sequence
    subject = build()
    snap = str(tmp_path / "mh_index")
    subject.save(snap)
    stats_before = subject.stats()
    for s in subject.shards:
        ray.kill(s)
    restored = load_minhash_index(snap)
    assert restored.stats() == stats_before
    assert (restored.num_shards, restored.n_perm, restored.bands,
            restored.k) == (subject.num_shards, subject.n_perm,
                            subject.bands, subject.k)
    r1 = canon(_probe_table(restored, probe_ids, probe_texts,
                            threshold=0.5, admit=True))
    r2 = canon(_probe_table(restored, [9_999_999], [probe_texts[0]],
                            threshold=0.5))
    assert r1 == c1 and r2 == c2 and len(c1) > 0 and len(c2) > 0


def test_load_refuses_uncommitted_snapshot(ray_session, tmp_path):
    import pytest as _pytest

    from balrog_ray.functions.incremental import load_minhash_index

    d = tmp_path / "partial"
    d.mkdir()
    (d / "shard-0000.parquet").write_bytes(b"garbage")
    with _pytest.raises(FileNotFoundError):
        load_minhash_index(str(d))


def test_rows_only_query_runs(ray_session):
    from balrog_ray.relational.rows_only import q_incremental_dedup_docs

    import ray

    out = q_incremental_dedup_docs(SF_DIR)
    tabs = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    t = pa.concat_tables(tabs)
    # 20 planted perturbations at sf0.001 (500 docs / 25); every one
    # must match its source, fresh docs contribute nothing
    src = t.column("dup_of").to_numpy()
    new = t.column("new_id").to_numpy()
    planted = new >= 2_000_000
    assert not planted.any()
    hits = {int(n) - 1_000_000 for n, s in zip(new, src)
            if int(n) - 1_000_000 == int(s)}
    assert len(hits) == 20
