"""DSIR hashed-bigram importance weights vs a single-process oracle."""

import numpy as np
import pytest

from balrog_ray.functions.dsir import (bucket_counts, doc_buckets,
                                       dsir_weights)

LEGAL = ["the party of the first part hereby agrees to the terms",
         "whereas the contract terms bind the party of record",
         "the terms herein govern the party obligations hereby"]
CHAT = ["lol that movie was so good haha",
        "omg did you see the game last night so wild",
        "haha yeah totally going again tomorrow lol"]


def ref_weights(docs, target, n_buckets):
    import math

    ct = np.zeros(n_buckets, np.int64)
    for t in target:
        g = doc_buckets(t, n_buckets)
        if len(g):
            ct += np.bincount(g, minlength=n_buckets)
    cr = np.zeros(n_buckets, np.int64)
    for t in docs:
        g = doc_buckets(t, n_buckets)
        if len(g):
            cr += np.bincount(g, minlength=n_buckets)
    tt = int(ct.sum()) + n_buckets
    tr = int(cr.sum()) + n_buckets
    ratio = (np.log((ct + 1).astype(np.float64) / float(tt))
             - np.log((cr + 1).astype(np.float64) / float(tr)))
    out = []
    for t in docs:
        g = doc_buckets(t, n_buckets)
        out.append(round(float(np.sum(ratio[g]) / len(g)), 6)
                   if len(g) else 0.0)
    return out


def test_doc_buckets_edges():
    assert len(doc_buckets("", 64)) == 0
    assert len(doc_buckets("word", 64)) == 1        # unigram fallback
    assert len(doc_buckets("two words here", 64)) == 2
    assert doc_buckets("a b c", 64).max() < 64


@pytest.mark.usefixtures("ray_session")
def test_weights_match_oracle_and_separate_domains():
    import pyarrow as pa
    import ray.data

    docs = LEGAL + CHAT
    B = 512
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string())}))
    tgt = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(LEGAL)), pa.int64()),
        "text": pa.array(LEGAL, pa.string())}))
    got = {r["doc_id"]: r["weight"] for r in
           dsir_weights(ds.repartition(3), tgt, n_buckets=B).take_all()}
    want = ref_weights(docs, LEGAL, B)
    for i, w in enumerate(want):
        assert got[i] == w, i
    # every legal doc outscores every chat doc toward the legal target
    assert min(want[:len(LEGAL)]) > max(want[len(LEGAL):])


@pytest.mark.usefixtures("ray_session")
def test_bucket_counts_distributed_fold_exact():
    import pyarrow as pa
    import ray.data

    docs = (LEGAL + CHAT) * 5
    B = 256
    ds = ray.data.from_arrow(pa.table({"text": pa.array(docs)}))
    a = bucket_counts(ds, n_buckets=B)
    b = bucket_counts(ds.repartition(7), n_buckets=B)
    assert np.array_equal(a, b)
    assert a.sum() == sum(max(len(t.split()) - 1, 1) for t in docs)
