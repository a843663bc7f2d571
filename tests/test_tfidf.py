"""TF-IDF top-terms (functions/text.py) vs a driver-side numpy oracle.

The SQL twin (``tfidf_terms``) is the primary gate; this pins the exact
semantics on a corpus tiny enough to eyeball: df counting, ln(N/df)
scoring, (score desc, token asc) tie-break, max_df_frac stopword drop.
"""

import math

import numpy as np
import pyarrow as pa
import pytest

from balrog_ray.functions.text import term_freq_batch, tfidf_top_terms

CORPUS = [
    (1, "apple banana apple cherry"),
    (2, "banana cherry cherry date"),
    (3, "apple date date date"),
    (4, "elderberry"),
]


def _oracle(k=3, max_df_frac=1.0):
    n = len(CORPUS)
    tf = {}
    df = {}
    for doc, text in CORPUS:
        counts = {}
        for t in text.split(" "):
            counts[t] = counts.get(t, 0) + 1
        tf[doc] = counts
        for t in counts:
            df[t] = df.get(t, 0) + 1
    out = []
    for doc, counts in tf.items():
        scored = [(c * math.log(n / df[t]), t)
                  for t, c in counts.items() if df[t] <= max_df_frac * n]
        scored.sort(key=lambda st: (-st[0], st[1]))
        out.extend((doc, t, round(s, 6)) for s, t in scored[:k])
    return sorted(out)


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data

    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in CORPUS], pa.int64()),
        "text": pa.array([t for _, t in CORPUS])}))


def test_term_freq_batch():
    tab = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                    "text": ["a b a", "b"]})
    got = {(r["doc_id"], r["token"]): r["tf"]
           for r in term_freq_batch(tab).to_pylist()}
    assert got == {(1, "a"): 2, (1, "b"): 1, (2, "b"): 1}


def test_tfidf_matches_oracle(docs_ds):
    rows = tfidf_top_terms(docs_ds, k=3).take_all()
    got = sorted((r["doc_id"], r["token"], r["tfidf"]) for r in rows)
    assert got == _oracle(k=3)


def test_tfidf_max_df_drops_stopwords(docs_ds):
    # df(date)=2, df(apple)=df(banana)=df(cherry)=2, df(elderberry)=1:
    # max_df_frac=0.25 keeps only df=1 tokens
    rows = tfidf_top_terms(docs_ds, k=3, max_df_frac=0.25).take_all()
    got = sorted((r["doc_id"], r["token"], r["tfidf"]) for r in rows)
    assert got == _oracle(k=3, max_df_frac=0.25)
    assert all(t == "elderberry" for _, t, _ in got)


def test_tfidf_join_path_matches_broadcast(docs_ds):
    """broadcast_max_vocab=0 forces the token-keyed Dataset.join path;
    results must be identical to the broadcast path (same float64
    expression) -- including the max_df_frac stopword drop."""
    for frac in (1.0, 0.25):
        rows = tfidf_top_terms(docs_ds, k=3, max_df_frac=frac,
                               broadcast_max_vocab=0).take_all()
        got = sorted((r["doc_id"], r["token"], r["tfidf"]) for r in rows)
        assert got == _oracle(k=3, max_df_frac=frac)
