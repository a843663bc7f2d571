"""DSIR-style importance weights for data selection (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling" -- the
published hashed-ngram method; the distributed layout below is
original).

Each document scores

    weight = (1 / |G|) * sum_{g in G} log(p_target[g] / p_raw[g])

over its word-bigram hash buckets ``G`` (FNV-1a token hashes, rolling
bigram combine, mod ``n_buckets``), where ``p_target`` is estimated on
a target-domain corpus and ``p_raw`` on the full corpus, both with
add-one smoothing.  High weight = looks like the target domain;
importance resampling then keeps documents with probability
proportional to the weight (the caller's policy -- this module emits
the weights).

Scale shape: the model state is TWO fixed ``n_buckets``-long int64
count vectors however large the corpus is.  Counting is one vectorized
``map_batches`` emitting per-block ``(bucket, n)`` partials (bincount
-- the combiner rule) + one bucket-keyed ``groupby().sum`` per corpus;
the scoring pass is stateless ``map_batches`` with the two log-prob
vectors in the closure (~64 KB broadcast once per task).  All counts
are int64, so weights are bit-deterministic under any block layout
(single-process oracle: tests/test_dsir.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .text import _FP_BASE, token_hashes, whitespace_tokens


def doc_buckets(text: str, n_buckets: int) -> np.ndarray:
    """Word-bigram hash buckets of a document (int64 in [0, B));
    single-token docs fall back to the unigram hash, empty docs to
    no buckets."""
    toks = [t for t in whitespace_tokens(text or "") if t]
    h = token_hashes(toks)
    if len(h) >= 2:
        with np.errstate(over="ignore"):
            h = h[:-1] * _FP_BASE + h[1:]
    return (h % np.uint64(n_buckets)).astype(np.int64)


def bucket_counts(ds, *, text_col: str = "text",
                  n_buckets: int = 4096) -> np.ndarray:
    """int64[n_buckets] corpus bucket counts, computed distributed."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        acc = np.zeros(n_buckets, np.int64)
        for t in b.column(text_col).to_pylist():
            g = doc_buckets(t, n_buckets)
            if len(g):
                acc += np.bincount(g, minlength=n_buckets)
        nz = np.flatnonzero(acc)
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "n": pa.array(acc[nz], pa.int64())})

    rows = (ds.select_columns([text_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("bucket")
            .aggregate(Sum("n", alias_name="n"))
            .take_all())
    out = np.zeros(n_buckets, np.int64)
    for r in rows:
        out[int(r["bucket"])] = int(r["n"])
    return out


def _log_probs(counts: np.ndarray) -> np.ndarray:
    tot = int(counts.sum()) + len(counts)         # add-one smoothing
    return np.log((counts + 1).astype(np.float64) / float(tot))


def dsir_weights(docs_ds, target_ds, *, text_col: str = "text",
                 id_col: str = "doc_id", n_buckets: int = 4096):
    """Dataset of (id_col, n_grams, weight): per-document importance
    weight of ``docs_ds`` toward the domain exemplified by
    ``target_ds``.  Documents with no bigrams weigh 0.0."""
    lp_t = _log_probs(bucket_counts(target_ds, text_col=text_col,
                                    n_buckets=n_buckets))
    lp_r = _log_probs(bucket_counts(docs_ds, text_col=text_col,
                                    n_buckets=n_buckets))
    ratio = lp_t - lp_r

    def score(b: pa.Table) -> pa.Table:
        ws, ns = [], []
        for t in b.column(text_col).to_pylist():
            g = doc_buckets(t, n_buckets)
            ns.append(len(g))
            ws.append(round(float(np.sum(ratio[g]) / len(g)), 6)
                      if len(g) else 0.0)
        return pa.table({id_col: b.column(id_col),
                         "n_grams": pa.array(ns, pa.int64()),
                         "weight": pa.array(ws, pa.float64())})

    return docs_ds.map_batches(score, batch_format="pyarrow")
