"""Distributed logistic regression vs a single-process oracle running the
identical math (same standardization, clip, l2, iteration count) on the
whole feature matrix at once, plus an end-to-end signal check: the model
must actually separate the labeled classes."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from balrog_ray.functions.classifier import (_sigmoid, logreg_score,
                                             logreg_train)
from balrog_ray.functions.text import quality_batch

SF_DIR = "/root/testdata/sf0.001"
FEATURES = ["n_tokens", "n_bpe_tokens", "avg_token_len",
            "stopword_ratio", "punct_ratio"]


def _featurized_table() -> pa.Table:
    """Weak-supervision label (the CCNet setup: a cheap rule labels the
    data, the classifier generalizes it): a CONJUNCTION of feature
    thresholds, deliberately not linearly separable."""
    docs = pq.read_table(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    t = quality_batch(docs)
    nt = t.column("n_tokens").to_numpy()
    sr = t.column("stopword_ratio").to_numpy()
    label = pa.array(((nt >= 50) & (sr >= 0.05)).astype(np.int64))
    return t.append_column("label", label).drop_columns(["text"])


def _oracle_train(tab: pa.Table, iters: int, lr: float, l2: float):
    X = np.stack([tab.column(c).to_numpy().astype(np.float64)
                  for c in FEATURES], axis=1)
    y = tab.column("label").to_numpy().astype(np.float64)
    mean = X.mean(axis=0)
    std = np.sqrt(np.maximum((X * X).mean(axis=0) - mean ** 2, 0.0))
    std[std == 0.0] = 1.0
    Xs = (X - mean) / std
    k = X.shape[1]
    w = np.zeros(k + 1)
    for _ in range(iters):
        p = _sigmoid(Xs @ w[:k] + w[k])
        r = p - y
        grad = np.concatenate([Xs.T @ r, [r.sum()]]) / len(y)
        grad[:k] += l2 * w[:k]
        w = w - lr * grad
    return mean, std, w


@pytest.fixture(scope="module")
def feat_ds(ray_session):
    import ray.data

    # several small blocks so the ordered fold is actually exercised
    return ray.data.from_arrow(_featurized_table()).repartition(7)


def test_train_matches_single_process(ray_session, feat_ds):
    model = logreg_train(feat_ds, FEATURES, "label",
                         iters=30, lr=0.5, l2=1e-4)
    mean, std, w = _oracle_train(_featurized_table(), 30, 0.5, 1e-4)
    np.testing.assert_allclose(model["mean"], mean, rtol=1e-9)
    np.testing.assert_allclose(model["std"], std, rtol=1e-9)
    np.testing.assert_allclose(model["weights"], w, rtol=1e-6, atol=1e-9)


def test_train_deterministic(ray_session, feat_ds):
    a = logreg_train(feat_ds, FEATURES, "label", iters=5)
    b = logreg_train(feat_ds.repartition(3), FEATURES, "label", iters=5)
    # same data, different blocking -> the ordered fold keeps sums equal
    # up to float64 partial regrouping; weights agree far below any
    # decision-relevant scale
    np.testing.assert_allclose(a["weights"], b["weights"],
                               rtol=1e-9, atol=1e-12)


def test_scores_separate_classes(ray_session, feat_ds):
    model = logreg_train(feat_ds, FEATURES, "label",
                         iters=60, lr=1.0, l2=1e-4)
    scored = logreg_score(feat_ds, model).select_columns(
        ["label", "score"]).take_all()
    s = np.array([r["score"] for r in scored])
    y = np.array([r["label"] for r in scored])
    assert 0 < y.sum() < len(y)
    # the linear model must clearly separate the rule's classes and beat
    # the majority baseline by a wide margin (measured 0.86 vs 0.56)
    assert s[y == 1].mean() > s[y == 0].mean() + 0.3
    acc = ((s >= 0.5).astype(int) == y).mean()
    base = max(y.mean(), 1 - y.mean())
    assert acc > base + 0.15
