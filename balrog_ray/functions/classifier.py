"""Distributed logistic-regression document classifier -- the
fastText/CCNet "quality classifier" role in LLM corpus prep (Wenzek et
al. 2020, "CCNet: Extracting High Quality Monolingual Datasets from Web
Crawl Data"): train a linear model over cheap per-document features, then
score every document in one streaming pass.

Ray-Data-first shapes:

* **training** is full-batch gradient descent where each iteration is ONE
  ``map_batches`` pass emitting a single (k+2)-float partial row per
  BLOCK -- gradient partials, not examples, reach the driver (O(#blocks)
  per iteration, never O(#docs)).  Partials fold in a fixed order (sorted
  by each block's min doc id), so the trained weights are deterministic
  regardless of task scheduling.  Iterations are O(10); at 100 TB each
  pass streams with backpressure and the shuffle volume is zero.
* **feature standardization** runs the same one-pass ordered partial-sum
  fold (sum / sumsq per block), so the whole fit touches the data
  ``iters + 1`` times with nothing but tiny partial rows moving.
* **scoring** is a stateless ``map_batches`` with the (k+1)-float model
  captured in the closure -- broadcast-by-value, no lookup exchange.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _sigmoid(z: np.ndarray) -> np.ndarray:
    # clip keeps exp finite; applied identically in any oracle
    return 1.0 / (1.0 + np.exp(-np.clip(z, -30.0, 30.0)))


def _feature_matrix(b: pa.Table, feature_cols) -> np.ndarray:
    return np.stack([b.column(c).to_numpy().astype(np.float64)
                     for c in feature_cols], axis=1)


def _ordered_fold(rows: list[dict], vec_names: list[str]) -> dict:
    """Fold per-block partial rows in block-min-id order: deterministic
    float64 sums whatever order the scheduler returned the blocks in."""
    out = {v: 0.0 for v in vec_names}
    for r in sorted(rows, key=lambda r: r["_key"]):
        for v in vec_names:
            out[v] += r[v]
    return out


def logreg_train(ds, feature_cols, label_col: str, id_col: str = "doc_id",
                 *, iters: int = 40, lr: float = 0.5, l2: float = 1e-4):
    """Fit logistic regression of ``label_col`` (0/1) on ``feature_cols``.
    Returns a model dict: standardization (mean/std per feature) +
    weights (k features then intercept), all plain floats."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    k = len(feature_cols)
    feats = ds.select_columns(list(feature_cols) + [label_col, id_col]) \
        .materialize()

    def stat_partials(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({n: pa.array([], pa.float64())
                             for n in ["_key", "n"]
                             + [f"s{j}" for j in range(k)]
                             + [f"q{j}" for j in range(k)]})
        X = _feature_matrix(b, feature_cols)
        row = {"_key": [int(b.column(id_col).to_numpy().min())],
               "n": [float(b.num_rows)]}
        for j in range(k):
            row[f"s{j}"] = [float(X[:, j].sum())]
            row[f"q{j}"] = [float((X[:, j] * X[:, j]).sum())]
        return pa.table(row)

    names = ["n"] + [f"s{j}" for j in range(k)] + [f"q{j}" for j in range(k)]
    tot = _ordered_fold(
        feats.map_batches(stat_partials, batch_format="pyarrow").take_all(),
        names)
    n = tot["n"]
    mean = np.array([tot[f"s{j}"] / n for j in range(k)])
    var = np.array([max(tot[f"q{j}"] / n - mean[j] ** 2, 0.0)
                    for j in range(k)])
    std = np.sqrt(var)
    std[std == 0.0] = 1.0               # constant features stay centered

    w = np.zeros(k + 1)                 # weights then intercept
    gnames = [f"g{j}" for j in range(k + 1)] + ["loss"]
    for _ in range(iters):
        w_it = w.copy()

        def grad_partials(b: pa.Table, w_it=w_it) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({n: pa.array([], pa.float64())
                                 for n in ["_key"]
                                 + [f"g{j}" for j in range(k + 1)]
                                 + ["loss"]})
            X = (_feature_matrix(b, feature_cols) - mean) / std
            y = b.column(label_col).to_numpy().astype(np.float64)
            p = _sigmoid(X @ w_it[:k] + w_it[k])
            r = p - y
            row = {"_key": [int(b.column(id_col).to_numpy().min())]}
            g = X.T @ r
            for j in range(k):
                row[f"g{j}"] = [float(g[j])]
            row[f"g{k}"] = [float(r.sum())]
            eps = 1e-12
            row["loss"] = [float(-(y * np.log(p + eps)
                                   + (1 - y) * np.log(1 - p + eps)).sum())]
            return pa.table(row)

        tot = _ordered_fold(
            feats.map_batches(grad_partials,
                              batch_format="pyarrow").take_all(), gnames)
        grad = np.array([tot[f"g{j}"] for j in range(k + 1)]) / n
        grad[:k] += l2 * w[:k]          # no penalty on the intercept
        w = w - lr * grad

    # one loss-only pass at the FINAL weights (the loop's last fold
    # evaluated the loss at the pre-update weights -- one iteration
    # stale for convergence monitoring)
    def loss_partials(b: pa.Table, w_it=w.copy()) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({n_: pa.array([], pa.float64())
                             for n_ in ("_key", "loss")})
        X = (_feature_matrix(b, feature_cols) - mean) / std
        y = b.column(label_col).to_numpy().astype(np.float64)
        p = _sigmoid(X @ w_it[:k] + w_it[k])
        eps = 1e-12
        return pa.table({
            "_key": [int(b.column(id_col).to_numpy().min())],
            "loss": [float(-(y * np.log(p + eps)
                             + (1 - y) * np.log(1 - p + eps)).sum())]})

    final = _ordered_fold(
        feats.map_batches(loss_partials,
                          batch_format="pyarrow").take_all(), ["loss"])

    return {"feature_cols": list(feature_cols),
            "mean": mean.tolist(), "std": std.tolist(),
            "weights": w.tolist(), "n_examples": int(n),
            "final_loss": final["loss"] / n}


def logreg_score(ds, model: dict, *, out_col: str = "score"):
    """Append the model's predicted probability to every row -- one
    stateless streaming pass, model broadcast by value."""
    cols = model["feature_cols"]
    mean = np.asarray(model["mean"])
    std = np.asarray(model["std"])
    w = np.asarray(model["weights"])
    k = len(cols)

    def score(b: pa.Table) -> pa.Table:
        X = (_feature_matrix(b, cols) - mean) / std
        return b.append_column(out_col,
                               pa.array(_sigmoid(X @ w[:k] + w[k])))

    return ds.map_batches(score, batch_format="pyarrow")
