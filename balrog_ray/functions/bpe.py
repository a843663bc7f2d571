"""Distributed BPE tokenizer training + encoding over the documents table.

The tokenizer-training role of an LLM data pipeline (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units" -- the
published algorithm; the distributed layout below is original).  Classic
BPE semantics, pinned by a single-process oracle test:

* pre-tokenize: whitespace words; pair statistics are weighted by word
  frequency, so the corpus collapses to a (word, count) table first --
  the standard trick that makes training corpus-size-independent;
* per merge round: count ALL adjacent symbol pairs (overlapping
  occurrences count), pick the max -- ties broken (count desc, left asc,
  right asc) so training is deterministic -- and rewrite every word by
  replacing LEFTMOST-non-overlapping occurrences in one pass;
* no end-of-word marker (documented contract; add one by appending it
  to the initial character split if a downstream needs boundaries).

Ray-Data shape: the STATE is the sharded (syms: list<string>, n) word
table, materialized between rounds.  Each round is (1) one vectorized
``map_batches`` emitting per-block PARTIAL pair counts (factorized
symbols -> integer pair keys -> ``np.bincount`` -- combiner rule, no raw
pairs shuffle), (2) one pair-keyed ``groupby().sum``, (3) a per-block
partial argmax so the driver sees O(blocks) candidate rows, never the
pair table, (4) one broadcast merge applied by a vectorized rewrite.
Words never leave their shard; per-round shuffle volume is bounded by
distinct-pair partials, not corpus size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def word_counts(docs_ds, text_col: str = "text"):
    """(word, n) Dataset: whitespace pre-tokenization + one groupby."""
    from ray.data.aggregate import Sum

    def explode(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(b.column(text_col), r"\s+")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.greater(pc.utf8_length(flat), 0))
        return pa.table({"word": flat,
                         "n": pa.array(np.ones(len(flat), np.int64))})

    return (docs_ds.map_batches(explode, batch_format="pyarrow")
            .groupby("word").aggregate(Sum("n", alias_name="n")))


def _flat_syms(b: pa.Table):
    """(flat symbol object-array, word_id per symbol, per-word n)."""
    syms = b.column("syms")
    lens = pc.list_value_length(syms).to_numpy().astype(np.int64)
    flat = np.asarray(pc.list_flatten(syms).to_pylist(), dtype=object)
    word_id = np.repeat(np.arange(len(lens)), lens)
    return flat, word_id, lens


def _pair_partials(b: pa.Table) -> pa.Table:
    """Per-block combined pair counts: factorize symbols, bincount
    integer pair keys weighted by word frequency."""
    flat, word_id, lens = _flat_syms(b)
    if len(flat) < 2:
        return pa.table({"left": pa.array([], pa.string()),
                         "right": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    n = b.column("n").to_numpy()
    vocab, codes = np.unique(flat.astype("U"), return_inverse=True)
    same = word_id[:-1] == word_id[1:]
    key = codes[:-1][same] * len(vocab) + codes[1:][same]
    wts = n[word_id[:-1][same]]
    uk, inv = np.unique(key, return_inverse=True)
    cnt = np.bincount(inv, weights=wts.astype(np.float64)) \
        .astype(np.int64)
    return pa.table({
        "left": pa.array(vocab[uk // len(vocab)], pa.string()),
        "right": pa.array(vocab[uk % len(vocab)], pa.string()),
        "n": pa.array(cnt, pa.int64())})


def _block_argmax(b: pa.Table) -> pa.Table:
    """One best row per block: (n desc, left asc, right asc)."""
    if b.num_rows == 0:
        return b
    order = pc.sort_indices(b, sort_keys=[
        ("n", "descending"), ("left", "ascending"),
        ("right", "ascending")])
    return b.take(order[:1])


def apply_merge(flat: np.ndarray, word_id: np.ndarray, a: str, b: str):
    """Leftmost-non-overlapping single-pass merge of (a, b) -> a+b over
    the flat symbol stream; returns (new_flat, new_word_id).  Chains of
    overlapping matches only arise when a == b; keeping even offsets
    within each chain IS the leftmost rule."""
    if len(flat) < 2:
        return flat, word_id
    match = ((flat[:-1] == a) & (flat[1:] == b)
             & (word_id[:-1] == word_id[1:]))
    idx = np.flatnonzero(match)
    if idx.size == 0:
        return flat, word_id
    new_chain = np.r_[True, np.diff(idx) > 1]
    chain_start = idx[new_chain][np.cumsum(new_chain) - 1]
    idx = idx[((idx - chain_start) % 2) == 0]
    out = flat.copy()
    out[idx] = a + b
    keep = np.ones(len(flat), bool)
    keep[idx + 1] = False
    return out[keep], word_id[keep]


def _rewrite_stage(a: str, b: str):
    def fn(batch: pa.Table) -> pa.Table:
        flat, word_id, _lens = _flat_syms(batch)
        nf, nw = apply_merge(flat, word_id, a, b)
        new_lens = np.bincount(nw, minlength=batch.num_rows) \
            if len(nw) else np.zeros(batch.num_rows, np.int64)
        offsets = np.r_[0, np.cumsum(new_lens)].astype(np.int32)
        arr = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            pa.array(list(nf), pa.string()))
        return pa.table({"syms": arr, "n": batch.column("n")})

    return fn


def train_bpe(docs_ds, n_merges: int, *, text_col: str = "text",
              min_pair_count: int = 2,
              num_partitions: int = 8) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a document Dataset; returns
    the ordered merge list (the tokenizer).  Stops early when the best
    remaining pair occurs fewer than ``min_pair_count`` times."""
    def to_syms(b: pa.Table) -> pa.Table:
        words = b.column("word").to_pylist()
        lens = np.array([len(w) for w in words], np.int64)
        offsets = np.r_[0, np.cumsum(lens)].astype(np.int32)
        arr = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            pa.array([ch for w in words for ch in w], pa.string()))
        return pa.table({"syms": arr, "n": b.column("n")})

    words = (word_counts(docs_ds, text_col)
             .map_batches(to_syms, batch_format="pyarrow")
             .repartition(num_partitions).materialize())

    from ray.data.aggregate import Sum

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        cands = (words
                 .map_batches(_pair_partials, batch_format="pyarrow")
                 .groupby(["left", "right"])
                 .aggregate(Sum("n", alias_name="n"))
                 .map_batches(_block_argmax, batch_format="pyarrow")
                 .take_all())
        if not cands:
            break
        best = min(cands, key=lambda r: (-int(r["n"]), r["left"],
                                         r["right"]))
        if int(best["n"]) < min_pair_count:
            break
        a, b = str(best["left"]), str(best["right"])
        merges.append((a, b))
        words = (words
                 .map_batches(_rewrite_stage(a, b),
                              batch_format="pyarrow")
                 .materialize())
    return merges


def encode_words(words: list[str],
                 merges: list[tuple[str, str]]) -> list[list[str]]:
    """Reference encoder: apply the merge list in order to each word
    (driver-side helper; the distributed path is :func:`bpe_tokenize`)."""
    rank = {m: i for i, m in enumerate(merges)}
    out = []
    for w in words:
        syms = list(w)
        while len(syms) > 1:
            pairs = [(rank.get((syms[i], syms[i + 1]), len(rank)), i)
                     for i in range(len(syms) - 1)]
            r, i = min(pairs)
            if r == len(rank):
                break
            syms[i:i + 2] = [syms[i] + syms[i + 1]]
        out.append(syms)
    return out


def bpe_tokenize(docs_ds, merges: list[tuple[str, str]], *,
                 text_col: str = "text", id_col: str = "doc_id"):
    """Per-document BPE token counts under a trained merge list -- a
    stateless ``map_batches`` with the merge table in the closure
    (broadcast once per task, the dictionary-capture rule).  Returns
    (id_col, n_words, n_tokens).

    Note: encoding applies merges by RANK per word (the standard
    encoder), which equals replaying the training merges in order."""
    merges = list(merges)

    def enc(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(b.column(text_col), r"\s+")
        n_words, n_tokens = [], []
        for lst in toks.to_pylist():
            ws = [w for w in lst if w]
            encoded = encode_words(ws, merges)
            n_words.append(len(ws))
            n_tokens.append(sum(len(e) for e in encoded))
        return pa.table({id_col: b.column(id_col),
                         "n_words": pa.array(n_words, pa.int64()),
                         "n_tokens": pa.array(n_tokens, pa.int64())})

    return docs_ds.map_batches(enc, batch_format="pyarrow")
