"""Distributed BPE tokenizer training vs a single-process oracle.

The oracle is the classic Sennrich BPE trainer written as the obvious
per-word Python loop (word-frequency weighted pair counts, ties broken
(count desc, left asc, right asc), leftmost-non-overlapping rewrite).
The distributed trainer must reproduce its merge list EXACTLY -- merge
order is the tokenizer, so any divergence changes every downstream
encoding.
"""

import numpy as np
import pytest

from balrog_ray.functions.bpe import (apply_merge, bpe_tokenize,
                                      encode_words, train_bpe)


def ref_train_bpe(texts, n_merges, min_pair_count=2):
    """Single-process reference trainer (oracle)."""
    from collections import Counter

    wc = Counter()
    for t in texts:
        for w in t.split():
            wc[w] += 1
    words = [[list(w), n] for w, n in wc.items()]
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, n in words:
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(),
                          key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if cnt < min_pair_count:
            break
        merges.append((a, b))
        for rec in words:
            syms, out, i = rec[0], [], 0
            while i < len(syms):
                if (i < len(syms) - 1 and syms[i] == a
                        and syms[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            rec[0] = out
    return merges


TEXTS = [
    "low lower lowest low low newer newest new",
    "wider wide widest new newer lower low",
    "the newest widget is the widest widget",
    "low low low wide wide new new new newer",
]


def test_apply_merge_leftmost_nonoverlapping():
    # overlap chain a==b: "aaaa" -> "aa","aa"; "aaa" -> "aa","a"
    flat = np.array(list("aaaa") + list("aaa"), dtype=object)
    wid = np.array([0] * 4 + [1] * 3)
    nf, nw = apply_merge(flat, wid, "a", "a")
    assert list(nf) == ["aa", "aa", "aa", "a"]
    assert list(nw) == [0, 0, 1, 1]
    # no cross-word merges
    flat = np.array(["a", "b", "a", "b"], dtype=object)
    wid = np.array([0, 0, 1, 1])
    nf, nw = apply_merge(flat, wid, "b", "a")
    assert list(nf) == ["a", "b", "a", "b"]


def test_encode_words_matches_training_replay():
    merges = ref_train_bpe(TEXTS, 12)
    # replaying merges in order over a word == rank-based encoding
    for w in {w for t in TEXTS for w in t.split()}:
        syms = list(w)
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if (i < len(syms) - 1 and syms[i] == a
                        and syms[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        assert encode_words([w], merges)[0] == syms, w


@pytest.mark.usefixtures("ray_session")
def test_train_bpe_matches_oracle():
    import pyarrow as pa
    import ray.data

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array(TEXTS, pa.string())}))
    got = train_bpe(ds, 16, num_partitions=3)
    want = ref_train_bpe(TEXTS, 16)
    assert got == want


@pytest.mark.usefixtures("ray_session")
def test_train_bpe_min_pair_count_stops_early():
    import pyarrow as pa
    import ray.data

    texts = ["ab ab cd"]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(texts, pa.string())}))
    # (a,b) occurs twice; (c,d) once -> exactly one merge at min=2
    assert train_bpe(ds, 10, min_pair_count=2,
                     num_partitions=2) == [("a", "b")]


@pytest.mark.usefixtures("ray_session")
def test_bpe_tokenize_counts():
    import pyarrow as pa
    import ray.data

    merges = ref_train_bpe(TEXTS, 12)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array(TEXTS, pa.string())}))
    rows = {r["doc_id"]: r for r in
            bpe_tokenize(ds, merges).take_all()}
    for i, t in enumerate(TEXTS):
        ws = t.split()
        want_tokens = sum(len(e) for e in encode_words(ws, merges))
        assert rows[i]["n_words"] == len(ws)
        assert rows[i]["n_tokens"] == want_tokens
        # merges compress: token count strictly below char count here
        assert rows[i]["n_tokens"] < sum(len(w) for w in ws)
