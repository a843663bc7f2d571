"""Distributed unigram-LM (SentencePiece-role) tokenizer training vs a
single-process hard-EM oracle written with independent plain loops."""

import math

import pytest

from balrog_ray.functions.unigram import (train_unigram,
                                          unigram_tokenize,
                                          viterbi_segment)


def ref_viterbi(word, logp, max_len):
    n = len(word)
    best = [-math.inf] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            piece = word[j:i]
            if piece in logp and best[j] != -math.inf:
                s = best[j] + logp[piece]
                if s > best[i]:
                    best[i], back[i] = s, j
    if best[n] == -math.inf:
        return list(word)
    out, i = [], n
    while i > 0:
        out.append(word[back[i]:i])
        i = back[i]
    return out[::-1]


def ref_train_unigram(texts, vocab_size, seed_max_len=6, seed_factor=4,
                      n_rounds=4):
    from collections import Counter

    wc = Counter()
    for t in texts:
        for w in t.split():
            wc[w] += 1

    sub = Counter()
    for w, n in wc.items():
        for ln in range(1, min(seed_max_len, len(w)) + 1):
            for i in range(len(w) - ln + 1):
                sub[w[i:i + ln]] += n
    seed_size = vocab_size * seed_factor
    counts = dict(sorted(sub.items(),
                         key=lambda kv: (-kv[1], kv[0]))[:seed_size])
    for p, c in sub.items():
        if len(p) == 1:
            counts[p] = c

    def norm(cs):
        total = float(sum(cs.values()))
        return {p: math.log(c / total) for p, c in sorted(cs.items())}

    logp = norm(counts)
    targets = [max(vocab_size,
                   int(seed_size * (vocab_size / seed_size)
                       ** ((r + 1) / n_rounds)))
               for r in range(n_rounds)]
    targets[-1] = vocab_size
    for target in targets:
        acc = Counter()
        for w, n in wc.items():
            for piece in ref_viterbi(w, logp, seed_max_len):
                acc[piece] += n
        kept = dict(sorted(acc.items(),
                           key=lambda kv: (-kv[1], kv[0]))[:target])
        for p, c in acc.items():
            if len(p) == 1:
                kept[p] = c
        logp = norm(kept)
    return logp


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps while the quick fox runs",
    "quick brown foxes and lazy dogs run and jump",
    "over and over the dog runs the fox sleeps",
]


def test_viterbi_tie_prefers_longer_piece():
    logp = {"a": -0.5, "b": -0.5, "ab": -1.0}
    # a+b scores -1.0 == ab: the single longer piece must win
    assert viterbi_segment("ab", logp, 6) == ["ab"]
    assert ref_viterbi("ab", logp, 6) == ["ab"]


def test_viterbi_unknown_chars_fall_back_to_unk():
    logp = {"a": -0.1}
    assert viterbi_segment("axa", logp, 6) == ["a", "x", "a"]


@pytest.mark.usefixtures("ray_session")
def test_train_unigram_matches_oracle():
    import pyarrow as pa
    import ray.data

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array(TEXTS, pa.string())}))
    got = train_unigram(ds, 40, num_partitions=3)
    want = ref_train_unigram(TEXTS, 40)
    assert set(got) == set(want)
    for p in want:
        assert got[p] == want[p], p


@pytest.mark.usefixtures("ray_session")
def test_unigram_tokenize_counts():
    import pyarrow as pa
    import ray.data

    model = ref_train_unigram(TEXTS, 40)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array(TEXTS, pa.string())}))
    rows = {r["doc_id"]: r for r in
            unigram_tokenize(ds, model).take_all()}
    for i, t in enumerate(TEXTS):
        ws = t.split()
        want = sum(len(ref_viterbi(w, model, 6)) for w in ws)
        assert rows[i]["n_words"] == len(ws)
        assert rows[i]["n_tokens"] == want
        assert rows[i]["n_tokens"] <= sum(len(w) for w in ws)
