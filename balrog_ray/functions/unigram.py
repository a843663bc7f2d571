"""Distributed unigram-LM tokenizer training + encoding (the
SentencePiece role; Kudo 2018, "Subword Regularization" -- the published
algorithm family; the distributed layout below is original).

Variant implemented: **hard-EM (Viterbi-EM)** with deterministic
tie-breaks, pinned by a single-process oracle test:

* pre-tokenize: whitespace words, corpus collapsed to a (word, count)
  table (training cost scales with DISTINCT words, not corpus size);
* seed vocabulary: every substring of length 1..``seed_max_len``
  weighted by word frequency, kept to ``seed_size`` by
  (count desc, piece asc), single characters always retained;
* per EM round: E-step Viterbi-segments each word under the current
  piece log-probs (ties: smaller split point first = longest-suffix
  piece wins, both sides identical), emitting INTEGER word-frequency-
  weighted piece counts; M-step prunes to the round's target size by
  (count desc, piece asc) -- single chars immune -- and renormalizes;
* round targets halve geometrically from the seed size down to
  ``vocab_size`` at the final round.

Ray-Data shape: the (word, count) table is sharded once and reused every
round; an EM round is one vectorized-per-block ``map_batches`` emitting
per-block PARTIAL piece counts (combiner rule: distinct pieces per
block, never raw occurrences) + one piece-keyed ``groupby().sum``; the
driver only ever holds the piece table (bounded by ``seed_size`` -- a
vocab knob, not corpus size) and broadcasts the refreshed log-probs.
All distributed folds are int64 sums, so training is bit-deterministic
under any block layout; the only float ops (normalize + log + Viterbi
DP) run identically on driver and oracle.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .bpe import word_counts


def viterbi_segment(word: str, logp: dict[str, float],
                    max_len: int) -> list[str]:
    """Max-log-prob segmentation of ``word`` into vocabulary pieces.
    ``logp`` must contain every single character of the word (training
    guarantees it; encoding maps chars unseen in training to one
    UNK piece each).  Ties prefer the smaller split point (the longer
    final piece)."""
    n = len(word)
    best = [-math.inf] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            p = logp.get(word[j:i])
            if p is None or best[j] == -math.inf:
                continue
            s = best[j] + p
            if s > best[i]:
                best[i] = s
                back[i] = j
    if best[n] == -math.inf:                 # unseen chars -> UNK chars
        return list(word)
    out, i = [], n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    return out[::-1]


def _seed_vocab(words, seed_max_len: int, seed_size: int):
    """(piece, n) Dataset of the top substrings + all single chars."""
    from ray.data.aggregate import Sum

    def subs(b: pa.Table) -> pa.Table:
        pieces, ns = [], []
        for w, n in zip(b.column("word").to_pylist(),
                        b.column("n").to_pylist()):
            for ln in range(1, min(seed_max_len, len(w)) + 1):
                for i in range(len(w) - ln + 1):
                    pieces.append(w[i:i + ln])
                    ns.append(n)
        return pa.table({"piece": pa.array(pieces, pa.string()),
                         "n": pa.array(ns, pa.int64())})

    counts = (words.map_batches(subs, batch_format="pyarrow")
              .groupby("piece").aggregate(Sum("n", alias_name="n")))
    rows = (counts
            .sort(["n", "piece"], descending=[True, False])
            .limit(seed_size).take_all())
    kept = {r["piece"]: int(r["n"]) for r in rows}

    # single chars are never pruned (every word must stay segmentable):
    # filtered DISTRIBUTED, so the driver pull is charset-sized, never
    # substring-table-sized
    def chars_only(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(pc.equal(pc.utf8_length(b.column("piece")), 1))

    for r in (counts.map_batches(chars_only, batch_format="pyarrow")
              .take_all()):
        kept[r["piece"]] = int(r["n"])
    return kept


def _normalize(counts: dict[str, int]) -> dict[str, float]:
    total = float(sum(counts.values()))
    return {p: math.log(c / total) for p, c in sorted(counts.items())}


def train_unigram(docs_ds, vocab_size: int, *, text_col: str = "text",
                  seed_max_len: int = 6, seed_factor: int = 4,
                  n_rounds: int = 4,
                  num_partitions: int = 8) -> dict[str, float]:
    """Learn a unigram tokenizer; returns {piece: logprob}."""
    import ray
    from ray.data.aggregate import Sum

    words = (word_counts(docs_ds, text_col)
             .repartition(num_partitions).materialize())

    seed_size = vocab_size * seed_factor
    counts = _seed_vocab(words, seed_max_len, seed_size)
    logp = _normalize(counts)

    # geometric schedule from seed size down to vocab_size
    targets = [max(vocab_size,
                   int(seed_size * (vocab_size / seed_size)
                       ** ((r + 1) / n_rounds)))
               for r in range(n_rounds)]
    targets[-1] = vocab_size

    for target in targets:
        ref = ray.put(logp)

        def estep(b: pa.Table, _ref=ref) -> pa.Table:
            lp: dict[str, float] = ray.get(_ref)
            acc: dict[str, int] = {}
            for w, n in zip(b.column("word").to_pylist(),
                            b.column("n").to_pylist()):
                for piece in viterbi_segment(w, lp, seed_max_len):
                    acc[piece] = acc.get(piece, 0) + int(n)
            ks = sorted(acc)
            return pa.table({"piece": pa.array(ks, pa.string()),
                             "n": pa.array([acc[k] for k in ks],
                                           pa.int64())})

        rows = (words.map_batches(estep, batch_format="pyarrow")
                .groupby("piece").aggregate(Sum("n", alias_name="n"))
                .take_all())
        counts = {r["piece"]: int(r["n"]) for r in rows}
        # prune to target by (count desc, piece asc); chars immune
        order = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        kept = dict(order[:target])
        for p, c in counts.items():
            if len(p) == 1:
                kept[p] = c
        counts = kept
        logp = _normalize(counts)
    return logp


def unigram_tokenize(docs_ds, logp: dict[str, float], *,
                     text_col: str = "text", id_col: str = "doc_id",
                     max_len: int = 6):
    """Per-document token counts under a trained unigram model -- a
    stateless ``map_batches`` with the model in the closure.  Characters
    absent from the model count one UNK token each.  Returns
    (id_col, n_words, n_tokens)."""
    import pyarrow.compute as pc

    model = dict(logp)

    def enc(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(b.column(text_col), r"\s+")
        n_words, n_tokens = [], []
        for lst in toks.to_pylist():
            ws = [w for w in lst if w]
            n_words.append(len(ws))
            n_tokens.append(sum(
                len(viterbi_segment(w, model, max_len)) for w in ws))
        return pa.table({id_col: b.column(id_col),
                         "n_words": pa.array(n_words, pa.int64()),
                         "n_tokens": pa.array(n_tokens, pa.int64())})

    return docs_ds.map_batches(enc, batch_format="pyarrow")
