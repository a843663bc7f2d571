"""Corpus language-model quality scoring (the CCNet/KenLM role in LLM
data pipelines): train a word-bigram model with Laplace smoothing over
the corpus, then score every document's perplexity -- low-perplexity
documents read like the corpus, high-perplexity ones are noise/boiler.

Scale shape, three clean Ray Data passes and ONE broadcast:

1. **count** -- ``map_batches`` emits per-batch partial unigram/bigram
   counts (pre-aggregated inside the batch: the combiner), one
   ``groupby(term)`` sums them; count volume is vocabulary-sized, not
   corpus-sized.
2. **vocab cap + collect** -- top-``vocab_size`` unigrams by (count
   desc, term asc) via sort + ``limit`` (the table is already
   vocabulary-sized); bigram rows below ``min_count`` are pruned
   BEFORE the driver collects the model (at 100 TB the bigram-type
   table is the scale risk -- prune it there, smoothing absorbs the
   missing tail).  The model -- two dicts -- ships once via ``ray.put``.
3. **score** -- stateless ``map_batches`` computes each document's mean
   negative log2 probability and perplexity against the broadcast model.

Determinism: counts are exact integers, the vocab tie-break is total
(count desc, term asc), context counts are derived from the bigram sums
(so the smoothed distribution normalizes exactly), and scoring is pure
float64 -- with ``min_count=1`` the distributed result equals the
single-process oracle in tests exactly.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from .text import whitespace_tokens

BOS = "<s>"
UNK = "<unk>"

# corpus tokens that would collide with the BOS/UNK sentinels (or with
# an already-escaped form of them) get one more leading '<' -- an
# injective rewrite over the token space, so no document can merge its
# counts into the model's UNK/BOS symbols
_SENTINEL_LIKE = re.compile(r"^<+(s|unk)>$")


def _norm_tokens(text: str) -> list[str]:
    # NUL is the wire separator for count keys; normalize it to a space
    # so noisy documents cannot forge or collide bigram keys (applies
    # identically to the local oracle, which shares this function)
    return [t if not _SENTINEL_LIKE.match(t) else "<" + t
            for t in (t.lower() for t in
                      whitespace_tokens(text.replace("\x00", " "))) if t]


def bigram_counts(tokens: list[str]):
    """(unigram, bigram) count dicts for one document, BOS-prefixed."""
    uni: dict[str, int] = {}
    bi: dict[tuple[str, str], int] = {}
    prev = BOS
    for t in tokens:
        uni[t] = uni.get(t, 0) + 1
        bi[(prev, t)] = bi.get((prev, t), 0) + 1
        prev = t
    return uni, bi


class BigramModel:
    """Laplace-smoothed bigram LM over a capped vocabulary.

    ``P(w | h) = (c(h, w) + 1) / (c_ctx(h) + V)`` where ``V`` counts the
    vocab incl. ``<unk>`` and ``c_ctx(h) = sum_w c(h, w)`` (h's exact
    count as a context), so the smoothed distribution over the vocab
    sums to 1 for every history."""

    def __init__(self, vocab: set[str],
                 bi_counts: dict[tuple[str, str], int],
                 ctx_counts: dict[str, int] | None = None):
        self.vocab = vocab
        self.bi = bi_counts
        if ctx_counts is None:
            ctx_counts = {}
            for (h, _w), n in bi_counts.items():
                ctx_counts[h] = ctx_counts.get(h, 0) + n
        self.ctx = ctx_counts
        self.v_size = len(vocab) + 1            # + <unk>

    def _map(self, t: str) -> str:
        return t if t in self.vocab else UNK

    def doc_logprob(self, tokens: list[str]) -> tuple[float, int]:
        """Sum of log2 P over the doc's bigrams and the bigram count."""
        lp = 0.0
        prev = BOS
        for t in tokens:
            w = self._map(t)
            num = self.bi.get((prev, w), 0) + 1
            den = self.ctx.get(prev, 0) + self.v_size
            lp += float(np.log2(num / den))
            prev = w
        return lp, len(tokens)


def train_bigram_lm(docs_ds, *, text_col: str = "text",
                    vocab_size: int = 4096,
                    min_count: int = 1) -> BigramModel:
    """Distributed train pass: exact corpus counts -> capped-vocab
    Laplace bigram model (see the module docstring for the passes).

    ``min_count`` prunes bigram TYPES below that corpus count before the
    driver collects the model.  NOTE: pruning changes c_ctx (contexts
    are summed from the surviving bigrams), so ``min_count > 1`` is a
    slightly different -- still valid, still deterministic -- model,
    not a lossless compression of the ``min_count=1`` one."""
    import ray

    def partial_counts(b: pa.Table) -> pa.Table:
        uni: dict[str, int] = {}
        bi: dict[tuple[str, str], int] = {}
        for txt in b.column(text_col).to_pylist():
            u, g = bigram_counts(_norm_tokens(txt or ""))
            for k, v in u.items():
                uni[k] = uni.get(k, 0) + v
            for k, v in g.items():
                bi[k] = bi.get(k, 0) + v
        terms = ([f"u\x00{t}" for t in uni]
                 + [f"b\x00{a}\x00{c}" for a, c in bi])
        counts = list(uni.values()) + list(bi.values())
        return pa.table({"term": pa.array(terms, pa.string()),
                         "n": pa.array(counts, pa.int64())})

    from ray.data.aggregate import Sum

    counts = (docs_ds.select_columns([text_col])
              .map_batches(partial_counts, batch_format="pyarrow")
              .groupby("term")
              .aggregate(Sum("n", alias_name="n"))
              .materialize())

    def uni_only(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(pc.starts_with(b.column("term"), "u\x00"))

    top = (counts.map_batches(uni_only, batch_format="pyarrow")
           .sort(["n", "term"], descending=[True, False])
           .limit(vocab_size)
           .take_all())
    vocab = {r["term"][2:] for r in top}

    # UNK-fold DISTRIBUTED: raw bigram types are unbounded at corpus
    # scale, so map each surviving bigram's terms onto the broadcast
    # capped vocab inside map_batches, re-groupby the folded keys, and
    # only then collect -- the driver sees at most (V+2)*(V+1) rows
    # (the folded model), never the raw bigram-type table.
    vocab_ref = ray.put(vocab)

    def fold_bi(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.and_(pc.starts_with(b.column("term"), "b\x00"),
                    pc.greater_equal(b.column("n"), min_count))
        b = b.filter(m)
        v: set[str] = ray.get(vocab_ref)
        out = []
        for term in b.column("term").to_pylist():
            a, c = term[2:].split("\x00", 1)
            a = a if (a in v or a == BOS) else UNK
            c = c if c in v else UNK
            out.append(f"b\x00{a}\x00{c}")
        return pa.table({"term": pa.array(out, pa.string()),
                         "n": b.column("n")})

    folded = (counts.map_batches(fold_bi, batch_format="pyarrow")
              .groupby("term")
              .aggregate(Sum("n", alias_name="n"))
              .take_all())
    bi: dict[tuple[str, str], int] = {}
    for r in folded:
        a, c = r["term"][2:].split("\x00", 1)
        bi[(a, c)] = int(r["n"])
    model = BigramModel(vocab, bi)
    model.train_stats = {"collected_rows": len(folded)}
    return model


def score_perplexity(docs_ds, model: BigramModel, *,
                     id_col: str = "doc_id", text_col: str = "text"):
    """Stateless score pass against the broadcast model: one row per doc
    ``(id, n_tokens, log2prob, ppl)``; empty docs get ppl = 0."""
    import ray

    model_ref = ray.put(model)

    def score(b: pa.Table) -> pa.Table:
        m: BigramModel = ray.get(model_ref)
        ids = b.column(id_col)
        lps, ns, ppls = [], [], []
        for txt in b.column(text_col).to_pylist():
            lp, n = m.doc_logprob(_norm_tokens(txt or ""))
            lps.append(lp)
            ns.append(n)
            ppls.append(float(2.0 ** (-lp / n)) if n else 0.0)
        return pa.table({
            id_col: ids,
            "n_tokens": pa.array(ns, pa.int64()),
            "log2prob": pa.array(lps, pa.float64()),
            "ppl": pa.array(ppls, pa.float64())})

    return docs_ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow")
