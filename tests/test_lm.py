"""Bigram-LM corpus scoring vs a single-process oracle: the distributed
train pass (count shuffle + vocab cap + broadcast) must produce the
EXACT model the same code builds locally, and per-doc perplexities must
match to the bit.  Plus behavioral checks: corpus-like text scores lower
perplexity than shuffled gibberish, OOV stays finite."""

import numpy as np
import pytest

from balrog_ray.functions.lm import (BigramModel, _norm_tokens,
                                     bigram_counts, score_perplexity,
                                     train_bigram_lm)

DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox sleeps under the old tree",
    "the lazy dog dreams of the quick brown fox",
    "a slow green turtle walks past the lazy dog",
    "the quick brown fox jumps over the lazy dog again",
    "zxq vvk jjw qqp mmz",                       # gibberish
    "",                                           # empty
]


def _local_model(texts, vocab_size=4096, min_count=1):
    uni, bi = {}, {}
    for t in texts:
        u, g = bigram_counts(_norm_tokens(t))
        for k, v in u.items():
            uni[k] = uni.get(k, 0) + v
        for k, v in g.items():
            bi[k] = bi.get(k, 0) + v
    top = sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    vocab = {t for t, _ in top}
    mapped = {}
    for (a, c), n in bi.items():
        if n < min_count:
            continue
        a2 = a if (a in vocab or a == "<s>") else "<unk>"
        c2 = c if c in vocab else "<unk>"
        mapped[(a2, c2)] = mapped.get((a2, c2), 0) + n
    return BigramModel(vocab, mapped)


def _docs_ds():
    import ray.data

    return ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(DOCS)])


@pytest.mark.parametrize("vocab_size", [4096, 8])
def test_distributed_train_matches_local(ray_session, vocab_size):
    m = train_bigram_lm(_docs_ds(), vocab_size=vocab_size)
    ref = _local_model(DOCS, vocab_size=vocab_size)
    assert m.vocab == ref.vocab
    assert m.bi == ref.bi
    assert m.ctx == ref.ctx


def test_scores_match_local_exactly(ray_session):
    m = train_bigram_lm(_docs_ds())
    ref = _local_model(DOCS)
    rows = {r["doc_id"]: r
            for r in score_perplexity(_docs_ds(), m).take_all()}
    assert len(rows) == len(DOCS)
    for i, t in enumerate(DOCS):
        lp, n = ref.doc_logprob(_norm_tokens(t))
        assert rows[i]["n_tokens"] == n
        assert rows[i]["log2prob"] == lp          # bit-exact float64
        want_ppl = float(2.0 ** (-lp / n)) if n else 0.0
        assert rows[i]["ppl"] == want_ppl


def test_corpus_like_beats_gibberish(ray_session):
    m = train_bigram_lm(_docs_ds())
    rows = {r["doc_id"]: r["ppl"]
            for r in score_perplexity(_docs_ds(), m).take_all()}
    assert rows[0] < rows[5], "corpus-like doc should have lower ppl"
    assert np.isfinite(rows[5])
    assert rows[6] == 0.0                         # empty doc sentinel


def test_min_count_prunes_bigrams(ray_session):
    m1 = train_bigram_lm(_docs_ds(), min_count=1)
    m2 = train_bigram_lm(_docs_ds(), min_count=2)
    assert set(m2.bi) < set(m1.bi)
    assert all(n >= 2 for n in m2.bi.values())
    assert m2.bi == _local_model(DOCS, min_count=2).bi


def test_driver_collects_folded_model_not_raw_bigrams(ray_session):
    """The model contraction is distributed: with vocab_size << distinct
    tokens the driver must collect exactly the UNK-folded model rows
    (bounded by (V+2)*(V+1)), never the raw bigram-type table."""
    m = train_bigram_lm(_docs_ds(), vocab_size=2)
    # raw bigram types in the corpus (local recount)
    raw = set()
    for t in DOCS:
        _, g = bigram_counts(_norm_tokens(t))
        raw |= set(g)
    assert m.train_stats["collected_rows"] == len(m.bi)
    assert m.train_stats["collected_rows"] <= (2 + 2) * (2 + 1)
    assert m.train_stats["collected_rows"] < len(raw)
    assert m.bi == _local_model(DOCS, vocab_size=2).bi


def test_sentinel_tokens_cannot_collide(ray_session):
    """Literal '<s>'/'<unk>' corpus tokens are escaped, so they never
    merge counts with the model's BOS/UNK symbols -- and the escape is
    injective ('<<s>' escapes again rather than merging with '<s>')."""
    assert _norm_tokens("<s> <unk> <<s>> x") == \
        ["<<s>", "<<unk>", "<<s>>", "x"]
    docs = ["<unk> appears literally here", "plain words appear here"]
    import ray.data

    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(docs)])
    m = train_bigram_lm(ds)
    assert "<unk>" not in m.vocab and "<s>" not in m.vocab
    assert "<<unk>" in m.vocab                    # the escaped literal
    assert m.bi == _local_model(docs).bi
