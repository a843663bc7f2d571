"""Sequence packing: assemble variable-length chunks into fixed-budget
training sequences (the pack half of tokenize-chunk-pack; no reference
analogue -- beyond-reference training-data surface).

Packing is inherently sequential, so it cannot be a pure per-batch map;
the industrial shape is pack-per-shard: chunks hash-shard by doc id, each
shard packs independently with best-fit-decreasing (same 11/9-OPT
guarantee family as FFD), and the only shuffle is the shard groupby.
Per-shard state is that shard's chunk-length list -- ints, not text --
and the placement loop is O(n log budget) via a segment tree over
remaining capacities (a naive first-fit scan is O(n x #sequences):
quadratic, a hang at the million-chunk shards this module targets).
Deterministic: shard assignment is a fixed multiplicative hash, BFD
processes longest-first with (doc_id, chunk_id) tie-break and picks the
tightest-fitting sequence (LIFO among equals)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def pack_sequences(chunks_ds, *, budget: int = 512, n_shards: int = 16,
                   len_col: str = "n_tok", doc_col: str = "doc_id",
                   chunk_col: str = "chunk_id"):
    """(doc_id, chunk_id, n_tok) -> (shard, seq_id, doc_id, chunk_id)
    assignments with sum(n_tok) <= budget per (shard, seq_id).

    Chunks longer than ``budget`` raise (callers chunk first; a silent
    truncation here would corrupt training data)."""

    def shard_of(b: pa.Table) -> pa.Table:
        d = b.column(doc_col).to_numpy()
        shard = ((d * 2654435761) % 2147483647) % n_shards
        return b.append_column("shard", pa.array(shard.astype(np.int64),
                                                 pa.int64()))

    def pack(group: pa.Table) -> pa.Table:
        lens = group.column(len_col).to_numpy()
        if lens.size and int(lens.max()) > budget:
            raise ValueError(
                f"chunk of {int(lens.max())} tokens exceeds the packing "
                f"budget {budget}; chunk before packing")
        docs = group.column(doc_col).to_numpy()
        chunks = group.column(chunk_col).to_numpy()
        # BFD: longest first, ties by (doc_id, chunk_id); the tightest
        # open sequence is found in O(log budget) via a segment tree of
        # open-sequence counts indexed by remaining capacity
        order = np.lexsort((chunks, docs, -lens))
        seq_of = np.empty(len(order), dtype=np.int64)
        leaves = 1
        while leaves < budget + 1:
            leaves <<= 1
        tree = [0] * (2 * leaves)
        stacks: list[list[int]] = [[] for _ in range(budget + 1)]
        n_seq = 0

        def push(rem: int, seq: int) -> None:
            stacks[rem].append(seq)
            i = leaves + rem
            while i:
                tree[i] += 1
                i >>= 1

        def take(rem: int) -> int:
            i = leaves + rem
            while i:
                tree[i] -= 1
                i >>= 1
            return stacks[rem].pop()

        def smallest_ge(node: int, lo: int, hi: int, need: int) -> int:
            """Leftmost non-empty capacity leaf >= need, or -1."""
            if hi < need or tree[node] == 0:
                return -1
            if lo == hi:
                return lo
            mid = (lo + hi) // 2
            r = smallest_ge(2 * node, lo, mid, need)
            if r != -1:
                return r
            return smallest_ge(2 * node + 1, mid + 1, hi, need)

        for i in order:
            length = int(lens[i])
            rem = smallest_ge(1, 0, leaves - 1, length)
            if rem < 0:
                seq_of[i] = n_seq
                push(budget - length, n_seq)
                n_seq += 1
            else:
                seq = take(rem)
                seq_of[i] = seq
                push(rem - length, seq)
        return pa.table({
            "shard": group.column("shard"),
            "seq_id": pa.array(seq_of, pa.int64()),
            doc_col: group.column(doc_col),
            chunk_col: group.column(chunk_col),
            len_col: group.column(len_col)})

    return (chunks_ds.map_batches(shard_of, batch_format="pyarrow")
            .groupby("shard")
            .map_groups(pack, batch_format="pyarrow"))


def packing_stats(packed_ds, *, budget: int, len_col: str = "n_tok"):
    """Per-(shard, seq) fill -> one summary row: sequences, chunks,
    tokens, fill permille (integer-exact)."""
    import ray.data.aggregate as agg

    per_seq = (packed_ds.groupby(["shard", "seq_id"])
               .aggregate(agg.Sum(len_col, alias_name="seq_tok"),
                          agg.Count(alias_name="seq_chunks")))

    def roll(b: pa.Table) -> pa.Table:
        tok = b.column("seq_tok").to_numpy()
        return pa.table({
            "n_seq": pa.array([b.num_rows], pa.int64()),
            "n_chunks": pa.array([int(b.column("seq_chunks")
                                      .to_numpy().sum())], pa.int64()),
            "n_tokens": pa.array([int(tok.sum())], pa.int64()),
            "over_budget": pa.array([int((tok > budget).sum())],
                                    pa.int64())})

    import ray.data.aggregate as agg2

    return (per_seq.map_batches(roll, batch_format="pyarrow")
            .aggregate(agg2.Sum("n_seq", alias_name="n_seq"),
                       agg2.Sum("n_chunks", alias_name="n_chunks"),
                       agg2.Sum("n_tokens", alias_name="n_tokens"),
                       agg2.Sum("over_budget", alias_name="over_budget")))
