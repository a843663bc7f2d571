"""Sequence packing: assemble variable-length chunks into fixed-budget
training sequences (the pack half of tokenize-chunk-pack; no reference
analogue -- beyond-reference training-data surface).

Packing is inherently sequential, so it cannot be a pure per-batch map;
the industrial shape is pack-per-shard: chunks hash-shard by doc id, each
shard packs independently with first-fit-decreasing (a 11/9-OPT+1 bound),
and the only shuffle is the shard groupby.  Per-shard state is that
shard's chunk-length list -- ints, not text -- so a shard of a million
chunks is ~8 MB of driver-free task memory.  Deterministic: shard
assignment is a fixed multiplicative hash, FFD ties break by (doc_id,
chunk_id)."""

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
        # FFD: longest first, ties by (doc_id, chunk_id) for determinism
        order = np.lexsort((chunks, docs, -lens))
        seq_of = np.empty(len(order), dtype=np.int64)
        space: list[int] = []              # remaining budget per sequence
        for i in order:
            length = int(lens[i])
            for s, rem in enumerate(space):
                if rem >= length:
                    seq_of[i] = s
                    space[s] = rem - length
                    break
            else:
                seq_of[i] = len(space)
                space.append(budget - length)
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
