"""Distributed global rank assignment: row_number over a total order --
the window primitive behind ntile/percent_rank/pagination that Ray Data
has no operator for (SURVEY §2.3 lists no reference analogue either; the
closest is the centroid ORDER BY at 04_merge_geometries.py:218-221).

Shape: one ``sort`` shuffle establishes the total order; block row counts
are then read from the sorted Dataset's REF-BUNDLE METADATA -- no block
is fetched to the driver -- and a prefix sum over those counts gives each
block its global offset.  A per-block Ray task appends ``offset +
arange(n)``.  This is the one stage in the engine that drops below the
Dataset API (to ``iter_internal_ref_bundles`` + ``from_arrow_refs``):
a prefix sum across blocks is inherently order-coupled, which
``map_batches`` cannot express.  Driver-side state is O(#blocks) ints.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def global_ranks(ds, sort_keys: list[str], *, rank_col: str = "rank",
                 partition_col: str | None = None,
                 broadcast_partitions: int = 100_000):
    """Total-order row numbers (1-based) over ``sort_keys``.

    With ``partition_col`` (must be the leading sort key), ``rank_col``
    restarts at 1 per partition -- ``row_number() over (partition by p
    order by ...)`` -- computed by subtracting each partition's first
    global position.  The firsts table is size-gated: at or below
    ``broadcast_partitions`` distinct keys it is broadcast (vectorized
    ``pc.index_in`` gather, no per-row Python); above, it hash-joins
    back on the partition key so nothing partition-cardinality-sized
    ever reaches the driver (the per-user row_number at open-web scale
    has ~1e9 partitions)."""
    import ray
    import ray.data

    if partition_col is not None and sort_keys[0] != partition_col:
        raise ValueError("partition_col must be the leading sort key")

    sorted_ds = ds.sort(sort_keys).materialize()
    blocks, counts = [], []
    for bundle in sorted_ds.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            blocks.append(ref)
            counts.append(meta.num_rows)
    offsets = np.concatenate([[0], np.cumsum(counts[:-1])]).astype(np.int64)

    @ray.remote
    def add_pos(block, offset: int) -> pa.Table:
        tab = pa.table(block) if not isinstance(block, pa.Table) else block
        pos = np.arange(offset + 1, offset + tab.num_rows + 1,
                        dtype=np.int64)
        return tab.append_column("__pos", pa.array(pos, pa.int64()))

    pos_ds = ray.data.from_arrow_refs(
        [add_pos.remote(b, int(o)) for b, o in zip(blocks, offsets)])

    if partition_col is None:
        def finish(b: pa.Table) -> pa.Table:
            return b.rename_columns(
                [rank_col if c == "__pos" else c for c in b.column_names])

        return pos_ds.map_batches(finish, batch_format="pyarrow")

    import ray.data.aggregate as agg

    firsts_ds = (pos_ds.select_columns([partition_col, "__pos"])
                 .groupby(partition_col)
                 .aggregate(agg.Min("__pos", alias_name="__first"))
                 .materialize())

    if firsts_ds.count() <= broadcast_partitions:
        import pyarrow.compute as pc

        rows = firsts_ds.take_all()
        key_set = pa.array([r[partition_col] for r in rows])
        first_pos = np.array([r["__first"] for r in rows], np.int64)

        def per_key(b: pa.Table) -> pa.Table:
            idx = pc.index_in(b.column(partition_col),
                              value_set=key_set).combine_chunks()
            rank = (b.column("__pos").to_numpy()
                    - first_pos[idx.to_numpy(zero_copy_only=False)] + 1)
            b = b.drop_columns(["__pos"])
            return b.append_column(rank_col, pa.array(rank, pa.int64()))

        return pos_ds.map_batches(per_key, batch_format="pyarrow")

    from ..partitions import shuffle_width

    joined = pos_ds.join(
        firsts_ds, "inner",
        num_partitions=shuffle_width(sum(counts)),
        on=(partition_col,))

    def finish_part(b: pa.Table) -> pa.Table:
        rank = (b.column("__pos").to_numpy()
                - b.column("__first").to_numpy() + 1)
        b = b.drop_columns(["__pos", "__first"])
        return b.append_column(rank_col, pa.array(rank, pa.int64()))

    return joined.map_batches(finish_part, batch_format="pyarrow")


def ntile_of_ranks(rank: np.ndarray, n: np.ndarray, k: int) -> np.ndarray:
    """SQL ntile(k) bucket (1-based) for 1-based ``rank`` out of ``n``
    rows: the first ``n mod k`` buckets get ``n//k + 1`` rows each."""
    big = n // k + 1
    n_big = n % k
    cut = n_big * big
    small = np.maximum(n // k, 1)
    return np.where(rank <= cut,
                    (rank - 1) // np.maximum(big, 1) + 1,
                    n_big + (rank - cut - 1) // small + 1).astype(np.int64)
