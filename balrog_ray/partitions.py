"""Shared shuffle-sizing rule: hash-join / groupby partition width
derived from the data instead of a literal.

One partition per ``rows_per_part`` rows of the larger input, clamped —
small inputs keep a cheap 8-partition plan, a 100x input widens the
shuffle instead of throttling on 8 reducers.  Every caller that sizes a
keyed shuffle from a row count goes through here so the constant is
tuned in exactly one place.
"""

from __future__ import annotations


def shuffle_width(rows: int, *, rows_per_part: int = 500_000,
                  lo: int = 8, hi: int = 512) -> int:
    return int(min(hi, max(lo, rows // rows_per_part + 1)))


def keyed_fold(ds, keys, fold_fn, *, num_partitions: int):
    """Co-locate all rows of each key into ONE block via a keyed hash
    shuffle, then run ``fold_fn`` once per block -- vectorized Arrow /
    numpy over many COMPLETE groups at a time.

    This is the high-cardinality groupby pattern.  Ray's sort-based
    ``groupby().aggregate()`` / ``map_groups`` spends Python time per
    GROUP (measured ~45us/group: 8-12s for a 150k-group sum at sf0.1),
    while a hash repartition plus an in-block ``pyarrow`` ``group_by``
    costs Arrow-kernel time per ROW (same job: 1.6-1.9s, and the gap
    widens with group count).  Low-cardinality groupbys should keep
    using partial-fold + ``groupby().aggregate()`` -- their per-group
    cost is negligible and they avoid this exchange's fixed latency.

    Each hash partition is finalized as exactly one block
    (ray.data hash_shuffle ``finalize`` builds a single block per
    partition id), so a key can never straddle two ``fold_fn`` calls;
    the scale obligation is the usual hash-join one -- size
    ``num_partitions`` (via :func:`shuffle_width`) so one partition
    fits a worker's heap.

    The HASH_SHUFFLE strategy is flipped on ``ds.context`` -- the
    per-plan ``DataContext`` copy ray.data captured when the root
    dataset was created (shared along this plan's chain, NOT the
    process-global context) -- so sibling pipelines keep the default
    sort-based strategy while this plan (and ops later chained onto
    its result) executes with hash shuffles.
    """
    from ray.data.context import ShuffleStrategy

    ds.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    return (ds.repartition(num_partitions, keys=list(keys),
                           shuffle=False)
            .map_batches(fold_fn, batch_format="pyarrow",
                         batch_size=None))
