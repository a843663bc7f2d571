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


#: Ray minor versions whose hash_shuffle finalize has been verified to
#: emit exactly one block per partition id (the keyed_fold contract).
#: Extend ONLY after re-reading ray.data's hash_shuffle aggregator for
#: the new version and re-running tests/test_keyed_fold.py.
_VERIFIED_RAY_MINORS = ("2.49",)
_contract_checked = False


def _check_fold_contract() -> None:
    """Fail loudly if running on a Ray version whose one-block-per-
    hash-partition finalize behaviour has not been re-verified.

    Checked once per process; see keyed_fold's docstring for why a
    silent change here would corrupt results rather than crash.
    """
    global _contract_checked
    if _contract_checked:
        return
    import os

    import ray

    minor = ".".join(ray.__version__.split(".")[:2])
    if (minor not in _VERIFIED_RAY_MINORS
            and not os.environ.get("BALROG_RAY_ASSUME_FOLD_CONTRACT")):
        raise RuntimeError(
            f"keyed_fold requires a verified Ray version: running "
            f"{ray.__version__}, verified minors {_VERIFIED_RAY_MINORS}. "
            "Ray's hash_shuffle finalize must emit exactly one block per "
            "partition or keys may straddle fold calls; re-verify the "
            "aggregator source and extend _VERIFIED_RAY_MINORS, or -- "
            "after verifying yourself (run tests/test_keyed_fold.py) -- "
            "set BALROG_RAY_ASSUME_FOLD_CONTRACT=1 to acknowledge."
        )
    _contract_checked = True


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

    VERSION COUPLING: the complete-groups guarantee rests on Ray
    2.49's hash_shuffle finalize emitting exactly ONE block per
    partition id (``HashShuffleAggregator`` concatenates each
    partition before yield; the upstream source carries a TODO to
    split large partitions to target block size).  If a future Ray
    starts splitting finalized partitions, a key could straddle two
    ``fold_fn`` calls and silently corrupt every consumer, so
    :func:`_check_fold_contract` hard-fails on unverified Ray
    versions rather than guessing.
    """
    from ray.data.context import ShuffleStrategy

    _check_fold_contract()
    ds.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    # Aggregator actors default to reserving CPU/2 per hash op
    # (min(1, (CPU/2)/num_partitions) each); a plan that stacks two+
    # hash exchanges (fold -> groupby, fold -> fold) then reserves the
    # whole machine for mostly-idle actors and the producing map tasks
    # starve -- a LOCAL deadlock at small num_cpus.  Aggregators do
    # their real work in finalize bursts, so a nominal reservation is
    # correct; parallelism stays governed by the actor count.
    ds.context.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.01
    ds.context.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.01
    ds.context.join_operator_actor_num_cpus_per_partition_override = 0.01
    # ops chained onto the fold's result inherit this plan's HASH
    # strategy; the default 200-partition / 64-actor hash aggregate
    # costs seconds of pool startup, so trailing groupbys reuse the
    # fold's own width (sized from the same data by shuffle_width)
    ds.context.default_hash_shuffle_parallelism = int(
        max(8, num_partitions))
    return (ds.repartition(num_partitions, keys=list(keys),
                           shuffle=False)
            .map_batches(fold_fn, batch_format="pyarrow",
                         batch_size=None))
