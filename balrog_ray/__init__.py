"""balrog_ray: Ray-Data-native BAL / spatial-join / dataflow engine.

Importing this package has NO side effects on Ray's process-global
state.  Application entry points (``__ray_entry__``, ``bench.py``, the
CLI, the test session) call :func:`tune_data_context` explicitly before
creating datasets; plan-local stages that need the same accounting
(``partitions.keyed_fold``) set it per-plan on ``ds.context``.
"""


def tune_data_context() -> None:
    """Set NOMINAL (0.01 CPU) per-partition reservations for hash
    exchange aggregator actors on the process-global DataContext.

    Ray 2.49's default ``min(1, (CPU/2)/num_partitions)`` reserves half
    the machine per hash op, so any plan stacking two+ hash exchanges
    (join -> groupby, keyed fold -> fold, the sieve contraction)
    starves its own producing map tasks on a small node -- a local
    deadlock observed at num_cpus=4.  Aggregators do their real work in
    finalize bursts; parallelism stays governed by actor count, so a
    nominal reservation is the correct accounting.

    Call BEFORE any Dataset is created (each plan snapshots the global
    DataContext at its root).  This is an explicit entry-point call --
    never run at import time -- so importing balrog_ray as a library
    cannot leak the tune into unrelated Ray Data pipelines in the same
    process; set BALROG_RAY_NO_CTX_TUNE=1 to make it a no-op for A/B
    runs.  Library users driving multi-hash-exchange queries at small
    CPU counts should call it themselves (or rely on the per-plan
    overrides ``partitions.keyed_fold`` applies to its own chain).
    """
    import os

    if os.environ.get("BALROG_RAY_NO_CTX_TUNE"):   # A/B escape hatch
        return
    from ray.data.context import DataContext

    ctx = DataContext.get_current()
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.01
    ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.01
    ctx.join_operator_actor_num_cpus_per_partition_override = 0.01
