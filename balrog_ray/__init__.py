"""balrog_ray: Ray-Data-native BAL / spatial-join / dataflow engine.

Import-time execution policy: hash-exchange aggregator actors reserve a
NOMINAL 0.01 CPU per partition instead of ray 2.49's default
``min(1, (CPU/2)/num_partitions)``.  The default reserves half the
machine per hash op, so any plan stacking two+ hash exchanges (join ->
groupby, keyed fold -> fold, the sieve contraction) starves its own
producing map tasks on a small node -- a local deadlock observed at
num_cpus=4.  Aggregators do their real work in finalize bursts;
parallelism stays governed by actor count, so a nominal reservation is
the correct accounting.  Set BEFORE any Dataset is created because each
plan snapshots the global DataContext at its root.
"""


def _tune_data_context() -> None:
    import os

    if os.environ.get("BALROG_RAY_NO_CTX_TUNE"):   # A/B escape hatch
        return
    from ray.data.context import DataContext

    ctx = DataContext.get_current()
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.01
    ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.01
    ctx.join_operator_actor_num_cpus_per_partition_override = 0.01


_tune_data_context()
