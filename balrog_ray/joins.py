"""Shared join plumbing: the anti-join-against-a-small-key-table shape
used by checkpoint resume (SURVEY op 44), quarantine filtering and dedup
survivor selection.  The key table is bounded (bad rows / dup victims /
committed partitions); the big side streams through the hash join."""

from __future__ import annotations


def anti_join_keys(ds, keys_ds, id_col: str, key_col: str,
                   *, num_partitions: int = 8):
    """Stream ``ds`` minus the rows whose ``id_col`` appears in
    ``keys_ds[key_col]``."""
    return ds.join(keys_ds, "left_anti", num_partitions=num_partitions,
                   on=(id_col,), right_on=(key_col,))
