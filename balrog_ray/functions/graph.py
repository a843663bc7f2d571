"""Distributed PageRank over an edge table -- the web-graph quality
weighting role in crawl curation (CommonCrawl ranks hosts by centrality;
quality-weighted sampling uses it as a prior).

Ray-Data-first shape: ranks live as a ``(node, rank)`` Dataset, never on
the driver.  Each iteration is

* ONE hash join (edges x current ranks, keyed by ``src``) producing
  per-edge contributions ``rank/out_degree``,
* a ``groupby(dst).sum`` combining inflow, unioned with the static
  ``(1-d)/N`` teleport seed rows so nodes with no in-edges keep their
  base rank without a second join.

Out-degrees are joined onto the edge table ONCE up front (both
materialized -- they are static across iterations).  Per-iteration data
motion is O(edges) join + O(nodes) aggregate; nothing node- or
edge-cardinality-sized ever reaches the driver.  Iterations are O(10),
exactly the full-pass cost profile of the distributed LM train and
k-means stages.

Precondition: every node has at least one out-edge (guaranteed by the
synthetic graphs here; dangling-mass redistribution composes as one
extra groupby if a real graph needs it)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def pagerank(edges_ds, num_nodes: int, *, damping: float = 0.85,
             iters: int = 8, num_partitions: int = 8):
    """``edges_ds``: Dataset of ``(src:int64, dst:int64)``.  Returns a
    Dataset of ``(node:int64, rank:float64)`` after ``iters`` power
    iterations from the uniform start."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    if iters < 1:
        raise ValueError("iters must be >= 1")
    d = float(damping)
    base = (1.0 - d) / num_nodes

    deg = (edges_ds.groupby("src")
           .aggregate(Count(alias_name="deg")))
    edges_deg = edges_ds.join(
        deg, "inner", num_partitions=num_partitions,
        on=("src",)).materialize()

    nodes = edges_deg.groupby("src").aggregate(Count(alias_name="_c"))

    def seed_rows(b: pa.Table) -> pa.Table:
        return pa.table({
            "node": b.column("src"),
            "part": pa.array(np.full(b.num_rows, base), pa.float64())})

    seeds = nodes.map_batches(seed_rows,
                              batch_format="pyarrow").materialize()

    def init_ranks(b: pa.Table) -> pa.Table:
        return pa.table({
            "node": b.column("src"),
            "rank": pa.array(np.full(b.num_rows, 1.0 / num_nodes),
                             pa.float64())})

    ranks = nodes.map_batches(init_ranks,
                              batch_format="pyarrow").materialize()

    def contribs(b: pa.Table) -> pa.Table:
        share = (b.column("rank").to_numpy()
                 / b.column("deg").to_numpy()) * d
        return pa.table({"node": b.column("dst"),
                         "part": pa.array(share, pa.float64())})

    agg_sum = Sum("part", alias_name="rank")

    for _ in range(iters):
        inflow = (edges_deg
                  .join(ranks, "inner", num_partitions=num_partitions,
                        on=("src",), right_on=("node",))
                  .map_batches(contribs, batch_format="pyarrow"))
        # repartition before the next join: the union+groupby pipeline
        # emits schema-LESS empty blocks, and an empty-schema block on
        # the join's build side makes acero's key FieldRef unresolvable
        ranks = (inflow.union(seeds)
                 .groupby("node")
                 .aggregate(agg_sum)
                 .repartition(num_partitions)
                 .materialize())
    return ranks
