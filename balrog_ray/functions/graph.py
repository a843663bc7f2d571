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

    nodes = edges_deg.groupby("src") \
        .aggregate(Count(alias_name="_c")).materialize()

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


def pagerank_exact(edges_ds, num_nodes: int, *, iters: int = 8,
                   damping: tuple[int, int] = (17, 20),
                   num_partitions: int = 8):
    """BIT-EXACT PageRank: identical distributed shape to
    :func:`pagerank`, but ranks are integer NUMERATORS over a common
    denominator that grows by a fixed factor per iteration -- fixed-point
    rational arithmetic, so the result is deterministic to the last bit
    under ANY summation order (float PageRank can land exactly on a
    decimal rounding boundary -- the 0.15/0.85 rationals produce
    half-integers at 1e-9 scale -- where association noise flips the
    rounded digit).

    With damping a/b and L = lcm(distinct out-degrees), one iteration in
    numerator space is ``num' = (b-a)*L*F^k  +  sum (a*L/deg) * num``
    with per-iteration denominator factor ``F = b*L`` (every coefficient
    is an exact int64).  Returns ``(ranks_ds, denominator)`` where
    ``ranks_ds`` holds ``(node, num)`` int64 numerators and
    ``denominator = num_nodes * F**iters`` (a Python int); the true rank
    is ``num / denominator`` exactly.  Raises if the denominator would
    overflow int64 numerators -- deep iteration counts belong to the
    float path."""
    import math

    from ray.data.aggregate import Count, Sum

    if iters < 1:
        raise ValueError("iters must be >= 1")
    a, b = damping
    if not (0 < a < b):
        raise ValueError("damping must be a proper fraction (a, b)")

    deg = edges_ds.groupby("src").aggregate(Count(alias_name="deg"))
    edges_deg = edges_ds.join(
        deg, "inner", num_partitions=num_partitions,
        on=("src",)).materialize()

    degs = sorted({r["deg"] for r in
                   deg.groupby("deg")
                   .aggregate(Count(alias_name="_n")).take_all()})
    L = math.lcm(*degs) if degs else 1
    F = b * L
    if num_nodes * F ** iters > (1 << 62):
        raise ValueError(
            f"denominator {num_nodes} * {F}^{iters} overflows int64 "
            "numerators; use fewer iters or the float pagerank()")

    nodes = edges_deg.groupby("src") \
        .aggregate(Count(alias_name="_c")).materialize()

    def init_nums(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node": batch.column("src"),
            "num": pa.array(np.ones(batch.num_rows, np.int64),
                            pa.int64())})

    nums = nodes.map_batches(init_nums,
                             batch_format="pyarrow").materialize()
    aL = a * L

    def contribs(batch: pa.Table) -> pa.Table:
        coeff = aL // batch.column("deg").to_numpy()
        return pa.table({
            "node": batch.column("dst"),
            "part": pa.array(coeff * batch.column("num").to_numpy(),
                             pa.int64())})

    agg_sum = Sum("part", alias_name="num")
    for k in range(iters):
        seed_val = (b - a) * L * F ** k

        def seed_rows(batch: pa.Table, seed_val=seed_val) -> pa.Table:
            return pa.table({
                "node": batch.column("src"),
                "part": pa.array(np.full(batch.num_rows, seed_val,
                                         np.int64), pa.int64())})

        inflow = (edges_deg
                  .join(nums, "inner", num_partitions=num_partitions,
                        on=("src",), right_on=("node",))
                  .map_batches(contribs, batch_format="pyarrow"))
        nums = (inflow
                .union(nodes.map_batches(seed_rows,
                                         batch_format="pyarrow"))
                .groupby("node")
                .aggregate(agg_sum)
                .repartition(num_partitions)
                .materialize())
    return nums, num_nodes * F ** iters
