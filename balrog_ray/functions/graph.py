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


def bfs_levels(edges_ds, seeds_ds, *, max_hops: int = 8,
               num_partitions: int = 8):
    """Multi-source BFS hop distance -- the crawl-frontier / link-depth
    role (CommonCrawl records hop depth from the seed list; depth is a
    standard quality prior alongside PageRank).

    ACTIVE-FRONT shape (the same rule the iterative raster stages
    follow): per hop the join ships ONLY the frontier -- nodes first
    reached last hop -- not the whole visited set, so total data motion
    is O(edges reachable) across the run, not O(edges x hops).  Each hop
    is one frontier x edges hash join, a ``groupby(node)`` dedup, and a
    ``left_anti`` join against the visited set; the visited set stays a
    Dataset end-to-end.  Union outputs are re-blocked (``repartition``)
    before the next join -- union+groupby can emit schema-less empty
    blocks that break a following hash join.

    ``seeds_ds`` holds one ``node`` column; returns ``(node, dist)``
    with ``dist`` the exact minimum hop count (int64), nodes beyond
    ``max_hops`` absent."""
    from ray.data.aggregate import Count

    def tag(dist):
        def fn(b: pa.Table, dist=dist) -> pa.Table:
            return pa.table({
                "node": b.column("node"),
                "dist": pa.array(np.full(b.num_rows, dist, np.int64),
                                 pa.int64())})
        return fn

    frontier = (seeds_ds
                .groupby("node").aggregate(Count(alias_name="_c"))
                .drop_columns(["_c"])
                .repartition(num_partitions).materialize())
    visited = frontier.map_batches(tag(0),
                                   batch_format="pyarrow").materialize()

    def to_node(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column("dst")})

    for k in range(1, max_hops + 1):
        if frontier.count() == 0:
            break
        cand = (frontier
                .join(edges_ds, "inner", num_partitions=num_partitions,
                      on=("node",), right_on=("src",))
                .map_batches(to_node, batch_format="pyarrow")
                .groupby("node").aggregate(Count(alias_name="_c"))
                .drop_columns(["_c"])
                .repartition(num_partitions).materialize())
        if cand.count() == 0:
            # a drained frontier (no out-edges) leaves cand with ONLY
            # schema-less empty blocks -- repartition cannot restore a
            # schema from zero rows, and the anti-join below would fail
            # on an unresolvable FieldRef; terminate instead
            break
        new = (cand
               .join(visited.select_columns(["node"]), "left_anti",
                     num_partitions=num_partitions, on=("node",))
               .repartition(num_partitions).materialize())
        if new.count() == 0:
            break
        frontier = new
        visited = (visited
                   .union(new.map_batches(tag(k), batch_format="pyarrow"))
                   .repartition(num_partitions).materialize())
    return visited


def triangle_count(edges_ds, *, num_partitions: int = 8) -> int:
    """Exact distributed triangle count -- the graph-clustering /
    link-spam signal (triangle density separates organic link
    neighborhoods from farms; also the LSH-graph sanity metric).

    Degree-ordered orientation (the standard wedge-bound trick): each
    undirected edge is oriented from its lower-``(degree, id)`` endpoint
    to the higher, so every triangle has exactly ONE vertex with two
    out-edges and is generated as exactly one wedge.  Per-node wedge
    work is then O(min-degree-squared) -- bounded by arboricity -- not
    O(max-degree-squared), which is what makes the self-join survive
    power-law skew at web scale.

    Stages (all Datasets, nothing edge-cardinality-sized on the driver):
    canonicalize + dedup undirected edges (one groupby), endpoint
    degrees (one groupby), two joins to attach degrees, the wedge
    self-join keyed on the shared low vertex, and a composite-key inner
    join of wedge closing pairs against the oriented edge set.  Returns
    the exact triangle count (Python int)."""
    from ray.data.aggregate import Count

    def canon(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy()
        d = b.column("dst").to_numpy()
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table({"u": pa.array(np.minimum(s, d), pa.int64()),
                         "v": pa.array(np.maximum(s, d), pa.int64())})

    und = (edges_ds.map_batches(canon, batch_format="pyarrow")
           .groupby(["u", "v"]).aggregate(Count(alias_name="_c"))
           .drop_columns(["_c"])
           .repartition(num_partitions).materialize())

    def endpoints(b: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [b.column("u").combine_chunks(),
             b.column("v").combine_chunks()])})

    deg = (und.map_batches(endpoints, batch_format="pyarrow")
           .groupby("node").aggregate(Count(alias_name="deg"))
           .repartition(num_partitions).materialize())

    with_du = und.join(deg, "inner", num_partitions=num_partitions,
                       on=("u",), right_on=("node",))

    def rename_du(b: pa.Table) -> pa.Table:
        # post-join schema is (u, v, deg) -- the right key column is
        # dropped; rename deg -> du before attaching v's degree
        return b.rename_columns(["u", "v", "du"])

    with_both = (with_du.map_batches(rename_du, batch_format="pyarrow")
                 .join(deg, "inner", num_partitions=num_partitions,
                       on=("v",), right_on=("node",)))

    def orient(b: pa.Table) -> pa.Table:
        u = b.column("u").to_numpy()
        v = b.column("v").to_numpy()
        du = b.column("du").to_numpy()
        dv = b.column("deg").to_numpy()
        # lower (deg, id) endpoint first; ids are distinct so the
        # composite order is total
        u_first = (du < dv) | ((du == dv) & (u < v))
        a = np.where(u_first, u, v)
        bb = np.where(u_first, v, u)
        dbb = np.where(u_first, dv, du)
        return pa.table({"a": pa.array(a, pa.int64()),
                         "b": pa.array(bb, pa.int64()),
                         "db": pa.array(dbb, pa.int64())})

    oriented = (with_both.map_batches(orient, batch_format="pyarrow")
                .repartition(num_partitions).materialize())

    def rename_right(b: pa.Table) -> pa.Table:
        return b.rename_columns(["a2", "c", "dc"])

    wedges = oriented.join(
        oriented.map_batches(rename_right, batch_format="pyarrow")
        .repartition(num_partitions),
        "inner", num_partitions=num_partitions,
        on=("a",), right_on=("a2",))

    def closing(b: pa.Table) -> pa.Table:
        bn = b.column("b").to_numpy()
        db = b.column("db").to_numpy()
        cn = b.column("c").to_numpy()
        dc = b.column("dc").to_numpy()
        # strict (deg, id) order kills both the diagonal and the
        # mirrored duplicate of each unordered out-neighbor pair
        keep = (db < dc) | ((db == dc) & (bn < cn))
        return pa.table({"x": pa.array(bn[keep], pa.int64()),
                         "y": pa.array(cn[keep], pa.int64())})

    closed = (wedges.map_batches(closing, batch_format="pyarrow")
              .repartition(num_partitions)
              .join(oriented.select_columns(["a", "b"]), "inner",
                    num_partitions=num_partitions,
                    on=("x", "y"), right_on=("a", "b")))
    return closed.count()


def sssp(edges_ds, seeds_ds, *, rounds: int, num_partitions: int = 8):
    """Multi-source shortest paths over non-negative integer weights --
    frontier Bellman-Ford (the link-distance / crawl-cost role; also the
    graph twin of ``stages/cost.py``'s raster cost-distance).

    Invariant that makes the oracle exact: after round ``k`` the table
    equals the k-step Bellman-Ford fold ``d_k(v) = min dist over paths
    of <= k edges`` -- relaxing only from the ACTIVE FRONT (nodes whose
    distance improved in round k-1) provably yields the same ``d_k`` as
    relaxing every node, so a SQL chain of k min-folds replays it
    exactly, converged or not.

    Per round: one frontier x edges inner join (keyed by ``src``)
    produces candidates, and the best-table UPDATE (the part
    bfs_levels pays an anti-join for) is a tagged union folded by one
    ``groupby(node).aggregate(Min)`` shuffle:
    best rows carry ``old = dist``, candidate rows ``old = INT64_MAX``,
    and ``min(dist) < min(old)`` marks exactly the improved nodes -- the
    next frontier -- with no per-group Python.  Per-round motion is
    O(|frontier| x avg-degree + |best|), the standard BSP-SSSP profile.

    ``edges_ds``: (src, dst, w) int64, w >= 0.  ``seeds_ds``: (node).
    Returns (node, dist int64): min over paths of <= ``rounds`` edges,
    unreachable nodes absent."""
    from ray.data.aggregate import Count, Min

    _INF = np.iinfo(np.int64).max

    def tag_seed(b: pa.Table) -> pa.Table:
        n = b.num_rows
        z = pa.array(np.zeros(n, np.int64), pa.int64())
        return pa.table({"node": b.column("node").cast(pa.int64()),
                         "dist": z, "old": z})

    # seed dedup (a node may appear in several seed blocks)
    best = (seeds_ds.groupby("node").aggregate(Count(alias_name="_c"))
            .drop_columns(["_c"])
            .map_batches(tag_seed, batch_format="pyarrow")
            .repartition(num_partitions).materialize())
    frontier = best

    def relaxed(b: pa.Table) -> pa.Table:
        n = b.num_rows
        d = (b.column("dist").to_numpy()
             + b.column("w").to_numpy()).astype(np.int64)
        return pa.table({
            "node": b.column("dst").cast(pa.int64()),
            "dist": pa.array(d, pa.int64()),
            "old": pa.array(np.full(n, _INF, np.int64), pa.int64())})

    def improved_only(b: pa.Table) -> pa.Table:
        d = b.column("dist").to_numpy()
        keep = d < b.column("old").to_numpy()
        dk = pa.array(d[keep], pa.int64())
        return pa.table({
            "node": pa.array(b.column("node").to_numpy()[keep],
                             pa.int64()),
            "dist": dk, "old": dk})

    for _ in range(rounds):
        if frontier.count() == 0:
            break
        cand = (frontier
                .join(edges_ds, "inner", num_partitions=num_partitions,
                      on=("node",), right_on=("src",))
                .map_batches(relaxed, batch_format="pyarrow"))
        # ONE materialize per round; frontier and best are cheap lazy
        # maps over it (typed even when empty, so the next round's hash
        # join never sees a schema-less block)
        folded = (best.union(cand)
                  .groupby("node")
                  .aggregate(Min("dist", alias_name="dist"),
                             Min("old", alias_name="old"))
                  .repartition(num_partitions).materialize())
        # repartition collapses the schema-less empty blocks a sparse
        # late-round frontier inherits from union+groupby -- they break
        # the next round's hash join (FieldRef has no schema to bind)
        frontier = (folded.map_batches(improved_only,
                                       batch_format="pyarrow")
                    .repartition(num_partitions).materialize())
        best = folded.map_batches(
            lambda b: pa.table({"node": b.column("node"),
                                "dist": b.column("dist"),
                                "old": b.column("dist")}),
            batch_format="pyarrow")
    return best.drop_columns(["old"])


def kcore(edges_ds, k: int, *, max_rounds: int = 32,
          num_partitions: int = 8):
    """Exact k-core decomposition membership -- the graph-curation
    density filter (link-farm cores, dense social subgraphs, the
    standard "peel the periphery" preprocessing before community
    detection).

    Peeling is the textbook fixed-point: drop every node with degree
    < k, recompute degrees on the surviving edges, repeat until no node
    drops.  Distributed shape per round: one ``groupby(node).count`` on
    the CURRENT edge set for degrees, then TWO hash semi-joins (edges x
    surviving nodes on each endpoint) to shrink the edge set -- the
    survivors table is the join side, never a driver broadcast, so no
    step is node-cardinality-sized on the driver.  The edge set shrinks
    monotonically, so total motion across the run is bounded by
    O(edges x rounds-with-change); converged rounds are free (the loop
    exits on the first round that removes nothing).

    Input edges may be directed / duplicated / self-looped: they are
    canonicalized to unique undirected ``a < b`` pairs first.  Returns
    ``(node, deg)`` -- members of the k-core with their within-core
    degree (int64).  Deterministic: peeling order cannot change the
    fixed point (the k-core is unique).

    Raises after ``max_rounds`` without convergence (the oracle replays
    a FIXED number of peel rounds, so the engine must prove it reached
    the fixed point within that budget)."""
    from ray.data.aggregate import Count

    def canon(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy()
        d = b.column("dst").to_numpy()
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table({"a": pa.array(np.minimum(s, d), pa.int64()),
                         "b": pa.array(np.maximum(s, d), pa.int64())})

    edges = (edges_ds.map_batches(canon, batch_format="pyarrow")
             .groupby(["a", "b"]).aggregate(Count(alias_name="_c"))
             .drop_columns(["_c"])
             .repartition(num_partitions).materialize())

    def endpoints(b: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays([
            b.column("a").combine_chunks().cast(pa.int64()),
            b.column("b").combine_chunks().cast(pa.int64())])})

    for _ in range(max_rounds):
        if edges.count() == 0:
            return edges.map_batches(
                lambda b: pa.table({"node": pa.array([], pa.int64()),
                                    "deg": pa.array([], pa.int64())}),
                batch_format="pyarrow")
        deg = (edges.map_batches(endpoints, batch_format="pyarrow")
               .groupby("node").aggregate(Count(alias_name="deg"))
               .repartition(num_partitions).materialize())
        n_all = deg.count()
        survivors = (deg.filter(expr=f"deg >= {k}")
                     .select_columns(["node"])
                     .repartition(num_partitions).materialize())
        n_keep = survivors.count()
        if n_keep == n_all:                     # fixed point reached
            return deg.filter(expr=f"deg >= {k}")
        if n_keep == 0:
            return deg.filter(expr=f"deg >= {k}")  # empty core, typed
        edges = (edges
                 .join(survivors, "inner",
                       num_partitions=num_partitions,
                       on=("a",), right_on=("node",))
                 .select_columns(["a", "b"])
                 .join(survivors, "inner",
                       num_partitions=num_partitions,
                       on=("b",), right_on=("node",))
                 .select_columns(["a", "b"])
                 .repartition(num_partitions).materialize())
    raise RuntimeError(
        f"kcore did not converge in {max_rounds} peel rounds -- "
        f"raise max_rounds (the oracle replays the same budget)")
