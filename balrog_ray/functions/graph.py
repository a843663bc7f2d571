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

Node domain: the output holds one row per SOURCE node (distinct
``src``).  Sink (dst-only) nodes receive inflow during the iterations
but are excluded from the result -- they have no out-degree, hence no
defined contribution share -- and BOTH the distributed and broadcast
paths apply the same restriction, so the ``num_nodes`` gate never
changes the result row set.  Dangling-mass redistribution composes as
one extra groupby if a real graph needs it."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

#: Node-count ceiling for the driver-merged broadcast fast path of
#: pagerank_exact (~32 MB of int64 numerators); tests patch this to 0
#: to force the distributed join+groupby path on toy graphs.
_BROADCAST_MAX_NODES = 4_000_000


def _restrict_to_sources(result_ds, nodes_ds, value_col: str, *,
                         num_partitions: int):
    """Semi-join a per-node result onto the source-node domain
    (``nodes_ds``: distinct ``src`` rows).  The iteration bodies union
    inflow with seeds, so sink (dst-only) nodes accumulate inflow-only
    rows; this final filter drops them, aligning the distributed paths
    with the broadcast path's src-only domain (ADVICE r4: the two
    paths previously diverged on graphs with sinks)."""
    return (result_ds.join(nodes_ds.select_columns(["src"]), "inner",
                           num_partitions=num_partitions,
                           on=("node",), right_on=("src",))
            .select_columns(["node", value_col]))


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
    return _restrict_to_sources(ranks, nodes, "rank",
                                num_partitions=num_partitions)


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

    import ray
    from ray.data.aggregate import Count, Sum

    if iters < 1:
        raise ValueError("iters must be >= 1")
    a, b = damping
    if not (0 < a < b):
        raise ValueError("damping must be a proper fraction (a, b)")

    # LATENCY shape (the round-3 lesson, shared with bfs/sssp/kcore):
    # under the node-count broadcast gate the rank NUMERATORS -- node-
    # cardinality-bounded, exactly the class the gate admits -- ride
    # ray.put into per-block contribution partials that driver-merge
    # exactly (integer arithmetic is order-independent), one task run
    # per iteration with no hash exchange; edges stay distributed
    # either way.  Past the gate the join+groupby path below owns it.
    if num_nodes <= _BROADCAST_MAX_NODES:
        return _pagerank_exact_broadcast(
            edges_ds, num_nodes, iters=iters, damping=damping,
            num_partitions=num_partitions)

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
    return (_restrict_to_sources(nums, nodes, "num",
                                 num_partitions=num_partitions),
            num_nodes * F ** iters)


def _pagerank_exact_broadcast(edges_ds, num_nodes: int, *, iters: int,
                              damping: tuple[int, int],
                              num_partitions: int):
    """Under-gate body of :func:`pagerank_exact`: identical fixed-point
    integer arithmetic, but the node-bounded numerator vector is
    driver-held and each iteration is ONE task run of per-block
    contribution partials (np.unique/reduceat) merged driver-side --
    bit-identical to the distributed groupby because int64 addition is
    order-free.  Edges never leave the object store."""
    import math

    import ray
    import ray.data as _rd

    a, b = damping
    edges = _compact_nonempty(
        edges_ds.repartition(num_partitions).materialize())
    if edges is None:
        raise ValueError("pagerank_exact: empty edge set")

    def deg_partial(t: pa.Table) -> pa.Table:
        u, c = np.unique(t.column("src").to_numpy(),
                         return_counts=True)
        return pa.table({"node": pa.array(u, pa.int64()),
                         "deg": pa.array(c, pa.int64())})

    parts = [t for t in ray.get(
        edges.map_batches(deg_partial, batch_format="pyarrow")
        .materialize().to_arrow_refs()) if t.num_rows]
    nd = np.concatenate([t.column("node").to_numpy() for t in parts])
    dg = np.concatenate([t.column("deg").to_numpy() for t in parts])
    order = np.argsort(nd, kind="stable")
    nd, dg = nd[order], dg[order]
    starts = np.flatnonzero(np.r_[True, nd[1:] != nd[:-1]])
    nodes = nd[starts]
    deg = np.add.reduceat(dg, starts)

    L = math.lcm(*sorted(set(deg.tolist()))) if len(deg) else 1
    F = b * L
    if num_nodes * F ** iters > (1 << 62):
        raise ValueError(
            f"denominator {num_nodes} * {F}^{iters} overflows int64 "
            "numerators; use fewer iters or the float pagerank()")
    aL = a * L
    coeff_of_node = aL // deg                  # aligned with nodes
    nums = np.ones(len(nodes), np.int64)

    for it in range(iters):
        state_ref = ray.put((nodes, coeff_of_node * nums))

        def contrib_partial(t: pa.Table) -> pa.Table:
            nsorted, share = ray.get(state_ref)
            s = t.column("src").to_numpy()
            d = t.column("dst").to_numpy()
            pos = np.searchsorted(nsorted, s)   # precondition: all hit
            part = share[pos]
            u, inv = np.unique(d, return_inverse=True)
            tot = np.zeros(len(u), np.int64)
            np.add.at(tot, inv, part)
            return pa.table({"node": pa.array(u, pa.int64()),
                             "part": pa.array(tot, pa.int64())})

        ptabs = [t for t in ray.get(
            edges.map_batches(contrib_partial, batch_format="pyarrow")
            .materialize().to_arrow_refs()) if t.num_rows]
        inflow = np.zeros(len(nodes), np.int64)
        for t in ptabs:
            pn = t.column("node").to_numpy()
            pv = t.column("part").to_numpy()
            pos = np.searchsorted(nodes, pn)
            hit = (pos < len(nodes)) & (nodes[np.clip(pos, 0,
                                        len(nodes) - 1)] == pn)
            np.add.at(inflow, pos[hit], pv[hit])
        nums = inflow + np.int64((b - a) * L * F ** it)
    denom = num_nodes * F ** iters
    return (_rd.from_arrow(pa.table({
        "node": pa.array(nodes, pa.int64()),
        "num": pa.array(nums, pa.int64())})), denom)


def _compact_nonempty(ds):
    """Strip empty blocks from a MATERIALIZED dataset (metadata-only,
    no block is fetched): ray 2.49's hash ops skip their schema
    broadcast when an input's first submitted block is empty
    (hash_shuffle.py:223), which can present a zero-column partition to
    a downstream join's FieldRef; feeding joins only non-empty blocks
    sidesteps it without a re-blocking exchange.  Returns None when no
    rows remain (the caller's termination signal)."""
    import ray.data

    refs = [block_ref
            for bundle in ds.iter_internal_ref_bundles()
            for block_ref, meta in zip(bundle.block_refs,
                                       bundle.metadata)
            if (meta.num_rows or 0) > 0]
    if not refs:
        return None
    return ray.data.from_arrow_refs(refs)


def bfs_levels(edges_ds, seeds_ds, *, max_hops: int = 8,
               num_partitions: int = 8):
    """Multi-source BFS hop distance -- the crawl-frontier / link-depth
    role (CommonCrawl records hop depth from the seed list; depth is a
    standard quality prior alongside PageRank).

    ACTIVE-FRONT shape (the same rule the iterative raster stages
    follow): per hop the join ships ONLY the frontier -- nodes first
    reached last hop -- not the whole visited set, so total data motion
    is O(edges reachable) across the run, not O(edges x hops).

    LATENCY shape (the round-3 lesson: per-hop cost at toy scale is
    executor/exchange startup, not data -- bfs_hops spent 12.8 s on a
    1000-node graph): each hop is ONE materialized pipeline instead of
    round 3's four, the static edge set is materialized once instead
    of re-scanned per hop, and the visited-set subtraction is
    SIZE-GATED -- under ``broadcast_visited_max`` the visited node ids
    ride ``ray.put`` into a vectorized searchsorted filter (saving a
    whole hash-join exchange per hop); past the gate it falls back to
    the distributed ``left_anti`` join, so web-scale visited sets
    never pin the driver.  The visited set itself stays a Dataset
    end-to-end, growing by pure block union of materialized hops.

    ``seeds_ds`` holds one ``node`` column; returns ``(node, dist)``
    with ``dist`` the exact minimum hop count (int64), nodes beyond
    ``max_hops`` absent.  Under ``_BROADCAST_MAX_EDGES`` edges the
    whole walk runs driver-side over one collected (deduped, directed)
    edge CSR -- edge-bounded, zero per-hop pipelines; past the gate the
    loop below owns it."""
    import ray
    from ray.data.aggregate import Count

    broadcast_visited_max = 4_000_000      # ~32 MB of int64 node ids

    edges_ds = edges_ds.materialize()
    if edges_ds.count() <= _BROADCAST_MAX_EDGES:
        return _bfs_broadcast(edges_ds, seeds_ds, max_hops)

    def tag(dist):
        def fn(b: pa.Table, dist=dist) -> pa.Table:
            node = (b.column("node").cast(pa.int64())
                    if "node" in b.column_names
                    else pa.array([], pa.int64()))
            return pa.table({
                "node": node,
                "dist": pa.array(np.full(len(node), dist, np.int64),
                                 pa.int64())})
        return fn

    visited = _compact_nonempty(
        seeds_ds
        .groupby("node").aggregate(Count(alias_name="_c"))
        .map_batches(tag(0), batch_format="pyarrow")
        .materialize())
    if visited is None:
        raise ValueError("bfs_levels: empty seed set")
    frontier = visited.select_columns(["node"])
    # static across hops: materialize once, never re-scan the source
    edges = _compact_nonempty(
        edges_ds.repartition(num_partitions).materialize())
    if edges is None:
        return visited

    # driver-held sorted visited/frontier ids while under the broadcast
    # gate; None once a set outgrows it (the join paths then own it)
    vnodes = np.sort(np.concatenate(
        [t.column("node").to_numpy()
         for t in ray.get(visited.to_arrow_refs())]))
    fnodes = vnodes
    if len(vnodes) > broadcast_visited_max:
        vnodes = fnodes = None

    def to_node(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column("dst")})

    for k in range(1, max_hops + 1):
        if fnodes is not None:
            # broadcast-frontier expansion: a bounded frontier rides
            # ray.put into a searchsorted scan of the materialized edge
            # blocks -- a task-only hop with NO hash exchange (the
            # per-hop aggregator-pool spin-up was the bench's cost)
            fref = ray.put(fnodes)

            def expand(b: pa.Table) -> pa.Table:
                f = ray.get(fref)
                s = b.column("src").to_numpy()
                if len(f) == 0 or len(s) == 0:
                    return pa.table({"node": pa.array([], pa.int64())})
                pos = np.clip(np.searchsorted(f, s), 0, len(f) - 1)
                hit = f[pos] == s
                return pa.table({
                    "node": b.column("dst").filter(pa.array(hit))
                    .cast(pa.int64())})

            expanded = edges.map_batches(expand, batch_format="pyarrow")
        else:
            expanded = (frontier
                        .join(edges, "inner",
                              num_partitions=num_partitions,
                              on=("node",), right_on=("src",))
                        .map_batches(to_node, batch_format="pyarrow"))
        cand = (expanded
                .groupby("node").aggregate(Count(alias_name="_c"))
                .map_batches(tag(k), batch_format="pyarrow"))
        if vnodes is not None:
            vref = ray.put(vnodes)

            def drop_visited(b: pa.Table) -> pa.Table:
                v = ray.get(vref)
                nd = b.column("node").to_numpy()
                if len(v) == 0 or len(nd) == 0:
                    return b
                pos = np.clip(np.searchsorted(v, nd), 0, len(v) - 1)
                return b.filter(pa.array(v[pos] != nd))

            new = _compact_nonempty(
                cand.map_batches(drop_visited, batch_format="pyarrow")
                .materialize())
        else:
            new = _compact_nonempty(
                cand.join(visited.select_columns(["node"]), "left_anti",
                          num_partitions=num_partitions, on=("node",))
                .materialize())
        if new is None:
            break
        frontier = new.select_columns(["node"])
        visited = visited.union(new)
        if vnodes is not None:
            fresh = np.concatenate(
                [t.column("node").to_numpy()
                 for t in ray.get(new.to_arrow_refs())])
            fnodes = np.sort(fresh)
            vnodes = np.sort(np.concatenate([vnodes, fresh]))
            if len(vnodes) > broadcast_visited_max:
                vnodes = fnodes = None
        else:
            fnodes = None
    return visited


def _bfs_broadcast(eds_m, seeds_ds, max_hops: int):
    """Under-gate body of :func:`bfs_levels`: per-block directed-edge
    dedup partials merge on the driver (edge-bounded, admitted by the
    gate), then the multi-source frontier sweep runs over a numpy CSR
    -- identical (node, dist) output to the distributed loop (min hop
    distance is schedule-free)."""
    import ray
    import ray.data as _rd

    def dedup_part(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy()
        d = b.column("dst").to_numpy()
        order = np.lexsort((d, s))
        s, d = s[order], d[order]
        uniq = np.r_[True, (s[1:] != s[:-1]) | (d[1:] != d[:-1])]
        return pa.table({"src": pa.array(s[uniq], pa.int64()),
                         "dst": pa.array(d[uniq], pa.int64())})

    parts = [t for t in ray.get(
        eds_m.map_batches(dedup_part, batch_format="pyarrow")
        .materialize().to_arrow_refs()) if t.num_rows]
    seed_tabs = [t for t in ray.get(
        seeds_ds.materialize().to_arrow_refs()) if t.num_rows]
    empty = pa.table({"node": pa.array([], pa.int64()),
                      "dist": pa.array([], pa.int64())})
    if not seed_tabs:
        return _rd.from_arrow(empty)
    seed = np.unique(np.concatenate(
        [t.column("node").to_numpy(zero_copy_only=False)
         .astype(np.int64) for t in seed_tabs]))
    if parts:
        s = np.concatenate([t.column("src").to_numpy() for t in parts])
        d = np.concatenate([t.column("dst").to_numpy() for t in parts])
    else:
        s = d = np.empty(0, np.int64)
    nodes, inv = np.unique(np.concatenate([s, d, seed]),
                           return_inverse=True)
    is_ = inv[:len(s)]
    id_ = inv[len(s):len(s) + len(d)]
    iseed = inv[len(s) + len(d):]
    order = np.argsort(is_, kind="stable")
    A, B = is_[order], id_[order]
    indptr = np.zeros(len(nodes) + 1, np.int64)
    np.add.at(indptr, A + 1, 1)
    indptr = np.cumsum(indptr)
    dist = np.full(len(nodes), -1, np.int64)
    dist[iseed] = 0
    frontier = np.unique(iseed)
    for h in range(1, max_hops + 1):
        if len(frontier) == 0:
            break
        cnts = indptr[frontier + 1] - indptr[frontier]
        tot = int(cnts.sum())
        if tot == 0:
            break
        starts = np.repeat(indptr[frontier], cnts)
        off = np.arange(tot) - np.repeat(np.cumsum(cnts) - cnts, cnts)
        nb = np.unique(B[starts + off])
        new = nb[dist[nb] < 0]
        dist[new] = h
        frontier = new
    sel = dist >= 0
    return _rd.from_arrow(pa.table({
        "node": pa.array(nodes[sel], pa.int64()),
        "dist": pa.array(dist[sel], pa.int64())}))


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

    LATENCY shape (the round-3/4 lesson, shared with bfs/sssp/kcore/
    pagerank): under ``_BROADCAST_MAX_EDGES`` deduped edges the oriented
    edge set (edge-bounded, exactly the class the gate admits, ~64 MB at
    the gate) rides ``ray.put`` into chunked task-side wedge partials --
    one collect + one task run, no hash-join exchange; past the gate the
    join pipeline below owns it.

    Distributed stages (all Datasets, nothing edge-cardinality-sized on
    the driver): canonicalize + dedup undirected edges (one groupby),
    endpoint degrees (one groupby), two joins to attach degrees, the
    wedge self-join keyed on the shared low vertex, and a composite-key
    inner join of wedge closing pairs against the oriented edge set.
    Returns the exact triangle count (Python int)."""
    from ray.data.aggregate import Count

    edges_ds = edges_ds.materialize()
    if edges_ds.count() <= _BROADCAST_MAX_EDGES:
        return _triangle_count_broadcast(edges_ds)

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


#: deduped-edge ceiling for the broadcast wedge path (~64 MB of int64
#: pairs at the gate); tests patch to -1 to force the join pipeline.
_BROADCAST_MAX_EDGES = 4_000_000


def _collect_canon_edges(eds_m):
    """Per-block canonicalize+dedup partials of a MATERIALIZED (src,
    dst) edge Dataset merged on the driver -- edge-bounded, only ever
    called under `_BROADCAST_MAX_EDGES`.  Returns sorted unique
    undirected (u, v) arrays with self-loops dropped (possibly
    empty)."""
    import ray

    def canon_part(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy()
        d = b.column("dst").to_numpy()
        keep = s != d
        s, d = s[keep], d[keep]
        u = np.minimum(s, d)
        v = np.maximum(s, d)
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        uniq = np.r_[True, (u[1:] != u[:-1]) | (v[1:] != v[:-1])]
        return pa.table({"u": pa.array(u[uniq], pa.int64()),
                         "v": pa.array(v[uniq], pa.int64())})

    parts = [t for t in ray.get(
        eds_m.map_batches(canon_part, batch_format="pyarrow")
        .materialize().to_arrow_refs()) if t.num_rows]
    if not parts:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    u = np.concatenate([t.column("u").to_numpy() for t in parts])
    v = np.concatenate([t.column("v").to_numpy() for t in parts])
    order = np.lexsort((v, u))
    u, v = u[order], v[order]
    uniq = np.r_[True, (u[1:] != u[:-1]) | (v[1:] != v[:-1])]
    return u[uniq], v[uniq]


def _triangle_count_broadcast(eds_m) -> int:
    """Under-gate body of :func:`triangle_count`: per-block partial
    canon+dedup partials merge on the driver (edge-bounded, admitted by
    the gate), degrees/orientation/CSR build in one vectorized pass,
    and the wedge enumeration runs as TASK partials over slices of the
    oriented edge index space against the broadcast CSR + sorted edge
    keys -- wedge volume (sum of out-degree-squared, up to m^1.5) never
    exists in one place, and each task further chunks its expansion so
    per-task memory stays bounded."""
    import ray
    import ray.data as _rd

    u, v = _collect_canon_edges(eds_m)
    if len(u) == 0:
        return 0

    # compact node ids, degrees, total (degree, id) rank
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    deg = np.bincount(inv, minlength=len(nodes))
    iu, iv = inv[:len(u)], inv[len(u):]
    rk = np.empty(len(nodes), np.int64)
    rk[np.lexsort((nodes, deg))] = np.arange(len(nodes))
    swap = rk[iu] > rk[iv]
    A = np.where(swap, iv, iu)
    B = np.where(swap, iu, iv)
    # CSR over A with out-neighbors sorted by rank(B); every triangle
    # is exactly one wedge (two out-edges of its lowest-rank vertex)
    order2 = np.lexsort((rk[B], A))
    A, B = A[order2], B[order2]
    n = len(nodes)
    starts = np.flatnonzero(np.r_[True, A[1:] != A[:-1]])
    cnts = np.diff(np.r_[starts, len(A)])
    run_start = np.repeat(starts, cnts)
    run_cnt = np.repeat(cnts, cnts)
    ekey = np.sort(A * np.int64(n) + B)        # membership keys
    state_ref = ray.put((B, run_start, run_cnt, ekey, np.int64(n)))

    def wedge_partial(batch: pa.Table) -> pa.Table:
        Bx, rs, rc, ek, nn = ray.get(state_ref)
        lo = int(batch.column("id")[0].as_py())
        hi = int(batch.column("id")[batch.num_rows - 1].as_py()) + 1
        tot = 0
        CHUNK = 1 << 22                        # cap expansion rows
        i0 = lo
        while i0 < hi:
            # take a slice of first-edge indices whose expansion fits
            idx = np.arange(i0, hi)
            npart = rs[idx] + rc[idx] - idx - 1   # partners after i
            cum = np.cumsum(npart)
            cut = int(np.searchsorted(cum, CHUNK) + 1)
            idx = idx[:cut]
            npart = npart[:cut]
            i0 += cut
            total = int(npart.sum())
            if total == 0:
                continue
            first = np.repeat(idx, npart)
            off = np.arange(total) - np.repeat(
                np.cumsum(npart) - npart, npart)
            second = first + 1 + off
            closingk = Bx[first] * nn + Bx[second]
            pos = np.searchsorted(ek, closingk)
            ok = (pos < len(ek)) & (
                ek[np.clip(pos, 0, len(ek) - 1)] == closingk)
            tot += int(ok.sum())
        return pa.table({"n": pa.array([tot], pa.int64())})

    width = max(1, min(64, len(A) // 65_536 + 1))
    partials = (_rd.range(len(A), override_num_blocks=width)
                .map_batches(wedge_partial, batch_format="pyarrow",
                             batch_size=None)
                .materialize())
    return sum(r["n"] for r in partials.take_all())


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

    Per round: frontier x edges relaxation produces candidates, and the
    best-table UPDATE (the part bfs_levels pays an anti-join for) is a
    tagged union folded by one ``groupby(node).aggregate(Min)`` shuffle:
    best rows carry ``old = dist``, candidate rows ``old = INT64_MAX``,
    and ``min(dist) < min(old)`` marks exactly the improved nodes -- the
    next frontier -- with no per-group Python.  Per-round motion is
    O(|frontier| x avg-degree + |best|), the standard BSP-SSSP profile.

    LATENCY shape (the round-3 lesson, shared with bfs_levels): edges
    materialize ONCE instead of re-scanning per round, each round is a
    single materialized pipeline, and while the frontier stays under
    the broadcast gate its (node, dist) arrays ride ``ray.put`` into a
    searchsorted relaxation scan -- a task-only step with no hash-join
    exchange; past the gate the distributed join path owns it.

    ``edges_ds``: (src, dst, w) int64, w >= 0.  ``seeds_ds``: (node).
    Returns (node, dist int64): min over paths of <= ``rounds`` edges,
    unreachable nodes absent."""
    import ray
    from ray.data.aggregate import Count, Min

    _INF = np.iinfo(np.int64).max
    broadcast_frontier_max = _SSSP_BROADCAST_MAX

    def tag_seed(b: pa.Table) -> pa.Table:
        n = b.num_rows
        z = pa.array(np.zeros(n, np.int64), pa.int64())
        return pa.table({"node": b.column("node").cast(pa.int64()),
                         "dist": z, "old": z})

    # seed dedup (a node may appear in several seed blocks)
    best = _compact_nonempty(
        seeds_ds.groupby("node").aggregate(Count(alias_name="_c"))
        .map_batches(lambda b: tag_seed(
            b if "node" in b.column_names
            else pa.table({"node": pa.array([], pa.int64())})),
            batch_format="pyarrow")
        .materialize())
    if best is None:
        raise ValueError("sssp: empty seed set")
    edges = _compact_nonempty(
        edges_ds.repartition(num_partitions).materialize())
    if edges is None:
        return best.drop_columns(["old"])
    frontier = best

    def collect_frontier(ds):
        tabs = ray.get(ds.to_arrow_refs())
        nd = np.concatenate([t.column("node").to_numpy() for t in tabs])
        dd = np.concatenate([t.column("dist").to_numpy() for t in tabs])
        order = np.argsort(nd, kind="stable")
        return nd[order], dd[order]

    farrs = collect_frontier(frontier)
    if len(farrs[0]) > broadcast_frontier_max:
        farrs = None
    if farrs is not None:
        # fully driver-merged variant: while the best table stays under
        # the broadcast gate, each round is ONE task run of per-block
        # candidate-min partials (int64 min is associative+commutative,
        # so the driver merge is bit-identical to the groupby(node).Min
        # exchange it replaces); falls back to the distributed loop the
        # moment the best table outgrows the gate
        out = _sssp_broadcast(edges, farrs, rounds,
                              broadcast_frontier_max)
        if out is not None:
            return out

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
        if farrs is not None:
            fref = ray.put(farrs)

            def relax_scan(b: pa.Table) -> pa.Table:
                fn_, fd_ = ray.get(fref)
                s = b.column("src").to_numpy()
                if len(fn_) == 0 or len(s) == 0:
                    return pa.table({
                        "node": pa.array([], pa.int64()),
                        "dist": pa.array([], pa.int64()),
                        "old": pa.array([], pa.int64())})
                pos = np.clip(np.searchsorted(fn_, s), 0, len(fn_) - 1)
                hit = fn_[pos] == s
                d = (fd_[pos[hit]]
                     + b.column("w").to_numpy()[hit]).astype(np.int64)
                return pa.table({
                    "node": b.column("dst").filter(pa.array(hit))
                    .cast(pa.int64()),
                    "dist": pa.array(d, pa.int64()),
                    "old": pa.array(np.full(len(d), _INF, np.int64),
                                    pa.int64())})

            cand = edges.map_batches(relax_scan, batch_format="pyarrow")
        else:
            cand = (frontier
                    .join(edges, "inner", num_partitions=num_partitions,
                          on=("node",), right_on=("src",))
                    .map_batches(relaxed, batch_format="pyarrow"))
        # ONE materialize per round; frontier and best are cheap lazy
        # maps over it (typed even when empty, so the next round's hash
        # join never sees a schema-less block)
        folded_m = (best.union(cand)
                    .groupby("node")
                    .aggregate(Min("dist", alias_name="dist"),
                               Min("old", alias_name="old"))
                    .map_batches(
                        lambda b: b if "node" in b.column_names
                        else pa.table({
                            "node": pa.array([], pa.int64()),
                            "dist": pa.array([], pa.int64()),
                            "old": pa.array([], pa.int64())}),
                        batch_format="pyarrow")
                    .materialize())
        folded = _compact_nonempty(folded_m)
        if folded is None:
            break
        frontier = (folded.map_batches(improved_only,
                                       batch_format="pyarrow")
                    .materialize())
        best = folded.map_batches(
            lambda b: pa.table({"node": b.column("node"),
                                "dist": b.column("dist"),
                                "old": b.column("dist")}),
            batch_format="pyarrow")
        n_front = frontier.count()
        if n_front == 0:
            break
        if n_front <= broadcast_frontier_max:
            fc = _compact_nonempty(frontier)
            farrs = collect_frontier(fc) if fc is not None else None
            if farrs is None:
                break
        else:
            farrs = None
            fc = _compact_nonempty(frontier)
            if fc is None:
                break
            frontier = fc
    return best.drop_columns(["old"])


#: frontier/best-table ceiling for sssp's driver-merged rounds; tests
#: patch to -1 to force the distributed join+groupby loop.
_SSSP_BROADCAST_MAX = 4_000_000


def _sssp_broadcast(edges, farrs, rounds: int, gate: int):
    """Driver-merged Bellman-Ford rounds for :func:`sssp` while the
    best table fits the broadcast gate.  Each round: one task run of
    per-block (dst, min candidate) partials against the ``ray.put``
    frontier, merged driver-side -- bit-identical to the distributed
    ``groupby(node).Min`` because int64 min is order-free.  Returns the
    converged/capped (node, dist) Dataset, or None if the best table
    outgrows ``gate`` mid-run (the caller's distributed loop then
    restarts from the seeds -- correctness is unaffected; the restart
    costs at most one extra pass at the scale where it triggers)."""
    import ray
    import ray.data as _rd

    _INF = np.iinfo(np.int64).max
    fn, fd = (farrs[0].copy(), farrs[1].copy())
    bn, bd = fn.copy(), fd.copy()

    for _ in range(rounds):
        if len(fn) == 0:
            break
        fref = ray.put((fn, fd))

        def cand_partial(b: pa.Table, fref=fref) -> pa.Table:
            fn_, fd_ = ray.get(fref)
            s = b.column("src").to_numpy()
            empty = pa.table({"node": pa.array([], pa.int64()),
                              "dist": pa.array([], pa.int64())})
            if len(s) == 0 or len(fn_) == 0:
                return empty
            pos = np.clip(np.searchsorted(fn_, s), 0, len(fn_) - 1)
            hit = fn_[pos] == s
            if not hit.any():
                return empty
            dst = b.column("dst").to_numpy()[hit]
            d = (fd_[pos[hit]]
                 + b.column("w").to_numpy()[hit]).astype(np.int64)
            u, inv = np.unique(dst, return_inverse=True)
            md = np.full(len(u), _INF, np.int64)
            np.minimum.at(md, inv, d)
            return pa.table({"node": pa.array(u, pa.int64()),
                             "dist": pa.array(md, pa.int64())})

        parts = [t for t in ray.get(
            edges.map_batches(cand_partial, batch_format="pyarrow")
            .materialize().to_arrow_refs()) if t.num_rows]
        if not parts:
            break
        cn = np.concatenate([t.column("node").to_numpy()
                             for t in parts])
        cd = np.concatenate([t.column("dist").to_numpy()
                             for t in parts])
        order = np.argsort(cn, kind="stable")
        cn, cd = cn[order], cd[order]
        starts = np.flatnonzero(np.r_[True, cn[1:] != cn[:-1]])
        cn = cn[starts]
        cd = np.minimum.reduceat(cd, starts)

        pos = np.searchsorted(bn, cn)
        inb = (pos < len(bn)) & (bn[np.clip(pos, 0, len(bn) - 1)] == cn)
        upd = np.zeros(len(cn), bool)
        upd[inb] = cd[inb] < bd[pos[inb]]
        bd[pos[upd]] = cd[upd]           # in-place improvements first
        new = ~inb
        fn = np.concatenate([cn[upd], cn[new]])
        fd = np.concatenate([cd[upd], cd[new]])
        forder = np.argsort(fn, kind="stable")
        fn, fd = fn[forder], fd[forder]
        if new.any():
            bn = np.concatenate([bn, cn[new]])
            bd = np.concatenate([bd, cd[new]])
            border = np.argsort(bn, kind="stable")
            bn, bd = bn[border], bd[border]
        if len(bn) > gate:
            return None
    return _rd.from_arrow(pa.table({
        "node": pa.array(bn, pa.int64()),
        "dist": pa.array(bd, pa.int64())}))


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
    the fixed point within that budget).

    LATENCY shape (the round-3 lesson, shared with bfs_levels/sssp):
    under ``_BROADCAST_MAX_EDGES`` deduped edges the WHOLE peel runs
    driver-side over the collected canonical edge set (edge-bounded,
    exactly the class the gate admits; one collect, zero per-round
    pipelines); past it, two materialized pipelines per round, and
    while the SURVIVOR set stays under the broadcast gate its sorted
    ids ride ``ray.put`` into a searchsorted edge filter -- replacing
    the two hash semi-joins with one task-only map; past that gate the
    distributed join path owns the shrink."""
    import ray
    from ray.data.aggregate import Count

    broadcast_survivors_max = 4_000_000

    edges_ds = edges_ds.materialize()
    if edges_ds.count() <= _BROADCAST_MAX_EDGES:
        return _kcore_broadcast(edges_ds, k, max_rounds)

    def canon(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy()
        d = b.column("dst").to_numpy()
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table({"a": pa.array(np.minimum(s, d), pa.int64()),
                         "b": pa.array(np.maximum(s, d), pa.int64())})

    import ray.data as _rd

    edges = _compact_nonempty(
        edges_ds.map_batches(canon, batch_format="pyarrow")
        .groupby(["a", "b"]).aggregate(Count(alias_name="_c"))
        .drop_columns(["_c"])
        .materialize())
    if edges is None:
        return _rd.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "deg": pa.array([], pa.int64())}))

    def endpoints(b: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays([
            b.column("a").combine_chunks().cast(pa.int64()),
            b.column("b").combine_chunks().cast(pa.int64())])})

    def deg_partial(b: pa.Table) -> pa.Table:
        nodes = np.concatenate([b.column("a").to_numpy(),
                                b.column("b").to_numpy()])
        u, c = np.unique(nodes, return_counts=True)
        return pa.table({"node": pa.array(u, pa.int64()),
                         "deg": pa.array(c, pa.int64())})

    for _ in range(max_rounds):
        n_edges = edges.count()
        if n_edges == 0:
            return edges.map_batches(
                lambda b: pa.table({"node": pa.array([], pa.int64()),
                                    "deg": pa.array([], pa.int64())}),
                batch_format="pyarrow")
        if n_edges <= broadcast_survivors_max:
            # one task run: per-block (node, count) partials, merged
            # driver-side -- bounded by the gate, so the whole round is
            # two task-only runs with no shuffle op at all
            import ray.data

            parts = [t for t in ray.get(
                edges.map_batches(deg_partial, batch_format="pyarrow")
                .materialize().to_arrow_refs()) if t.num_rows]
            nd = np.concatenate([t.column("node").to_numpy()
                                 for t in parts])
            dg = np.concatenate([t.column("deg").to_numpy()
                                 for t in parts])
            order = np.argsort(nd, kind="stable")
            nd, dg = nd[order], dg[order]
            starts = np.flatnonzero(np.r_[True, nd[1:] != nd[:-1]])
            u = nd[starts]
            tot = np.add.reduceat(dg, starts)
            keep = tot >= k
            surv = u[keep]
            if len(surv) == len(u) or len(surv) == 0:  # fixed point
                return ray.data.from_arrow(pa.table({
                    "node": pa.array(u[keep], pa.int64()),
                    "deg": pa.array(tot[keep], pa.int64())}))
            sref = ray.put(surv)            # already sorted (unique)
        else:
            deg = (edges.map_batches(endpoints, batch_format="pyarrow")
                   .groupby("node").aggregate(Count(alias_name="deg"))
                   .materialize())
            n_all = deg.count()
            survivors = (deg.filter(expr=f"deg >= {k}")
                         .select_columns(["node"]).materialize())
            n_keep = survivors.count()
            if n_keep == n_all or n_keep == 0:  # fixed point / empty
                return deg.filter(expr=f"deg >= {k}")
            if n_keep <= broadcast_survivors_max:
                sv_ = np.sort(np.concatenate(
                    [t.column("node").to_numpy()
                     for t in ray.get(survivors.to_arrow_refs())
                     if t.num_rows]))
                sref = ray.put(sv_)
            else:
                sref = None
                surv_c = _compact_nonempty(survivors)

        if sref is not None:
            def shrink(b: pa.Table, sref=sref) -> pa.Table:
                sv = ray.get(sref)
                a = b.column("a").to_numpy()
                bb = b.column("b").to_numpy()
                pa_ = np.clip(np.searchsorted(sv, a), 0, len(sv) - 1)
                pb_ = np.clip(np.searchsorted(sv, bb), 0, len(sv) - 1)
                keep = (sv[pa_] == a) & (sv[pb_] == bb)
                return b.filter(pa.array(keep))

            nxt = _compact_nonempty(
                edges.map_batches(shrink,
                                  batch_format="pyarrow").materialize())
        else:
            nxt = _compact_nonempty(
                edges
                .join(surv_c, "inner", num_partitions=num_partitions,
                      on=("a",), right_on=("node",))
                .select_columns(["a", "b"])
                .join(surv_c, "inner", num_partitions=num_partitions,
                      on=("b",), right_on=("node",))
                .select_columns(["a", "b"])
                .materialize())
        if nxt is None:
            import ray.data

            return ray.data.from_arrow(pa.table({
                "node": pa.array([], pa.int64()),
                "deg": pa.array([], pa.int64())}))
        edges = nxt
    raise RuntimeError(
        f"kcore did not converge in {max_rounds} peel rounds -- "
        f"raise max_rounds (the oracle replays the same budget)")


def _kcore_broadcast(eds_m, k: int, max_rounds: int):
    """Under-gate body of :func:`kcore`: one canon-partial collect,
    then the simultaneous-drop peel runs as vectorized numpy over the
    edge-bounded arrays -- identical round semantics to the
    distributed loop (the k-core fixed point is unique, and the
    max_rounds raise counts the same simultaneous rounds)."""
    import ray.data as _rd

    u, v = _collect_canon_edges(eds_m)
    empty = pa.table({"node": pa.array([], pa.int64()),
                      "deg": pa.array([], pa.int64())})
    if len(u) == 0:
        return _rd.from_arrow(empty)
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    iu, iv = inv[:len(u)], inv[len(u):]
    alive_e = np.ones(len(u), bool)
    for _ in range(max_rounds):
        deg = np.bincount(iu[alive_e], minlength=len(nodes)) \
            + np.bincount(iv[alive_e], minlength=len(nodes))
        present = deg > 0          # nodes in the CURRENT edge set,
        keep = deg >= k            # exactly the distributed deg table
        if keep.sum() == present.sum():           # fixed point
            sel = np.flatnonzero(keep)
            return _rd.from_arrow(pa.table({
                "node": pa.array(nodes[sel], pa.int64()),
                "deg": pa.array(deg[sel], pa.int64())}))
        if not keep.any():
            return _rd.from_arrow(empty)
        alive_e = alive_e & keep[iu] & keep[iv]
    raise RuntimeError(
        f"kcore did not converge in {max_rounds} peel rounds -- "
        f"raise max_rounds (the oracle replays the same budget)")
