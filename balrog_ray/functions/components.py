"""Connected components over a duplicate-pair edge table, plus canonical
survivor selection -- the step that turns near-dup PAIRS (minhash / simhash
/ n-gram Jaccard / embedding output) into dedup GROUPS and a kept-docs
table.  The reference has no graph op (its dedup is `select distinct geom`,
data_prep/gnaf/create_buffered_points.sql:5-8); this is part of the
engine's beyond-reference training-data surface.

Scale design (tree-reduce contraction):

1. per-block union-find contracts each edge block to its spanning forest
   (<= nodes_in_block - 1 edges), union-by-min so every local root is the
   block-local minimum of its tree;
2. optional middle rounds repartition the forests and contract again
   (forest-of-forests stays a forest, connectivity is preserved);
3. the final exact union-find labels the fully contracted forest in one
   task whose input is bounded by the number of distinct node ids that
   appear in ANY pair -- the duplicate set, not the corpus.  Every real
   dedup workload has |dup nodes| << |corpus|; if the dup graph itself
   were corpus-scale, add middle rounds (``levels``) so each task stays
   bounded and only the final labeling grows.

The per-edge union-find walk is a Python loop by necessity (pointer
chasing has no Arrow kernel); it touches only pair rows, never documents.
"""

from __future__ import annotations

import pyarrow as pa


def _union_find_table(tab: pa.Table, a_col: str, b_col: str,
                      emit_all_nodes: bool) -> pa.Table:
    """Union-find over one block of edges; emits the spanning forest as
    (a_col=root, b_col=node) rows with root = min id of the tree.  With
    ``emit_all_nodes`` also emits (root, root) self-rows so isolated
    roots survive into the final labeling."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    a_vals = tab.column(a_col).to_pylist()
    b_vals = tab.column(b_col).to_pylist()
    for a, b in zip(a_vals, b_vals):
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        if rb < ra:
            ra, rb = rb, ra
        parent[rb] = ra        # union by min: root is its tree's minimum

    roots, nodes = [], []
    for x in set(a_vals) | set(b_vals):
        r = find(x)
        if r != x or emit_all_nodes:
            roots.append(r)
            nodes.append(x)
    a_type = tab.schema.field(a_col).type
    b_type = tab.schema.field(b_col).type
    return pa.table({a_col: pa.array(roots, a_type),
                     b_col: pa.array(nodes, b_type)})


def connected_components(pairs_ds, id_a: str = "id_a", id_b: str = "id_b",
                         *, levels: int = 2, mid_blocks: int = 8):
    """(id_a, id_b) edge Dataset -> (doc_id, component_id) Dataset for
    every node appearing in any pair; component_id = min member id.
    ``levels`` >= 2 adds middle contraction rounds for corpus-scale dup
    graphs."""
    if levels < 2:
        raise ValueError("levels must be >= 2 (partial + final)")

    def contract(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        return _union_find_table(b, id_a, id_b, emit_all_nodes=False)

    def final_label(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_id": b.column(id_b),
                             "component_id": b.column(id_a)})
        lab = _union_find_table(b, id_a, id_b, emit_all_nodes=True)
        return pa.table({"doc_id": lab.column(id_b),
                         "component_id": lab.column(id_a)})

    ds = (pairs_ds.select_columns([id_a, id_b])
          .map_batches(contract, batch_size=None, batch_format="pyarrow"))
    for _ in range(levels - 2):
        ds = (ds.repartition(mid_blocks)
              .map_batches(contract, batch_size=None,
                           batch_format="pyarrow"))
    return (ds.repartition(1)
            .map_batches(final_label, batch_size=None,
                         batch_format="pyarrow"))


def dedup_survivors(docs_ds, components_ds, id_col: str = "doc_id"):
    """Keep one canonical doc per component (the min id) plus every doc
    in no component at all: anti-join the corpus against the victim set
    (component members that are not their component's minimum).  The
    victim table is bounded by the dup count, the corpus streams."""
    def victims(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.not_equal(b.column("doc_id"), b.column("component_id"))
        return pa.table({"__victim": b.filter(keep).column("doc_id")})

    v = components_ds.map_batches(victims, batch_format="pyarrow")
    return docs_ds.join(v, "left_anti", num_partitions=8,
                        on=(id_col,), right_on=("__victim",))
