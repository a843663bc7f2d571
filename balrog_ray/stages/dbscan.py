"""Distributed DBSCAN over a point table -- the density-based spatial
clustering op (PostGIS ``ST_ClusterDBSCAN``'s role; the reference's
database side clusters addresses with gist-indexed distance queries,
this is the shuffle-native restatement).

Semantics (deterministic, matching the brute-force oracle exactly):

* ``|N_eps(p)| >= min_pts`` (the neighborhood INCLUDES p itself --
  sklearn's convention) makes p a CORE point;
* clusters = connected components of core points within ``eps``;
  cluster id = min member id (the engine's union-find convention);
* a non-core point within ``eps`` of >= 1 core point is a BORDER point
  and joins the SMALLEST cluster id among its core neighbors (the
  classic attachment ambiguity resolved by a total order);
* everything else is NOISE (empty cluster_id).

Scale shape -- nothing point-cardinality-sized touches the driver:

1. ONE cell-keyed exchange finds every eps-pair: points land in their
   ``floor(coord / eps)`` grid cell plus 8 GHOST copies, so each
   point's complete eps-neighborhood is present in its home cell's
   group (exact degree in one pass) and every eps-pair is emitted
   exactly once (the smaller id's home group owns it).
2. Core flags are a stateless filter over the degree rows.
3. Edges pick up endpoint coreness via two id-keyed hash joins;
   core-core edges feed the existing tree-reduce
   ``connected_components``; singleton cores keep their own id via a
   left join + fill.
4. Border attachment is one groupby(min) over (non-core, neighbor
   cluster) rows; the final labeling is one more left join.

Dense cells cost O(population^2) inside their group -- the standard
DBSCAN grid bound; salt eps downward or pre-aggregate duplicates if a
single cell would not fit a task.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_CELL_MIX = np.int64(1 << 31)


def _emit_cells(eps: float, id_col: str, x_col: str, y_col: str):
    def fn(b: pa.Table) -> pa.Table:
        x = b.column(x_col).to_numpy()
        y = b.column(y_col).to_numpy()
        cx = np.floor(x / eps).astype(np.int64)
        cy = np.floor(y / eps).astype(np.int64)
        cell_l, home_l, idx_l = [], [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                cell_l.append((cx + dx) * _CELL_MIX + (cy + dy))
                home_l.append(np.full(len(x), dx == 0 and dy == 0))
                idx_l.append(np.arange(len(x)))
        take = pa.array(np.concatenate(idx_l), pa.int64())
        return pa.table({
            "cell": pa.array(np.concatenate(cell_l), pa.int64()),
            "home": pa.array(np.concatenate(home_l), pa.bool_()),
            id_col: b.column(id_col).take(take),
            x_col: b.column(x_col).take(take),
            y_col: b.column(y_col).take(take)})

    return fn


def _per_cell(eps: float, id_col: str, x_col: str, y_col: str):
    e2 = float(eps) * float(eps)
    empty = pa.table({"id_a": pa.array([], pa.string()),
                      "id_b": pa.array([], pa.string()),
                      "deg": pa.array([], pa.int64())})

    def fn(group: pa.Table) -> pa.Table:
        ids = np.asarray(group.column(id_col).to_pylist())
        x = group.column(x_col).to_numpy()
        y = group.column(y_col).to_numpy()
        home = group.column("home").to_numpy(zero_copy_only=False)
        hi = np.flatnonzero(home)
        if len(hi) == 0:
            return empty
        d2 = ((x[hi, None] - x[None, :]) ** 2
              + (y[hi, None] - y[None, :]) ** 2)
        close = d2 <= e2
        # every eps-neighbor of a home point (incl. itself) appears in
        # this group exactly once (home if co-celled, else one ghost)
        deg = close.sum(axis=1).astype(np.int64)
        rows_a, rows_b = np.nonzero(close)
        a_ids = ids[hi][rows_a]
        b_ids = ids[rows_b]
        # exactly-once edges: home-home pairs appear twice HERE (both
        # rows), cross-cell pairs once here + once in the other point's
        # home cell -- 'home id smaller' keeps exactly one copy of each
        keep = a_ids < b_ids
        deg_rows = pa.table({
            "id_a": pa.array(ids[hi].tolist(), pa.string()),
            "id_b": pa.array([""] * len(hi), pa.string()),
            "deg": pa.array(deg, pa.int64())})
        edge_rows = pa.table({
            "id_a": pa.array(a_ids[keep].tolist(), pa.string()),
            "id_b": pa.array(b_ids[keep].tolist(), pa.string()),
            "deg": pa.array(np.full(int(keep.sum()), -1), pa.int64())})
        return pa.concat_tables([deg_rows, edge_rows])

    return fn


#: sentinel ids unioned into every join-side dataset: empty (and even
#: schema-bearing empty) blocks break acero key resolution inside the
#: join's internal shuffle (the quirk documented in functions/graph.py),
#: and repartition leaves empty partitions schema-less too -- so each
#: side gets ONE sentinel row PER PARTITION (the count follows
#: num_partitions, never fewer), guaranteeing every block carries rows
#: and therefore a schema.  Sentinels use impossible ids (real ids must
#: not start with NUL) and are dropped in finalize().


def _sentinel_ids(n: int) -> list[str]:
    return [f"\x00s{i}" for i in range(max(n, 1))]


def _plus_sentinels(ds, cols: dict, num_partitions: int):
    """union per-partition sentinel rows in, then repartition so every
    output block holds at least one row (schema everywhere).  ``cols``
    maps column name -> constant value or a callable(n) returning the
    n per-partition values (id columns use :func:`_sentinel_ids`)."""
    import ray.data

    n = max(num_partitions, 1)
    tab = pa.table({name: pa.array([v] * n) if not callable(v)
                    else pa.array(v(n))
                    for name, v in cols.items()})
    return (ds.union(ray.data.from_arrow(tab))
            .repartition(n).materialize())


def _sent_ids(n: int) -> list[str]:
    return _sentinel_ids(n)


def dbscan(points_ds, *, eps: float, min_pts: int,
           id_col: str = "site_id", x_col: str = "x", y_col: str = "y",
           num_partitions: int = 8):
    """Point Dataset (string ids) -> Dataset of ``(id, role,
    cluster_id)``; role = 'core' / 'border' / 'noise', cluster_id = ''
    for noise."""
    import pyarrow.compute as pc

    from ..functions.components import connected_components

    mixed = (points_ds
             .select_columns([id_col, x_col, y_col])
             .map_batches(_emit_cells(eps, id_col, x_col, y_col),
                          batch_format="pyarrow")
             .groupby("cell")
             .map_groups(_per_cell(eps, id_col, x_col, y_col),
                         batch_format="pyarrow")
             .materialize())

    core = _plus_sentinels(
        mixed.filter(expr="deg >= 0")
        .map_batches(lambda b, mp=min_pts: pa.table({
            "pid": b.column("id_a"),
            "is_core": pc.greater_equal(b.column("deg"),
                                        pa.scalar(mp))}),
            batch_format="pyarrow"),
        {"pid": _sent_ids, "is_core": False}, num_partitions)
    edges = _plus_sentinels(
        mixed.filter(expr="deg == -1").select_columns(["id_a", "id_b"]),
        {"id_a": _sent_ids, "id_b": _sent_ids}, num_partitions)

    def flagify(name):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table({name: b.column("pid"),
                             f"{name}_core": b.column("is_core")})
        return fn

    tagged = (edges
              .join(core.map_batches(flagify("ca"),
                                     batch_format="pyarrow"),
                    "inner", num_partitions=num_partitions,
                    on=("id_a",), right_on=("ca",))
              # a join's own no-match output partitions are schema-less
              # empties too -- rebuild blocks before the second join
              .repartition(num_partitions).materialize()
              .join(core.map_batches(flagify("cb"),
                                     batch_format="pyarrow"),
                    "inner", num_partitions=num_partitions,
                    on=("id_b",), right_on=("cb",))
              .repartition(num_partitions)
              .materialize())

    # sentinel edges form a CYCLE (self-edges would be dropped by the
    # union-find contraction, leaving comp empty and schema-less again)
    cc_edges = _plus_sentinels(
        tagged.filter(expr="ca_core and cb_core")
        .select_columns(["id_a", "id_b"]),
        {"id_a": _sent_ids,
         "id_b": lambda n: (_sentinel_ids(n)[1:]
                            + _sentinel_ids(n)[:1])}, num_partitions)
    comp = connected_components(cc_edges, "id_a", "id_b") \
        .repartition(num_partitions).materialize()

    # cluster id per core point: component min-id, or itself (singleton
    # core with no core neighbor); the sentinel rides along as its own
    # "core" so the join chain never sees an empty side
    cores_only = _plus_sentinels(
        core.filter(expr="is_core").select_columns(["pid"]),
        {"pid": _sent_ids}, num_partitions)
    cluster = (cores_only
               .join(comp, "left_outer", num_partitions=num_partitions,
                     on=("pid",), right_on=("doc_id",))
               .map_batches(lambda b: pa.table({
                   "core_id": b.column("pid"),
                   "cluster_id": pc.coalesce(b.column("component_id"),
                                             b.column("pid"))}),
                   batch_format="pyarrow")
               .repartition(num_partitions)
               .materialize())
    # border candidates: one-core edges -> (non-core point, core
    # neighbor's cluster) -> min per point
    def one_core(b: pa.Table) -> pa.Table:
        a = b.column("id_a").to_pylist()
        bb = b.column("id_b").to_pylist()
        ac = b.column("ca_core").to_pylist()
        bc = b.column("cb_core").to_pylist()
        pid, cp = [], []
        for i, j, p, q in zip(a, bb, ac, bc):
            if p != q:
                pid.append(j if p else i)
                cp.append(i if p else j)
        return pa.table({"pid": pa.array(pid, pa.string()),
                         "corep": pa.array(cp, pa.string())})

    def min_cluster(group: pa.Table) -> pa.Table:
        cl = min(group.column("cluster_id").to_pylist())
        return pa.table({
            "bid": pa.array([group.column("pid")[0].as_py()],
                            pa.string()),
            "bcluster": pa.array([cl], pa.string())})

    border = (_plus_sentinels(
                  tagged.map_batches(one_core, batch_format="pyarrow"),
                  {"pid": _sent_ids, "corep": _sent_ids},
                  num_partitions)
              .join(cluster, "inner", num_partitions=num_partitions,
                    on=("corep",), right_on=("core_id",))
              .groupby("pid")
              .map_groups(min_cluster, batch_format="pyarrow")
              .repartition(num_partitions)
              .materialize())
    labeled = (core
               .join(cluster, "left_outer",
                     num_partitions=num_partitions,
                     on=("pid",), right_on=("core_id",))
               .repartition(num_partitions).materialize()
               .join(border, "left_outer",
                     num_partitions=num_partitions,
                     on=("pid",), right_on=("bid",)))

    def finalize(b: pa.Table) -> pa.Table:
        ids = b.column("pid").to_pylist()
        is_core = b.column("is_core").to_pylist()
        clu = b.column("cluster_id").to_pylist()
        bcl = b.column("bcluster").to_pylist()
        role, cid = [], []
        for c, cl, bc in zip(is_core, clu, bcl):
            if c:
                role.append("core")
                cid.append(cl)
            elif bc is not None:
                role.append("border")
                cid.append(bc)
            else:
                role.append("noise")
                cid.append("")
        out = pa.table({id_col: pa.array(ids, pa.string()),
                        "role": pa.array(role, pa.string()),
                        "cluster_id": pa.array(cid, pa.string())})
        return out.filter(pc.invert(pc.starts_with(out.column(id_col),
                                                   "\x00")))

    return labeled.map_batches(finalize, batch_format="pyarrow")
