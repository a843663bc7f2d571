"""Driver-gate query registry: Ray-Data pipelines + matching DuckDB SQL.

Every entry exercises one operator family from SURVEY.md §2 against the
driver's TPC-H-ish parquet tables.  The Ray side is written scale-first:
columns pruned at the read, small dimensions broadcast (dict capture /
``ray.put``), large-large joins through ``Dataset.join``, aggregations as
built-in groupby aggregates (hash-shuffled) or ``map_groups`` where exact
median/session semantics demand whole-group access.

Column names are aligned with the SQL aliases (the driver compares
sorted-by-name value hashes).  Aggregates that would be float-order
sensitive (avg/sum of arbitrary doubles) are avoided in favour of exact
ones (counts, min/max, sums of integer-valued columns).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _read(sf_dir: str, table: str, columns=None, row_filter=None):
    """Column-pruned (and optionally row-filtered) parquet read.
    ``row_filter`` is a pyarrow dataset expression pushed INTO the scan:
    row groups whose statistics exclude the predicate never leave
    storage -- the prune-at-the-read rule for selective queries."""
    import ray.data

    return ray.data.read_parquet(
        f"{sf_dir}/{table}.parquet",
        columns=list(columns) if columns else None,
        filter=row_filter)


def _agg():
    import ray.data.aggregate as agg

    return agg


def _join_parts(sf_dir: str, *tables: str) -> int:
    """Hash-join shuffle width from the larger PRE-FILTER input's
    parquet footer row count (metadata-only; filters only shrink) --
    the shared :func:`balrog_ray.partitions.shuffle_width` rule."""
    from ..partitions import shuffle_width

    return shuffle_width(
        max(pq.read_metadata(f"{sf_dir}/{t}.parquet").num_rows
            for t in tables))


def _collect(ds) -> pa.Table:
    """Driver-side collect of a SMALL result Dataset (post-aggregate /
    per-batch-partial tables only -- never a full input).  An all-empty
    dataset returns a schema-preserving empty table so callers' loops
    degrade to empty results instead of crashing."""
    import ray

    # materialize FIRST: to_arrow_refs on a lazy dataset runs the plan
    # AND a limit-1 schema probe -- two full executions of an
    # aggregate-rooted plan (measured 2x phase cost on winsorize)
    tabs = ray.get(ds.materialize().to_arrow_refs())
    non_empty = [t for t in tabs if t.num_rows]
    if non_empty:
        return pa.concat_tables(non_empty)
    return tabs[0] if tabs else pa.table({})


#: Broadcast gate for dimension lookups: a dim whose parquet footer
#: exceeds this row count is attached via a distributed hash join, not
#: a driver read + ray.put.  2M rows ~= TPC-H `part` at SF10; above
#: that, pinning the dim in the driver and every task closure is the
#: scale failure the 100 TB bar forbids.
_DIM_BROADCAST_MAX_ROWS = 2_000_000

#: Test hook: monkeypatch to True to force the distributed-join path of
#: _attach_dim/_attach_small regardless of size (tests/test_dim_gate.py).
_FORCE_DIM_JOIN = False


def _sidecar_join(fact_ds, dim_ds, *, key: str, fact_schema: pa.Schema,
                  dim_schema: pa.Schema, width: int):
    """Distributed INNER attach of a unique-keyed dim Dataset onto a
    fact Dataset via ONE keyed hash repartition (the keyed_fold
    machinery): both sides are tagged with a ``__side`` marker and
    unioned, every key's rows land in one block (ray's shard builder
    null-unifies the two schemas), and a vectorized searchsorted fold
    attaches the dim attrs to the fact rows.

    Used instead of ``Dataset.join`` for the dim-attach shape because
    ray 2.49's join finalize builds ZERO-COLUMN tables for partitions
    whose side never broadcast a schema (an input whose first shuffled
    block is empty -- e.g. a sparsely filtered aggregate -- skips the
    schema broadcast, hash_shuffle.py:223), crashing pyarrow's join;
    the fold degrades to an empty typed table instead.  Both schemas
    must share exactly the ``key`` column name."""
    import numpy as _np

    from ..partitions import keyed_fold

    attrs = [n for n in dim_schema.names if n != key]
    out_fields = ([(n, fact_schema.field(n).type)
                   for n in fact_schema.names]
                  + [(a, dim_schema.field(a).type) for a in attrs])

    def tag(side: int):
        def f(b: pa.Table) -> pa.Table:
            return b.append_column(
                "__side", pa.array(_np.full(b.num_rows, side, _np.int8)))
        return f

    def empty_out() -> pa.Table:
        return pa.table({n: pa.array([], t) for n, t in out_fields})

    def fold(b: pa.Table) -> pa.Table:
        # single-side partitions arrive WITHOUT the other side's
        # columns (unification is per-shard-builder); both degenerate
        # to the empty inner-join result
        if (b.num_rows == 0
                or any(a not in b.column_names for a in attrs)
                or any(n not in b.column_names
                       for n in fact_schema.names)):
            return empty_out()
        side = b.column("__side").to_numpy()
        keys = b.column(key).to_numpy(zero_copy_only=False)
        dsel = side == 1
        dk = keys[dsel]
        if len(dk) == 0 or dsel.all():
            return empty_out()
        dord = np.argsort(dk, kind="stable")
        dks = dk[dord]
        fsel = ~dsel
        fk = keys[fsel]
        pos = np.clip(np.searchsorted(dks, fk), 0, len(dks) - 1)
        hit = dks[pos] == fk
        fb = b.filter(pa.array(fsel)).filter(pa.array(hit))
        take_idx = pa.array(dord[pos[hit]], pa.int64())
        dmask = pa.array(dsel)
        cols = {n: fb.column(n).cast(t)
                for n, t in out_fields if n not in attrs}
        for a in attrs:
            cols[a] = pc.take(b.column(a).filter(dmask),
                              take_idx).cast(dim_schema.field(a).type)
        return pa.table(cols)

    u = (fact_ds.map_batches(tag(0), batch_format="pyarrow")
         .union(dim_ds.map_batches(tag(1), batch_format="pyarrow")))
    return keyed_fold(u, [key], fold, num_partitions=width)


def _arrow_schema(ds) -> pa.Schema:
    """Arrow schema of a Dataset (executes a minimal prefix if needed)."""
    sch = ds.schema(fetch_if_missing=True)
    base = getattr(sch, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    return pa.schema(list(zip(sch.names, sch.types)))


def _attach_small(fact_ds, dim_tab: pa.Table, *, fact_key: str,
                  dim_key: str, join_width: int,
                  max_broadcast_rows: int = _DIM_BROADCAST_MAX_ROWS):
    """INNER-attach the non-key columns of ``dim_tab`` (a
    driver-materialized, UNIQUE-keyed table) onto ``fact_ds`` rows,
    size-gated: under the gate the dim is ``ray.put`` once and every
    batch joins via masked searchsorted + ``pc.take`` (misses dropped --
    inner semantics, never an out-of-range index); past the gate (or
    under ``_FORCE_DIM_JOIN``) it falls back to the distributed
    :func:`_sidecar_join`.  Both paths emit fact columns (fact_key
    name kept) + dim attr columns with identical names and types."""
    import ray
    import ray.data

    attrs = [c for c in dim_tab.column_names if c != dim_key]
    if dim_tab.num_rows > max_broadcast_rows or _FORCE_DIM_JOIN:
        if dim_key != fact_key:
            dim_tab = dim_tab.rename_columns(
                [fact_key if c == dim_key else c
                 for c in dim_tab.column_names])
        return _sidecar_join(fact_ds, ray.data.from_arrow(dim_tab),
                             key=fact_key,
                             fact_schema=_arrow_schema(fact_ds),
                             dim_schema=dim_tab.schema,
                             width=join_width)

    keys = dim_tab.column(dim_key).to_numpy(zero_copy_only=False)
    order = np.argsort(keys, kind="stable")
    dim_ref = ray.put((keys[order],
                       dim_tab.select(attrs).take(pa.array(order))))

    def attach(b: pa.Table) -> pa.Table:
        k, attr_tab = ray.get(dim_ref)
        fk = b.column(fact_key).to_numpy(zero_copy_only=False)
        if len(k) == 0:
            b = b.slice(0, 0)
            for name in attrs:
                b = b.append_column(name, attr_tab.column(name))
            return b
        pos = np.clip(np.searchsorted(k, fk), 0, len(k) - 1)
        hit = k[pos] == fk
        if not hit.all():
            b = b.filter(pa.array(hit))
            pos = pos[hit]
        idx = pa.array(pos, pa.int64())
        for name in attrs:
            b = b.append_column(
                name, pc.take(attr_tab.column(name), idx))
        return b

    return fact_ds.map_batches(attach, batch_format="pyarrow")


#: key-cardinality gate for _keyed_scan: ray's sort-based
#: groupby().map_groups dispatches groups in Python (~45us/group,
#: partitions.py:56-60), while the keyed_fold hash exchange carries a
#: ~1s aggregator-pool latency independent of key count (measured at
#: sf0.1: every per-key scan converted to keyed_fold regressed +0.9s
#: at 1.5k-15k keys; 45us x 30k = 1.35s is the crossover)
_SCAN_KEYS_GATE = 30_000


def _key_domain(sf_dir: str, table: str, col: str) -> int:
    """Metadata-only key-cardinality bound: footer min/max of a dense
    integer key column (no data read).  Returns a PAST-THE-GATE
    sentinel when any row group lacks statistics -- an unknown bound
    must choose the plan whose cost does not grow with key count."""
    md = pq.ParquetFile(f"{sf_dir}/{table}.parquet").metadata
    idx = md.schema.to_arrow_schema().get_field_index(col)
    mn = mx = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or st.min is None or st.max is None:
            return 1 << 62
        mn = st.min if mn is None else min(mn, st.min)
        mx = st.max if mx is None else max(mx, st.max)
    return int(mx - mn + 1) if mx is not None else 0


def _keyed_scan(ds, key: str, fold, *, sf_dir: str, table: str,
                num_partitions: int, stat_col: str | None = None):
    """Per-key scan dispatch.  ``fold`` must be written for MANY
    complete key runs per block (sort by key inside, run-boundary
    sweeps) -- such a fold is also a correct ``map_groups`` callable
    (a single-key block is one run), so BOTH plans share one body:

    * under ``_SCAN_KEYS_GATE`` keys (footer min/max domain bound,
      metadata-only) the sort-based ``groupby(key).map_groups`` wins --
      per-group dispatch beats the hash exchange's ~1s fixed
      aggregator-pool latency at small cardinality;
    * past it, ONE ``keyed_fold`` hash exchange owns the scan -- its
      cost is independent of key count, while per-group dispatch grows
      linearly (the web-scale side of the split)."""
    n_keys = _key_domain(sf_dir, table, stat_col or key)
    if n_keys <= _SCAN_KEYS_GATE:
        return ds.groupby(key).map_groups(fold, batch_format="pyarrow")
    from ..partitions import keyed_fold

    return keyed_fold(ds, [key], fold, num_partitions=num_partitions)


def _attach_dim(fact_ds, sf_dir: str, table: str, *, fact_key: str,
                dim_key: str, columns, row_filter=None, transform=None,
                join_width: int | None = None,
                max_broadcast_rows: int = _DIM_BROADCAST_MAX_ROWS):
    """INNER-join dimension columns from ``{table}.parquet`` onto
    ``fact_ds`` by unique key, size-gated on the dim's parquet FOOTER
    row count (metadata-only -- no data is read to decide).

    Under the gate the (filtered, ``transform``ed) dim is collected
    once and broadcast via :func:`_attach_small`'s searchsorted path;
    past it the dim stays a distributed Dataset and a hash
    ``Dataset.join`` attaches the attrs -- no driver ever materializes
    a table that grows with SF.  ``transform`` must be a pure
    ``pa.Table -> pa.Table`` batch function reducing the read columns
    to ``dim_key`` + attr columns (it runs inside tasks on the join
    path); attr misses never reach it -- FK semantics are inner either
    way.  Replaces the round-3 unconditional ``pq.read_table`` dim
    pattern (VERDICT r3 item 1; the scale-safe analogue of the
    reference's dim join, 02_create_nvis_bal_map_table.sql:54-101)."""
    meta_rows = pq.read_metadata(f"{sf_dir}/{table}.parquet").num_rows
    width = join_width if join_width is not None else \
        _join_parts(sf_dir, table)
    if meta_rows > max_broadcast_rows or _FORCE_DIM_JOIN:
        dim_ds = _read(sf_dir, table, columns, row_filter=row_filter)
        if transform is not None:
            dim_ds = dim_ds.map_batches(transform, batch_format="pyarrow")
        # dim schema derived deterministically from the parquet footer
        # + transform on an empty slice (no data read, no execution)
        file_sch = pq.read_schema(f"{sf_dir}/{table}.parquet")
        empty = pa.table({c: pa.array([], file_sch.field(c).type)
                          for c in columns})
        dim_sch = (transform(empty) if transform is not None
                   else empty).schema
        if dim_key != fact_key:
            dim_ds = dim_ds.rename_columns({dim_key: fact_key})
            idx = dim_sch.get_field_index(dim_key)
            dim_sch = dim_sch.set(
                idx, dim_sch.field(idx).with_name(fact_key))
        return _sidecar_join(fact_ds, dim_ds, key=fact_key,
                             fact_schema=_arrow_schema(fact_ds),
                             dim_schema=dim_sch, width=width)
    dim_tab = pq.read_table(f"{sf_dir}/{table}.parquet",
                            columns=list(columns),
                            filters=row_filter)
    if transform is not None:
        dim_tab = transform(dim_tab)
    return _attach_small(fact_ds, dim_tab, fact_key=fact_key,
                         dim_key=dim_key, join_width=width,
                         max_broadcast_rows=max(max_broadcast_rows,
                                                dim_tab.num_rows))


def _partial_count_sums(ds, key: str | list[str], sum_cols: dict[str, str],
                        count_alias: str | None = None,
                        max_cols: dict[str, str] | None = None):
    """Low-cardinality groupby pushed partial: each batch collapses to
    <= n_distinct(key) rows (count + integer-exact sums per key) via an
    in-batch Arrow group_by, so the trailing shuffle moves O(batches*keys)
    tiny rows instead of the full table -- the combiner-before-groupby
    shape the 100 TB bar requires (and the same partial/final pattern as
    the reference's chunked union, 04_merge_geometries.py:129-205).

    ``sum_cols`` maps input column -> output alias.  Summed columns keep
    their input arithmetic type (int sums stay int64 when cast upstream).
    """
    keys = [key] if isinstance(key, str) else list(key)
    max_cols = max_cols or {}

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            cols = {k: b.column(k) for k in keys}
            if count_alias:
                cols[count_alias] = pa.array([], pa.int64())
            for c, alias in sum_cols.items():
                cols[alias] = b.column(c)
            for c, alias in max_cols.items():
                cols[alias] = b.column(c)
            return pa.table(cols)
        aggs = ([([], "count_all")] if count_alias else []) + \
            [(c, "sum") for c in sum_cols] + \
            [(c, "max") for c in max_cols]
        g = b.group_by(keys).aggregate(aggs)
        out = {k: g.column(k) for k in keys}
        if count_alias:
            out[count_alias] = g.column("count_all")
        for c, alias in sum_cols.items():
            out[alias] = g.column(f"{c}_sum")
        for c, alias in max_cols.items():
            out[alias] = g.column(f"{c}_max")
        return pa.table(out)

    a = _agg()
    finals = ([a.Sum(count_alias, alias_name=count_alias)]
              if count_alias else []) + \
        [a.Sum(n, alias_name=n) for n in sum_cols.values()] + \
        [a.Max(n, alias_name=n) for n in max_cols.values()]
    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(keys if len(keys) > 1 else keys[0])
            .aggregate(*finals))


# --------------------------------------------------------------------------
# 1. reclassify: range-remap DSL over a numeric column (SURVEY op 3)

RECLASS_SPEC = "1 10 101;11 20 102;21 30 103;31 40 104;41 50 105"


def q_reclassify_bins(sf_dir: str):
    from ..core.remap import apply_remap

    def remap_batch(b: pa.Table) -> pa.Table:
        cls = apply_remap(b.column("l_quantity").to_numpy(), RECLASS_SPEC,
                          out_dtype=np.int64)
        return pa.table({"qty_class": pa.array(cls, pa.int64())})

    return _partial_count_sums(
        _read(sf_dir, "lineitem", ["l_quantity"])
        .map_batches(remap_batch, batch_format="pyarrow"),
        "qty_class", {}, count_alias="n")


SQL_RECLASSIFY = """
select case
  when l_quantity >= 1  and l_quantity < 10.0001 then 101
  when l_quantity >= 11 and l_quantity < 20.0001 then 102
  when l_quantity >= 21 and l_quantity < 30.0001 then 103
  when l_quantity >= 31 and l_quantity < 40.0001 then 104
  when l_quantity >= 41 and l_quantity < 50.0001 then 105
  else cast(trunc(l_quantity) as bigint) end as qty_class,
  count(*) as n
from lineitem group by 1
"""


# --------------------------------------------------------------------------
# 2. broadcast dimension lookup join (SURVEY op 29)

def q_region_customers(sf_dir: str):
    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    r_name = dict(zip(region.column("r_regionkey").to_pylist(),
                      region.column("r_name").to_pylist()))
    n_region = dict(zip(nation.column("n_nationkey").to_pylist(),
                        nation.column("n_regionkey").to_pylist()))

    def add_region(b: pa.Table) -> pa.Table:
        nk = b.column("c_nationkey").to_pylist()
        names = [r_name[n_region[k]] for k in nk]
        return pa.table({"region_name": pa.array(names, pa.string()),
                         "c_acctbal": b.column("c_acctbal")})

    a = _agg()
    return (_read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])
            .map_batches(add_region, batch_format="pyarrow")
            .groupby("region_name")
            .aggregate(a.Count(alias_name="n_customers"),
                       a.Max("c_acctbal", alias_name="max_acctbal"),
                       a.Min("c_acctbal", alias_name="min_acctbal")))


SQL_REGION_CUSTOMERS = """
select r_name as region_name, count(*) as n_customers,
       max(c_acctbal) as max_acctbal, min(c_acctbal) as min_acctbal
from customer
join nation on c_nationkey = n_nationkey
join region on n_regionkey = r_regionkey
group by r_name
"""


# --------------------------------------------------------------------------
# 3. zonal-style group stats incl. exact median (SURVEY op 36)

def q_zonal_group_stats(sf_dir: str):
    """Exact per-group stats incl. median, scale-safe: the shuffle is keyed
    by the COMPOSITE (group, value) pair -- no task ever holds a whole
    3-key group (lineitem/3 at scale).  The driver sees only the value-count
    table, bounded by #groups x #distinct values (l_quantity is a small
    discrete domain; a continuous column would use a fixed-width histogram
    + refine pass instead)."""
    vc = _partial_count_sums(
        _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"]),
        ["l_returnflag", "l_quantity"], {}, count_alias="vn")
    tab = _collect(vc)
    flags = np.asarray(tab.column("l_returnflag").to_pylist())
    vals = tab.column("l_quantity").to_numpy().astype(np.float64)
    cnts = tab.column("vn").to_numpy().astype(np.int64)
    out = {"l_returnflag": [], "n": [], "min_qty": [], "max_qty": [],
           "med_qty": [], "sum_qty": []}
    for flag in sorted(set(flags.tolist())):
        sel = flags == flag
        v, c = vals[sel], cnts[sel]
        out["l_returnflag"].append(flag)
        out["n"].append(int(c.sum()))
        out["min_qty"].append(float(v.min()))
        out["max_qty"].append(float(v.max()))
        out["med_qty"].append(_weighted_median(v, c))
        out["sum_qty"].append(float((v * c).sum()))
    return pa.table({
        "l_returnflag": pa.array(out["l_returnflag"], pa.string()),
        "n": pa.array(out["n"], pa.int64()),
        "min_qty": pa.array(out["min_qty"], pa.float64()),
        "max_qty": pa.array(out["max_qty"], pa.float64()),
        "med_qty": pa.array(out["med_qty"], pa.float64()),
        "sum_qty": pa.array(out["sum_qty"], pa.float64())})


SQL_ZONAL_GROUP_STATS = """
select l_returnflag, count(*) as n, min(l_quantity) as min_qty,
       max(l_quantity) as max_qty, median(l_quantity) as med_qty,
       sum(l_quantity) as sum_qty
from lineitem group by l_returnflag
"""


# --------------------------------------------------------------------------
# 4. cell assignment / point-in-rectangle binning (SURVEY ops 38, H3 role)

def q_cell_assignment(sf_dir: str):
    def assign(b: pa.Table) -> pa.Table:
        ck = b.column("c_custkey").to_numpy()
        px = (ck * 37) % 1000
        py = (ck * 91) % 1000
        return pa.table({"cell_x": pa.array(px // 250, pa.int64()),
                         "cell_y": pa.array(py // 250, pa.int64())})

    a = _agg()
    return (_read(sf_dir, "customer", ["c_custkey"])
            .map_batches(assign, batch_format="pyarrow")
            .groupby(["cell_x", "cell_y"])
            .aggregate(a.Count(alias_name="n")))


SQL_CELL_ASSIGNMENT = """
select cast(floor(((c_custkey * 37) % 1000) / 250.0) as bigint) as cell_x,
       cast(floor(((c_custkey * 91) % 1000) / 250.0) as bigint) as cell_y,
       count(*) as n
from customer group by 1, 2
"""


# --------------------------------------------------------------------------
# 5. kNN distance (broadcast probes, partial min per block) (SURVEY op 40)

KNN_QUERIES = [(0, 100, 100), (1, 500, 500), (2, 900, 100), (3, 250, 750),
               (4, 800, 800)]


def q_knn_min_dist(sf_dir: str):
    qx = np.array([q[1] for q in KNN_QUERIES], dtype=np.int64)
    qy = np.array([q[2] for q in KNN_QUERIES], dtype=np.int64)
    qid = np.array([q[0] for q in KNN_QUERIES], dtype=np.int64)

    def partial(b: pa.Table) -> pa.Table:
        sk = b.column("s_suppkey").to_numpy()
        if len(sk) == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "min_dist_sq": pa.array([], pa.int64())})
        sx = (sk * 53) % 1000
        sy = (sk * 97) % 1000
        d2 = ((sx[:, None] - qx[None, :]) ** 2
              + (sy[:, None] - qy[None, :]) ** 2)
        return pa.table({"query_id": pa.array(qid, pa.int64()),
                         "min_dist_sq": pa.array(d2.min(axis=0), pa.int64())})

    a = _agg()
    return (_read(sf_dir, "supplier", ["s_suppkey"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("query_id")
            .aggregate(a.Min("min_dist_sq", alias_name="min_dist_sq")))


SQL_KNN_MIN_DIST = """
with q(query_id, qx, qy) as (values (0,100,100),(1,500,500),(2,900,100),
                                    (3,250,750),(4,800,800))
select query_id,
       min(((s_suppkey*53)%1000 - qx)*((s_suppkey*53)%1000 - qx)
         + ((s_suppkey*97)%1000 - qy)*((s_suppkey*97)%1000 - qy))
       as min_dist_sq
from supplier, q group by query_id
"""


# --------------------------------------------------------------------------
# 6. exact dedup: first-wins per content (SURVEY set-ops / dedup)

def q_exact_dedup_docs(sf_dir: str):
    a = _agg()
    return (_read(sf_dir, "documents", ["doc_id", "text"])
            .groupby("text")
            .aggregate(a.Min("doc_id", alias_name="keep_id"),
                       a.Count(alias_name="n_copies"))
            .select_columns(["keep_id", "n_copies"]))


SQL_EXACT_DEDUP_DOCS = """
select min(doc_id) as keep_id, count(*) as n_copies
from documents group by text
"""


# --------------------------------------------------------------------------
# 6b. exact n-gram Jaccard near-dup pairs (the non-approximate sibling of
#     minhash_pairs_docs, SQL-checkable end to end): shingle inverted
#     index -> per-shingle pair expansion -> pair-count = |A inter B|.

def q_ngram_jaccard_docs(sf_dir: str):
    from ..functions.dedup import ngram_jaccard_pairs

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.8)


SQL_NGRAM_JACCARD_DOCS = """
with w as (
  select doc_id, string_split(text, ' ') as words from documents
),
sh as (
  select distinct doc_id,
         words[i] || ' ' || words[i+1] || ' ' || words[i+2] as s
  from w, unnest(range(1, len(words) - 1)) as t(i)
),
n as (select doc_id, count(*) as ns from sh group by doc_id),
p as (
  select a.doc_id as id_a, b.doc_id as id_b, count(*) as shared
  from sh a join sh b using (s)
  where a.doc_id < b.doc_id
  group by 1, 2
)
select id_a, id_b,
       shared / (na.ns + nb.ns - shared)::double as jaccard
from p
join n na on na.doc_id = p.id_a
join n nb on nb.doc_id = p.id_b
where shared / (na.ns + nb.ns - shared)::double >= 0.8
"""


# --------------------------------------------------------------------------
# 7. distinct count per group

def q_distinct_customers(sf_dir: str):
    """count(distinct) as a two-level groupby: level 1 dedups on the
    composite (status, custkey) key -- hash-partitioned across the cluster,
    so no task ever materializes a whole status group -- level 2 counts the
    surviving pairs per status."""
    a = _agg()
    return (_read(sf_dir, "orders", ["o_orderstatus", "o_custkey"])
            .groupby(["o_orderstatus", "o_custkey"])
            .aggregate(a.Count(alias_name="_dups"))
            .groupby("o_orderstatus")
            .aggregate(a.Count(alias_name="n_cust")))


SQL_DISTINCT_CUSTOMERS = """
select o_orderstatus, count(distinct o_custkey) as n_cust
from orders group by o_orderstatus
"""


# --------------------------------------------------------------------------
# 8. explode / flat_map: token histogram (SURVEY op 30)

def q_explode_tokens(sf_dir: str):
    def explode(b: pa.Table) -> pa.Table:
        tokens = pc.list_flatten(pc.split_pattern(b.column("text"), " "))
        return pa.table({"token": tokens})

    a = _agg()
    return (_read(sf_dir, "documents", ["text"])
            .map_batches(explode, batch_format="pyarrow")
            .groupby("token")
            .aggregate(a.Count(alias_name="n")))


SQL_EXPLODE_TOKENS = """
select token, count(*) as n from (
  select unnest(string_split(text, ' ')) as token from documents) t
group by token
"""


# --------------------------------------------------------------------------
# 9. sessionization (stateful per-key ordering) (events table)

def q_sessionize(sf_dir: str):
    # ONE keyed fold co-locates each user's events; inside the fold the
    # 30-min-gap session count is a vectorized diff over ALL complete
    # user runs at once (the high-cardinality groupby rule from
    # partitions.keyed_fold -- user cardinality grows with SF, so a
    # per-group map_groups pays ~45us/group)
    from ..partitions import keyed_fold

    def fold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "user_id" not in b.column_names:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "n_sessions": pa.array([], pa.int64())})
        order = pc.sort_indices(
            b, sort_keys=[("user_id", "ascending"), ("ts", "ascending"),
                          ("event_id", "ascending")])
        g = b.take(order)
        uid = g.column("user_id").to_numpy()
        ts = (g.column("ts").to_numpy().astype("datetime64[us]")
              .astype(np.int64))
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        gap_brk = np.r_[True, (ts[1:] - ts[:-1]) > 1800 * 1_000_000]
        brk = (new_user | gap_brk).astype(np.int64)
        starts = np.flatnonzero(new_user)
        n_ev = np.diff(np.r_[starts, len(uid)])
        n_sess = np.add.reduceat(brk, starts)
        return pa.table({
            "user_id": pa.array(uid[starts], pa.int64()),
            "n_events": pa.array(n_ev, pa.int64()),
            "n_sessions": pa.array(n_sess, pa.int64())})

    return _keyed_scan(
        _read(sf_dir, "events", ["user_id", "ts", "event_id"]), "user_id", fold,
        sf_dir=sf_dir, table="events",
        num_partitions=_join_parts(sf_dir, "events"))


SQL_SESSIONIZE = """
select user_id, count(*) as n_events,
       cast(1 + sum(case when gap > 1800 then 1 else 0 end) as bigint) as n_sessions
from (select user_id,
             epoch(ts) - lag(epoch(ts)) over
               (partition by user_id order by ts, event_id) as gap
      from events) t
group by user_id
"""


# --------------------------------------------------------------------------
# 10. tumbling window aggregate (events)

def q_tumbling_window(sf_dir: str):
    def trunc(b: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(b.column("ts"), unit="hour")
        return pa.table({"hour": hour, "event_type": b.column("event_type"),
                         "value": b.column("value")})

    return _partial_count_sums(
        _read(sf_dir, "events", ["ts", "event_type", "value"])
        .map_batches(trunc, batch_format="pyarrow"),
        ["hour", "event_type"], {}, count_alias="n",
        max_cols={"value": "max_value"})


SQL_TUMBLING_WINDOW = """
select date_trunc('hour', ts) as hour, event_type, count(*) as n,
       max(value) as max_value
from events group by 1, 2
"""


# --------------------------------------------------------------------------
# 10b. watermark-gated streaming window (late-event drop semantics)

_WM_WINDOW_US = 3_600_000_000       # 1 h tumbling
_WM_LATENESS_US = 1_800_000_000     # 30 min allowed lateness


def q_watermark_window(sf_dir: str):
    """STREAMING window semantics replayed deterministically: per-key
    arrival order is ascending event_id, the watermark is
    ``max(prior ts) - 30 min``, and an event whose 1 h tumbling window
    already closed (window end <= watermark at arrival) is DROPPED from
    the aggregate and counted late -- the Beam/Flink late-data
    contract, expressed as one keyed fold (stages/streaming.py) and
    replayed by the oracle's running-max window expression."""
    from ..stages.streaming import watermark_tumbling

    return watermark_tumbling(
        _read(sf_dir, "events",
              ["user_id", "event_id", "ts", "value"]),
        key_col="user_id", ts_col="ts", seq_col="event_id",
        value_col="value", window_us=_WM_WINDOW_US,
        lateness_us=_WM_LATENESS_US,
        num_partitions=_join_parts(sf_dir, "events"))


SQL_WATERMARK_WINDOW = f"""
with s as (
  select user_id, event_id, epoch_us(ts) as tus,
         cast(round(value * 100) as bigint) as v_c,
         max(epoch_us(ts)) over (partition by user_id order by event_id
             rows between unbounded preceding and 1 preceding)
           as prev_max
  from events),
w as (
  select user_id,
         (tus // {_WM_WINDOW_US}) * {_WM_WINDOW_US} as win_start,
         v_c,
         case when prev_max is null
                or (tus // {_WM_WINDOW_US}) * {_WM_WINDOW_US}
                   + {_WM_WINDOW_US} > prev_max - {_WM_LATENESS_US}
              then 1 else 0 end as ok
  from s)
select user_id, win_start,
       cast(sum(ok) as bigint) as n_admitted,
       cast(count(*) - sum(ok) as bigint) as n_late,
       cast(sum(case when ok = 1 then v_c else 0 end) as bigint)
         as admitted_v_c
from w group by 1, 2
"""

_WM_HOP_US = 1_800_000_000          # 30 min hop -> 2 instances/event


def q_watermark_hopping(sf_dir: str):
    """Hopping sibling of :func:`q_watermark_window`: every event lands
    in window_us/hop_us overlapping instances and the late/admit
    decision is PER INSTANCE -- one arrival can be late for its older
    panes and admitted to its newer ones (a streaming engine's
    per-pane firing)."""
    from ..stages.streaming import watermark_tumbling

    return watermark_tumbling(
        _read(sf_dir, "events",
              ["user_id", "event_id", "ts", "value"]),
        key_col="user_id", ts_col="ts", seq_col="event_id",
        value_col="value", window_us=_WM_WINDOW_US,
        lateness_us=_WM_LATENESS_US, hop_us=_WM_HOP_US,
        num_partitions=_join_parts(sf_dir, "events"))


SQL_WATERMARK_HOPPING = f"""
with s as (
  select user_id, event_id, epoch_us(ts) as tus,
         cast(round(value * 100) as bigint) as v_c,
         max(epoch_us(ts)) over (partition by user_id order by event_id
             rows between unbounded preceding and 1 preceding)
           as prev_max
  from events),
w as (
  select user_id, v_c, prev_max,
         ((tus // {_WM_HOP_US}) - j) * {_WM_HOP_US} as win_start
  from s, unnest(range(0, {_WM_WINDOW_US // _WM_HOP_US})) as t(j)),
f as (
  select user_id, win_start, v_c,
         case when prev_max is null
                or win_start + {_WM_WINDOW_US}
                   > prev_max - {_WM_LATENESS_US}
              then 1 else 0 end as ok
  from w)
select user_id, win_start,
       cast(sum(ok) as bigint) as n_admitted,
       cast(count(*) - sum(ok) as bigint) as n_late,
       cast(sum(case when ok = 1 then v_c else 0 end) as bigint)
         as admitted_v_c
from f group by 1, 2
"""

_WM_GAP_US = 7_200_000_000          # 2 h session gap


def q_watermark_sessions(sf_dir: str):
    """Watermark SESSION windows: arrivals at or before the watermark
    (max prior ts - 30 min, arrival order = event_id) are dropped late;
    admitted events sessionize by EVENT time with a 2 h gap.  One row
    per session plus the key's late count on each row."""
    from ..stages.streaming import watermark_sessions

    return watermark_sessions(
        _read(sf_dir, "events",
              ["user_id", "event_id", "ts", "value"]),
        key_col="user_id", ts_col="ts", seq_col="event_id",
        value_col="value", gap_us=_WM_GAP_US,
        lateness_us=_WM_LATENESS_US,
        num_partitions=_join_parts(sf_dir, "events"))


SQL_WATERMARK_SESSIONS = f"""
with s as (
  select user_id, event_id, epoch_us(ts) as tus,
         cast(round(value * 100) as bigint) as v_c,
         max(epoch_us(ts)) over (partition by user_id order by event_id
             rows between unbounded preceding and 1 preceding)
           as prev_max
  from events),
lt as (
  select user_id,
         cast(sum(case when prev_max is not null
                        and tus <= prev_max - {_WM_LATENESS_US}
                  then 1 else 0 end) as bigint) as n_late_key
  from s group by user_id),
a as (
  select * from s
  where prev_max is null or tus > prev_max - {_WM_LATENESS_US}),
o as (
  select user_id, tus, v_c, event_id,
         case when lag(tus) over (partition by user_id
                                  order by tus, event_id) is null
                or tus - lag(tus) over (partition by user_id
                                        order by tus, event_id)
                   > {_WM_GAP_US}
              then 1 else 0 end as brk
  from a),
g as (
  select user_id, tus, v_c,
         sum(brk) over (partition by user_id order by tus, event_id
                        rows unbounded preceding) as sid
  from o)
select g.user_id, cast(min(tus) as bigint) as session_start,
       cast(count(*) as bigint) as n_events,
       cast(sum(v_c) as bigint) as session_v_c,
       lt.n_late_key
from g join lt on g.user_id = lt.user_id
group by g.user_id, sid, lt.n_late_key
"""


def q_watermark_join(sf_dir: str):
    """Watermark-gated STREAM-STREAM join (final-state semantics):
    clicks (probe) and views (build) ride one per-user stream in
    event_id arrival order; the shared watermark (max prior ts -
    30 min) drops late events from either side, and each admitted
    click matches the admitted views in its trailing 1 h window --
    per-probe match count + exact integer-cents value sum, 0 when
    none.  One keyed fold (stages/streaming.watermark_stream_join)."""
    from ..stages.streaming import watermark_stream_join

    def prep(b: pa.Table) -> pa.Table:
        et = b.column("event_type")
        m = pc.or_(pc.equal(et, "click"), pc.equal(et, "view"))
        t = b.filter(m)
        side = pc.if_else(pc.equal(t.column("event_type"), "view"),
                          pa.scalar(1, pa.int64()),
                          pa.scalar(0, pa.int64()))
        return pa.table({"user_id": t.column("user_id"),
                         "event_id": t.column("event_id"),
                         "ts": t.column("ts"),
                         "value": t.column("value"),
                         "side": side})

    return watermark_stream_join(
        _read(sf_dir, "events",
              ["user_id", "event_id", "ts", "value", "event_type"])
        .map_batches(prep, batch_format="pyarrow"),
        key_col="user_id", ts_col="ts", seq_col="event_id",
        side_col="side", id_col="event_id", value_col="value",
        window_us=_WM_WINDOW_US, lateness_us=_WM_LATENESS_US,
        num_partitions=_join_parts(sf_dir, "events"))


SQL_WATERMARK_JOIN = f"""
with s as (
  select user_id, event_id, epoch_us(ts) as tus,
         cast(round(value * 100) as bigint) as v_c,
         case when event_type = 'view' then 1 else 0 end as side,
         max(epoch_us(ts)) over (partition by user_id order by event_id
             rows between unbounded preceding and 1 preceding)
           as prev_max
  from events where event_type in ('click', 'view')),
adm as (
  select * from s
  where prev_max is null or tus > prev_max - {_WM_LATENESS_US}),
p as (select * from adm where side = 0),
b as (select * from adm where side = 1)
select p.event_id,
       cast(count(b.tus) as bigint) as n_matches,
       cast(coalesce(sum(b.v_c), 0) as bigint) as matched_v_c
from p left join b on b.user_id = p.user_id
  and b.tus >= p.tus - {_WM_WINDOW_US} and b.tus < p.tus
group by p.event_id
"""


# --------------------------------------------------------------------------
# 11. top-k (sort + limit with deterministic tie-break)

def q_topk_orders(sf_dir: str):
    return (_read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
            .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
            .limit(10))


SQL_TOPK_ORDERS = """
select o_orderkey, o_totalprice from orders
order by o_totalprice desc, o_orderkey limit 10
"""


# --------------------------------------------------------------------------
# 12. filter + project + global aggregate

def q_filter_project(sf_dir: str):
    lo = np.datetime64("1995-01-01")
    hi = np.datetime64("1996-01-01")

    def keep(b: pa.Table) -> pa.Table:
        ship = b.column("l_shipdate").to_numpy()
        disc = b.column("l_discount").to_numpy()
        m = (ship >= lo) & (ship < hi) & (disc >= 0.05) & (disc <= 0.07)
        return pa.table({"l_quantity": pa.array(
            b.column("l_quantity").to_numpy()[m])})

    a = _agg()
    ds = (_read(sf_dir, "lineitem", ["l_shipdate", "l_discount",
                                     "l_quantity"])
          .map_batches(keep, batch_format="pyarrow"))
    row = ds.aggregate(a.Count(alias_name="n"),
                       a.Sum("l_quantity", alias_name="sum_qty"))
    return pa.table({"n": pa.array([row["n"]], pa.int64()),
                     "sum_qty": pa.array([float(row["sum_qty"])],
                                         pa.float64())})


SQL_FILTER_PROJECT = """
select count(*) as n, cast(sum(l_quantity) as double) as sum_qty
from lineitem
where l_shipdate >= timestamp '1995-01-01'
  and l_shipdate < timestamp '1996-01-01'
  and l_discount between 0.05 and 0.07
"""


# --------------------------------------------------------------------------
# 13. buffer arithmetic (geodesic-buffer analogue) (SURVEY op 34)

def q_buffer_bbox_area(sf_dir: str):
    def area(b: pa.Table) -> pa.Table:
        sk = b.column("s_suppkey").to_numpy()
        r = sk % 7
        return pa.table({"s_nationkey": b.column("s_nationkey"),
                         "bbox_area": pa.array((2 * r) * (2 * r), pa.int64())})

    a = _agg()
    return (_read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
            .map_batches(area, batch_format="pyarrow")
            .groupby("s_nationkey")
            .aggregate(a.Sum("bbox_area", alias_name="sum_area")))


SQL_BUFFER_BBOX_AREA = """
select s_nationkey,
       cast(sum((2*(s_suppkey%7)) * (2*(s_suppkey%7))) as bigint) as sum_area
from supplier group by s_nationkey
"""


# --------------------------------------------------------------------------
# 14. large-large hash join (Dataset.join) + aggregate

def q_join_orders_lineitem(sf_dir: str):
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])
    lineitem = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
    joined = orders.join(lineitem, "inner",
                         num_partitions=_join_parts(sf_dir, "orders",
                                                    "lineitem"),
                         on=("o_orderkey",), right_on=("l_orderkey",))
    return _partial_count_sums(joined, "o_orderstatus",
                               {"l_quantity": "sum_qty"},
                               count_alias="n_items")


SQL_JOIN_ORDERS_LINEITEM = """
select o_orderstatus, count(*) as n_items, sum(l_quantity) as sum_qty
from orders join lineitem on o_orderkey = l_orderkey
group by o_orderstatus
"""


# --------------------------------------------------------------------------
# 15. anti join (the resume/checkpoint anti-join shape) (SURVEY op 44)

def q_customers_without_orders(sf_dir: str):
    customer = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    # anti-join against the customers holding a finalized ('F') order --
    # the committed-partition filter shape of checkpoint resume (op 44)
    orders = _read(sf_dir, "orders", ["o_custkey"],
                   row_filter=pc.field("o_orderstatus") == "F")
    joined = customer.join(orders, "left_anti",
                           num_partitions=_join_parts(sf_dir, "customer",
                                                      "orders"),
                           on=("c_custkey",), right_on=("o_custkey",))
    return _partial_count_sums(joined, "c_nationkey", {},
                               count_alias="n_customers")


SQL_CUSTOMERS_WITHOUT_ORDERS = """
select c_nationkey, count(*) as n_customers
from customer
where c_custkey not in
      (select o_custkey from orders where o_orderstatus = 'F')
group by c_nationkey
"""


# --------------------------------------------------------------------------
# 16. global min/max (the dynamic slope-remap aggregate, bal.py:110-114)

def q_global_minmax(sf_dir: str):
    a = _agg()
    row = (_read(sf_dir, "lineitem", ["l_quantity"])
           .aggregate(a.Min("l_quantity", alias_name="min_qty"),
                      a.Max("l_quantity", alias_name="max_qty"),
                      a.Count(alias_name="n")))
    return pa.table({"min_qty": pa.array([float(row["min_qty"])]),
                     "max_qty": pa.array([float(row["max_qty"])]),
                     "n": pa.array([row["n"]], pa.int64())})


SQL_GLOBAL_MINMAX = """
select cast(min(l_quantity) as double) as min_qty,
       cast(max(l_quantity) as double) as max_qty, count(*) as n
from lineitem
"""


# --------------------------------------------------------------------------
# 17. token stats by language (text analysis, SQL-checkable core)

def q_token_stats_by_lang(sf_dir: str):
    from ..functions.text import token_count_batch

    return _partial_count_sums(
        _read(sf_dir, "documents", ["lang", "text"])
        .map_batches(lambda b: token_count_batch(b).drop_columns(["text"]),
                     batch_format="pyarrow"),
        "lang", {"n_tokens": "sum_tokens"}, count_alias="n_docs"
    ).select_columns(["lang", "sum_tokens", "n_docs"])


SQL_TOKEN_STATS_BY_LANG = """
select lang, cast(sum(len(string_split(text, ' '))) as bigint) as sum_tokens,
       count(*) as n_docs
from documents group by lang
"""


# --------------------------------------------------------------------------
# 17b. boilerplate n-gram removal (CCNet-style line dedup adapted to the
# single-line corpus: word 3-grams occurring in >= 3 distinct docs are
# boilerplate, dropped from every doc; per-doc retention stats)

def q_boilerplate_ngrams(sf_dir: str):
    from ..functions.text import boilerplate_stats

    return boilerplate_stats(_read(sf_dir, "documents", ["doc_id", "text"]),
                             n=3, max_df=3)


SQL_BOILERPLATE_NGRAMS = """
with w as (
  select doc_id, string_split(text, ' ') as ws from documents
),
idx as (
  select doc_id, ws, unnest(range(1, len(ws) - 1)) as i from w
),
g as (
  select doc_id,
         list_extract(ws, i) || ' ' || list_extract(ws, i + 1) || ' '
           || list_extract(ws, i + 2) as gram
  from idx
),
gc as (
  select doc_id, gram, count(*) as n_occ from g group by doc_id, gram
),
freq as (
  select gram, count(*) as nd from gc group by gram
)
select gc.doc_id,
       cast(sum(gc.n_occ) as bigint) as n_grams,
       cast(sum(case when f.nd < 3 then gc.n_occ else 0 end)
            as bigint) as n_kept,
       cast(sum(case when f.nd < 3 then gc.n_occ * length(gc.gram)
                else 0 end) as bigint) as kept_chars
from gc join freq f using (gram)
group by gc.doc_id
"""


# --------------------------------------------------------------------------
# 17c. train/test contamination scan (n-gram shingle overlap between a
# deterministic held-out slice and the training corpus)

def q_contamination_check(sf_dir: str):
    from ..functions.text import contamination_check

    return contamination_check(
        _read(sf_dir, "documents", ["doc_id", "text"]), n=5, test_mod=50)


SQL_CONTAMINATION_CHECK = """
with w as (
  select doc_id, string_split(text, ' ') as ws from documents
),
idx as (
  select doc_id, ws, unnest(range(1, len(ws) - 3)) as i from w
),
g as (
  select distinct doc_id,
         list_extract(ws, i) || ' ' || list_extract(ws, i + 1) || ' '
           || list_extract(ws, i + 2) || ' ' || list_extract(ws, i + 3)
           || ' ' || list_extract(ws, i + 4) as shingle
  from idx
),
pairs as (
  select t.doc_id as test_id, r.doc_id as train_id, count(*) as shared
  from g t join g r on t.shingle = r.shingle
  where t.doc_id % 50 = 0 and r.doc_id % 50 <> 0
  group by 1, 2
)
select test_id,
       cast(count(*) as bigint) as n_train_docs,
       cast(max(shared) as bigint) as max_shared,
       cast(sum(shared) as bigint) as total_shared
from pairs group by test_id
"""


# --------------------------------------------------------------------------
# 18. quality filter (long docs per source)

def q_long_docs_by_source(sf_dir: str):
    a = _agg()
    return (_read(sf_dir, "documents", ["source", "n_chars"])
            .filter(expr="n_chars > 300")
            .groupby("source")
            .aggregate(a.Count(alias_name="n_long")))


SQL_LONG_DOCS_BY_SOURCE = """
select source, count(*) as n_long from documents
where n_chars > 300 group by source
"""


# --------------------------------------------------------------------------
# 19. exact cosine top-k (similarity search baseline)

def q_ann_topk(sf_dir: str):
    from ..functions.ann import brute_force_topk
    from .rows_only import _head_rows

    emb = _head_rows(f"{sf_dir}/embeddings.parquet",
                     ["vec_id", "embedding"], 64)
    qmask = pc.less(emb.column("vec_id"), 3)
    qtab = emb.filter(qmask)
    if qtab.num_rows != 3:
        raise ValueError(
            f"q_ann_topk: expected 3 query rows with vec_id < 3 in the "
            f"head rows, found {qtab.num_rows} -- embeddings.parquet "
            "is not ordered by vec_id; widen the head read")
    qids = qtab.column("vec_id").to_pylist()
    queries = np.array(qtab.column("embedding").to_pylist(),
                       dtype=np.float64)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    top = brute_force_topk(ds, queries, k=5)

    def remap(b: pa.Table) -> pa.Table:
        qi = b.column("query_id").to_numpy()
        return pa.table({
            "query_id": pa.array([qids[i] for i in qi], pa.int64()),
            "vec_id": b.column("vec_id")})

    return top.map_batches(remap, batch_format="pyarrow")


SQL_ANN_TOPK = """
with q as (select vec_id as query_id, embedding as qv
           from embeddings where vec_id < 3)
select query_id, vec_id from (
  select q.query_id, e.vec_id,
         row_number() over (partition by q.query_id
             order by list_cosine_similarity(e.embedding, q.qv) desc,
                      e.vec_id) as rnk
  from embeddings e cross join q) t
where rnk <= 5
"""


# --------------------------------------------------------------------------
# 19b. hopping window (60 min window, 30 min hop): each event lands in two
#      windows -> flat_map expansion + one groupby, no event-time engine

def q_hopping_window(sf_dir: str):
    def expand(b: pa.Table) -> pa.Table:
        ts = b.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
        half = 1_800_000_000                    # 30 min in us
        w0 = (ts // half) * half                # the hop grid
        starts = np.concatenate([w0, w0 - half])
        etype = pa.concat_arrays([b.column("event_type").combine_chunks()] * 2)
        return pa.table({
            "window_start": pa.array(starts.astype("datetime64[us]")),
            "event_type": etype})

    a = _agg()
    return (_read(sf_dir, "events", ["ts", "event_type"])
            .map_batches(expand, batch_format="pyarrow")
            .groupby(["window_start", "event_type"])
            .aggregate(a.Count(alias_name="n")))


SQL_HOPPING_WINDOW = """
select window_start, event_type, count(*) as n from (
  select unnest([
      make_timestamp(cast(floor(epoch(ts) / 1800) * 1800 as bigint) * 1000000),
      make_timestamp(cast(floor(epoch(ts) / 1800) * 1800 - 1800 as bigint) * 1000000)
    ]) as window_start, event_type
  from events) t
group by 1, 2
"""


# --------------------------------------------------------------------------
# 19c. as-of join: each order joined to the user's latest event at or before
#      the order date (a join shape Ray Data lacks -> union-tag + per-key
#      sorted merge inside map_groups; one shuffle)

def q_asof_join(sf_dir: str):
    from ..stages.asof import asof_join

    purchases = (_read(sf_dir, "events",
                       ["user_id", "ts", "event_id", "event_type"])
                 .filter(expr="event_type == 'purchase'"))
    clicks = (_read(sf_dir, "events",
                    ["user_id", "ts", "event_id", "event_type"])
              .filter(expr="event_type == 'click'")
              .select_columns(["user_id", "ts", "event_id"])
              .rename_columns({"event_id": "click_id"}))
    a = _agg()
    joined = asof_join(purchases, clicks,
                       left_key="user_id", right_key="user_id",
                       left_ts="ts", right_ts="ts",
                       right_payload=["click_id"])
    return (joined.groupby("user_id")
            .aggregate(a.Count(alias_name="n_purchases"),
                       a.Sum("click_id", alias_name="sum_click_id"),
                       a.Max("click_id", alias_name="max_click_id")))


SQL_ASOF_JOIN = """
select user_id, count(*) as n_purchases,
       cast(sum(click_id) as bigint) as sum_click_id, max(click_id) as max_click_id
from (
  select p.user_id,
         (select c.event_id from events c
          where c.user_id = p.user_id and c.event_type = 'click'
            and c.ts <= p.ts
          order by c.ts desc, c.event_id desc limit 1) as click_id
  from events p where p.event_type = 'purchase') t
where click_id is not null
group by user_id
"""


# --------------------------------------------------------------------------
# 19d. interval (range) join: per click event, how many views the same user
#      made in the preceding 24 h (the OTHER join shape Ray Data lacks ->
#      time-band replication + one (key, band) shuffle, stages/range_join)

def q_range_join_clicks(sf_dir: str):
    from ..stages.range_join import interval_count_join

    clicks = (_read(sf_dir, "events", ["user_id", "ts", "event_id",
                                       "event_type"])
              .filter(expr="event_type == 'click'"))
    views = (_read(sf_dir, "events", ["user_id", "ts", "event_type"])
             .filter(expr="event_type == 'view'"))
    day_us = 24 * 3600 * 1_000_000
    return interval_count_join(
        clicks, views, probe_key="user_id", build_key="user_id",
        probe_ts="ts", build_ts="ts", lo_us=-day_us, hi_us=0,
        probe_id="event_id", out_col="n_views")


SQL_RANGE_JOIN_CLICKS = """
select c.event_id, count(v.ts) as n_views
from events c left join events v
  on v.user_id = c.user_id and v.event_type = 'view'
 and v.ts >= c.ts - interval 24 hour and v.ts < c.ts
where c.event_type = 'click'
group by c.event_id
"""


# --------------------------------------------------------------------------
# 20. exact cosine-pair self-join (embedding near-dup, hash-verified twin of
#     the LSH variant in functions/dedup.py)

def q_cosine_pairs(sf_dir: str):
    from ..functions.dedup import cosine_pairs_exact

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    # ids only: float cosine stays out of the value hash (margin to the
    # 0.45 threshold is >5e-4 on the test tables, so both engines agree)
    return (cosine_pairs_exact(ds, threshold=0.45)
            .select_columns(["id_a", "id_b"]))


SQL_COSINE_PAIRS = """
select a.vec_id as id_a, b.vec_id as id_b
from embeddings a join embeddings b on a.vec_id < b.vec_id
where list_cosine_similarity(a.embedding, b.embedding) >= 0.45
"""


# --------------------------------------------------------------------------
# 21. bbox -> covered-cells expansion (polygons_to_cells' shape, SURVEY op
#     38's tile-to-cell assignment, on arithmetic bboxes so SQL can check)

def q_cell_cover(sf_dir: str):
    def expand(b: pa.Table) -> pa.Table:
        sk = b.column("s_suppkey").to_numpy()
        x = (sk * 53) % 1000
        y = (sk * 97) % 1000
        r = 30 + (sk % 5) * 10
        cx0 = np.maximum((x - r) // 100, 0)
        cx1 = np.minimum((x + r) // 100, 9)
        cy0 = np.maximum((y - r) // 100, 0)
        cy1 = np.minimum((y + r) // 100, 9)
        if len(sk) == 0:
            return pa.table({"cx": pa.array([], pa.int64()),
                             "cy": pa.array([], pa.int64())})
        out_cx, out_cy = [], []
        for a0, a1, b0, b1 in zip(cx0, cx1, cy0, cy1):
            xs = np.arange(a0, a1 + 1)
            ys = np.arange(b0, b1 + 1)
            gx, gy = np.meshgrid(xs, ys)
            out_cx.append(gx.ravel())
            out_cy.append(gy.ravel())
        return pa.table({
            "cx": pa.array(np.concatenate(out_cx), pa.int64()),
            "cy": pa.array(np.concatenate(out_cy), pa.int64())})

    a = _agg()
    return (_read(sf_dir, "supplier", ["s_suppkey"])
            .map_batches(expand, batch_format="pyarrow")
            .groupby(["cx", "cy"])
            .aggregate(a.Count(alias_name="n")))


SQL_CELL_COVER = """
select cx, cy, count(*) as n from (
  select unnest(range(greatest((y - r) // 100, 0),
                      least((y + r) // 100, 9) + 1)) as cy, cx
  from (
    select unnest(range(greatest((x - r) // 100, 0),
                        least((x + r) // 100, 9) + 1)) as cx, y, r
    from (select (s_suppkey * 53) % 1000 as x,
                 (s_suppkey * 97) % 1000 as y,
                 30 + (s_suppkey % 5) * 10 as r
          from supplier) t0) t1) t2
group by cx, cy
"""


# --------------------------------------------------------------------------
# 22. deterministic hash sampling (reproducible %-sample, the scalable
#     alternative to random_sample for resumable pipelines)

def q_hash_sample(sf_dir: str):
    def sample(b: pa.Table) -> pa.Table:
        ok = b.column("o_orderkey").to_numpy()
        keep = ((ok * 2654435761) % 2147483647) % 100 < 5
        return pa.table({"o_orderkey": pa.array(ok[keep], pa.int64())})

    a = _agg()
    row = (_read(sf_dir, "orders", ["o_orderkey"])
           .map_batches(sample, batch_format="pyarrow")
           .aggregate(a.Count(alias_name="n_sampled"),
                      a.Min("o_orderkey", alias_name="min_key"),
                      a.Max("o_orderkey", alias_name="max_key")))
    return pa.table({"n_sampled": pa.array([row["n_sampled"]], pa.int64()),
                     "min_key": pa.array([row["min_key"]], pa.int64()),
                     "max_key": pa.array([row["max_key"]], pa.int64())})


SQL_HASH_SAMPLE = """
select count(*) as n_sampled, min(o_orderkey) as min_key,
       max(o_orderkey) as max_key
from orders
where ((o_orderkey * 2654435761) % 2147483647) % 100 < 5
"""


# --------------------------------------------------------------------------
# 22b. stratified deterministic sample: k rows per group, chosen by a
#      shared multiplicative hash so engine and oracle agree exactly.
#      Scale shape: per-block partial top-k per group inside map_batches
#      (each block emits <= k rows per group it sees), then a tiny
#      groupby(group).map_groups final top-k -- the partial/final pattern;
#      no task ever holds a whole stratum.

def q_stratified_sample(sf_dir: str, k: int = 8):
    def partial(b: pa.Table) -> pa.Table:
        status = np.asarray(b.column("o_orderstatus").to_pylist())
        ok = b.column("o_orderkey").to_numpy()
        h = (ok * 2654435761) % 2147483647
        out_s, out_k, out_h = [], [], []
        for s in np.unique(status):
            m = status == s
            order = np.lexsort((ok[m], h[m]))[:k]
            out_s.extend([s] * len(order))
            out_k.append(ok[m][order])
            out_h.append(h[m][order])
        return pa.table({
            "o_orderstatus": pa.array(out_s, pa.string()),
            "o_orderkey": pa.array(np.concatenate(out_k) if out_k
                                   else np.array([], np.int64), pa.int64()),
            "h": pa.array(np.concatenate(out_h) if out_h
                          else np.array([], np.int64), pa.int64())})

    def final(g: pa.Table) -> pa.Table:
        ok = g.column("o_orderkey").to_numpy()
        h = g.column("h").to_numpy()
        order = np.lexsort((ok, h))[:k]
        return pa.table({
            "o_orderstatus": g.column("o_orderstatus").take(
                pa.array(order, pa.int64())),
            "o_orderkey": pa.array(ok[order], pa.int64())})

    return (_read(sf_dir, "orders", ["o_orderstatus", "o_orderkey"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("o_orderstatus")
            .map_groups(final, batch_format="pyarrow"))


SQL_STRATIFIED_SAMPLE = """
select o_orderstatus, o_orderkey from orders
qualify row_number() over (
  partition by o_orderstatus
  order by (o_orderkey * 2654435761) % 2147483647, o_orderkey) <= 8
"""


# --------------------------------------------------------------------------
# 23. window rank: row_number per partition (top-N per key with exact ties)

def q_rank_orders(sf_dir: str):
    """Top-2 orders per customer by (totalprice desc, orderkey).

    Scale shape: a per-batch partial top-2 per key first (vectorized
    lexsort + run-length head), so the keyed shuffle carries at most
    2 rows per (batch, key) instead of the whole orders table; the
    final per-key top-2 + rank is ONE keyed fold, the same lexsort +
    run-position sweep over every complete customer group at once (the
    high-cardinality groupby rule from partitions.keyed_fold)."""
    from ..partitions import keyed_fold

    def top2_positions(b: pa.Table):
        ck = b.column("o_custkey").to_numpy()
        ok = b.column("o_orderkey").to_numpy()
        price = b.column("o_totalprice").to_numpy()
        order = np.lexsort((ok, -price, ck))
        ck_s = ck[order]
        new_key = np.empty(len(ck_s), dtype=bool)
        new_key[0] = True
        np.not_equal(ck_s[1:], ck_s[:-1], out=new_key[1:])
        pos = np.arange(len(ck_s)) - np.maximum.accumulate(
            np.where(new_key, np.arange(len(ck_s)), 0))
        return order, pos

    def partial_top2(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        order, pos = top2_positions(b)
        return b.take(pa.array(np.sort(order[pos < 2])))

    def fold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "o_custkey" not in b.column_names:
            return pa.table({"o_custkey": pa.array([], pa.int64()),
                             "o_orderkey": pa.array([], pa.int64()),
                             "rn": pa.array([], pa.int64())})
        order, pos = top2_positions(b)
        keep = pos < 2
        sel = order[keep]
        return pa.table({
            "o_custkey": b.column("o_custkey").take(pa.array(sel)),
            "o_orderkey": b.column("o_orderkey").take(pa.array(sel)),
            "rn": pa.array(pos[keep] + 1, pa.int64())})

    return _keyed_scan(
        _read(sf_dir, "orders",
              ["o_custkey", "o_orderkey", "o_totalprice"])
        .map_batches(partial_top2, batch_format="pyarrow"), "o_custkey", fold,
        sf_dir=sf_dir, table="orders",
        num_partitions=_join_parts(sf_dir, "orders"))


SQL_RANK_ORDERS = """
select o_custkey, o_orderkey, rn from (
  select o_custkey, o_orderkey,
         row_number() over (partition by o_custkey
                            order by o_totalprice desc, o_orderkey) as rn
  from orders) t
where rn <= 2
"""


# --------------------------------------------------------------------------
# 24. rolling window: moving max over the 3 latest events per user

def q_moving_max(sf_dir: str):
    """max(value) over (partition by user order by ts rows between
    2 preceding and current row) -- exact (max of existing doubles, no
    float-order sensitivity).  ONE keyed fold; the 3-row window is two
    segment-masked shifted maxima over every complete user run at
    once."""
    from ..partitions import keyed_fold

    def fold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "user_id" not in b.column_names:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "user_id": pa.array([], pa.int64()),
                             "mov_max": pa.array([], pa.float64())})
        order = pc.sort_indices(b, sort_keys=[
            ("user_id", "ascending"), ("ts", "ascending"),
            ("event_id", "ascending")])
        g = b.take(order)
        uid = g.column("user_id").to_numpy()
        v = g.column("value").to_numpy()
        m = v.copy()
        if len(v) > 1:
            same1 = uid[1:] == uid[:-1]
            np.maximum(m[1:], np.where(same1, v[:-1], -np.inf),
                       out=m[1:])
        if len(v) > 2:
            same2 = uid[2:] == uid[:-2]
            np.maximum(m[2:], np.where(same2, v[:-2], -np.inf),
                       out=m[2:])
        return pa.table({"event_id": g.column("event_id"),
                         "user_id": g.column("user_id"),
                         "mov_max": pa.array(m, pa.float64())})

    return _keyed_scan(
        _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"]), "user_id", fold,
        sf_dir=sf_dir, table="events",
        num_partitions=_join_parts(sf_dir, "events"))


def q_cumsum_orders(sf_dir: str):
    """Running per-customer order total -- ``sum(...) over (partition by
    o_custkey order by o_orderdate, o_orderkey)``.  ONE keyed fold:
    the grouped running sum is a global cumsum minus each segment's
    start offset, vectorized over every complete customer run (integer
    cents, so a window-function segment-tree summation on the oracle
    side cannot produce a different float rounding)."""
    from ..partitions import keyed_fold

    def fold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "o_custkey" not in b.column_names:
            return pa.table({"o_orderkey": pa.array([], pa.int64()),
                             "o_custkey": pa.array([], pa.int64()),
                             "run_cents": pa.array([], pa.int64())})
        order = pc.sort_indices(b, sort_keys=[
            ("o_custkey", "ascending"), ("o_orderdate", "ascending"),
            ("o_orderkey", "ascending")])
        g = b.take(order)
        ck = g.column("o_custkey").to_numpy()
        cents = np.rint(g.column("o_totalprice").to_numpy()
                        * 100.0).astype(np.int64)
        c = np.cumsum(cents)
        starts = np.flatnonzero(np.r_[True, ck[1:] != ck[:-1]])
        counts = np.diff(np.r_[starts, len(ck)])
        run = c - np.repeat(c[starts] - cents[starts], counts)
        return pa.table({"o_orderkey": g.column("o_orderkey"),
                         "o_custkey": g.column("o_custkey"),
                         "run_cents": pa.array(run, pa.int64())})

    return _keyed_scan(
        _read(sf_dir, "orders",
              ["o_custkey", "o_orderkey", "o_orderdate",
               "o_totalprice"]), "o_custkey", fold,
        sf_dir=sf_dir, table="orders",
        num_partitions=_join_parts(sf_dir, "orders"))


SQL_CUMSUM_ORDERS = """
select o_orderkey, o_custkey,
       cast(sum(cast(round(o_totalprice * 100) as bigint)) over (
           partition by o_custkey
           order by o_orderdate, o_orderkey
           rows between unbounded preceding and current row
       ) as bigint) as run_cents
from orders
"""


def q_lag_events(sf_dir: str):
    """Per-user inter-event gap -- ``ts - lag(ts) over (partition by
    user_id order by ts, event_id)`` in microseconds (-1 for the first
    event; integer timestamps, exact).  ONE keyed fold, the diff
    segment-masked at user boundaries."""
    from ..partitions import keyed_fold

    def fold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "user_id" not in b.column_names:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "user_id": pa.array([], pa.int64()),
                             "gap_us": pa.array([], pa.int64())})
        order = pc.sort_indices(b, sort_keys=[
            ("user_id", "ascending"), ("ts", "ascending"),
            ("event_id", "ascending")])
        g = b.take(order)
        uid = g.column("user_id").to_numpy()
        ts = g.column("ts").cast(pa.int64()).to_numpy()
        gap = np.empty(len(ts), np.int64)
        gap[0] = -1
        if len(ts) > 1:
            gap[1:] = np.where(uid[1:] == uid[:-1],
                               ts[1:] - ts[:-1], -1)
        return pa.table({"event_id": g.column("event_id"),
                         "user_id": g.column("user_id"),
                         "gap_us": pa.array(gap, pa.int64())})

    return _keyed_scan(
        _read(sf_dir, "events", ["user_id", "ts", "event_id"]), "user_id", fold,
        sf_dir=sf_dir, table="events",
        num_partitions=_join_parts(sf_dir, "events"))


SQL_LAG_EVENTS = """
select event_id, user_id,
       coalesce(epoch_us(ts) - lag(epoch_us(ts)) over (
           partition by user_id order by ts, event_id), -1) as gap_us
from events
"""


SQL_MOVING_MAX = """
select event_id, user_id,
       max(value) over (partition by user_id order by ts, event_id
                        rows between 2 preceding and current row) as mov_max
from events
"""


# --------------------------------------------------------------------------
# 25. exact distributed quantiles (disc) per group -- the scale-safe
#     median/quantile shape: composite-key shuffle, driver sees only the
#     (group x distinct-value) count table

def q_quantiles_by_flag(sf_dir: str):
    vc = _partial_count_sums(
        _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"]),
        ["l_returnflag", "l_quantity"], {}, count_alias="vn")
    tab = _collect(vc)
    flags = np.asarray(tab.column("l_returnflag").to_pylist())
    vals = tab.column("l_quantity").to_numpy().astype(np.float64)
    cnts = tab.column("vn").to_numpy().astype(np.int64)
    out = {"l_returnflag": [], "p50": [], "p90": [], "p99": []}
    for flag in sorted(set(flags.tolist())):
        sel = flags == flag
        v, c = vals[sel], cnts[sel]
        order = np.argsort(v)
        v, c = v[order], c[order]
        cum = np.cumsum(c)
        n = int(cum[-1])
        out["l_returnflag"].append(flag)
        for q, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            # quantile_disc: element at rank ceil(q*n) (1-based)
            rank = int(np.ceil(q * n))
            out[col].append(float(v[np.searchsorted(cum, rank)]))
    return pa.table({"l_returnflag": pa.array(out["l_returnflag"],
                                              pa.string()),
                     "p50": pa.array(out["p50"], pa.float64()),
                     "p90": pa.array(out["p90"], pa.float64()),
                     "p99": pa.array(out["p99"], pa.float64())})


SQL_QUANTILES_BY_FLAG = """
select l_returnflag,
       quantile_disc(l_quantity, 0.50) as p50,
       quantile_disc(l_quantity, 0.90) as p90,
       quantile_disc(l_quantity, 0.99) as p99
from lineitem group by l_returnflag
"""


# --------------------------------------------------------------------------
# 26. rollup (grouping sets): per-(flag,status), per-flag and grand-total
#     counts in one result -- subtotals derived by re-aggregating the
#     already-tiny level-0 table, never rescanning lineitem

def q_rollup_counts(sf_dir: str):
    a = _agg()
    base = _partial_count_sums(
        _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus"]),
        ["l_returnflag", "l_linestatus"], {}, count_alias="n"
    ).materialize()                       # <= (#flags x #statuses) rows

    def lvl0(b: pa.Table) -> pa.Table:
        return pa.table({"rf": b.column("l_returnflag"),
                         "ls": b.column("l_linestatus"),
                         "n": b.column("n")})

    lvl1 = (base.groupby("l_returnflag")
            .aggregate(a.Sum("n", alias_name="n")))

    def lvl1_fmt(b: pa.Table) -> pa.Table:
        return pa.table({"rf": b.column("l_returnflag"),
                         "ls": pa.array(["ALL"] * b.num_rows, pa.string()),
                         "n": b.column("n")})

    total = base.aggregate(a.Sum("n", alias_name="n"))
    import ray.data

    total_ds = ray.data.from_arrow(pa.table({
        "rf": pa.array(["ALL"], pa.string()),
        "ls": pa.array(["ALL"], pa.string()),
        "n": pa.array([int(total["n"])], pa.int64())}))
    return (base.map_batches(lvl0, batch_format="pyarrow")
            .union(lvl1.map_batches(lvl1_fmt, batch_format="pyarrow"))
            .union(total_ds))


SQL_ROLLUP_COUNTS = """
select coalesce(l_returnflag, 'ALL') as rf,
       coalesce(l_linestatus, 'ALL') as ls,
       cast(count(*) as bigint) as n
from lineitem group by rollup(l_returnflag, l_linestatus)
"""


# --------------------------------------------------------------------------
# 27. set intersection: customers with orders in BOTH statuses
#     (distinct-per-side then a 2-level groupby -- no whole-key-group task)

def q_status_intersect(sf_dir: str):
    a = _agg()

    def keep_fo(b: pa.Table) -> pa.Table:
        m = pc.is_in(b.column("o_orderstatus"),
                     value_set=pa.array(["F", "O"]))
        return b.filter(m)

    both = (_read(sf_dir, "orders", ["o_custkey", "o_orderstatus"])
            .map_batches(keep_fo, batch_format="pyarrow")
            .groupby(["o_custkey", "o_orderstatus"])
            .aggregate(a.Count(alias_name="_d"))
            .groupby("o_custkey")
            .aggregate(a.Count(alias_name="n_status")))

    def only_both(b: pa.Table) -> pa.Table:
        return pa.table({"o_custkey": b.filter(
            pc.equal(b.column("n_status"), 2)).column("o_custkey")})

    return both.map_batches(only_both, batch_format="pyarrow")


SQL_STATUS_INTERSECT = """
select o_custkey from orders where o_orderstatus = 'F'
intersect
select o_custkey from orders where o_orderstatus = 'O'
"""


# --------------------------------------------------------------------------
# 28. regex extraction over a JSON-ish string column (events.props)

def q_props_extract(sf_dir: str):
    a = _agg()

    def extract(b: pa.Table) -> pa.Table:
        st = pc.extract_regex(b.column("props"), r'(?P<k>[0-9]+)')
        k = pc.cast(pc.struct_field(st, "k"), pa.int64())
        return pa.table({"k_bucket": pc.divide(k, 10), "k": k})

    return (_read(sf_dir, "events", ["props"])
            .map_batches(extract, batch_format="pyarrow")
            .groupby("k_bucket")
            .aggregate(a.Count(alias_name="n"),
                       a.Min("k", alias_name="min_k"),
                       a.Max("k", alias_name="max_k")))


SQL_PROPS_EXTRACT = """
select cast(regexp_extract(props, '[0-9]+') as bigint) // 10 as k_bucket,
       cast(count(*) as bigint) as n,
       min(cast(regexp_extract(props, '[0-9]+') as bigint)) as min_k,
       max(cast(regexp_extract(props, '[0-9]+') as bigint)) as max_k
from events group by 1
"""


# --------------------------------------------------------------------------
# 29. pivot via conditional aggregation: order counts by priority x status

def q_pivot_priority(sf_dir: str):
    a = _agg()

    def indicators(b: pa.Table) -> pa.Table:
        st = b.column("o_orderstatus")
        return pa.table({
            "o_orderpriority": b.column("o_orderpriority"),
            "n_f": pc.cast(pc.equal(st, "F"), pa.int64()),
            "n_o": pc.cast(pc.equal(st, "O"), pa.int64()),
            "n_p": pc.cast(pc.equal(st, "P"), pa.int64())})

    return (_read(sf_dir, "orders", ["o_orderpriority", "o_orderstatus"])
            .map_batches(indicators, batch_format="pyarrow")
            .groupby("o_orderpriority")
            .aggregate(a.Sum("n_f", alias_name="n_f"),
                       a.Sum("n_o", alias_name="n_o"),
                       a.Sum("n_p", alias_name="n_p")))


SQL_PIVOT_PRIORITY = """
select o_orderpriority,
       cast(sum(case when o_orderstatus = 'F' then 1 else 0 end) as bigint)
         as n_f,
       cast(sum(case when o_orderstatus = 'O' then 1 else 0 end) as bigint)
         as n_o,
       cast(sum(case when o_orderstatus = 'P' then 1 else 0 end) as bigint)
         as n_p
from orders group by o_orderpriority
"""


# --------------------------------------------------------------------------
# 35. TF-IDF relevance scoring (inverted-index posting-list shuffle)

def q_tfidf_terms(sf_dir: str):
    """Per-doc top-3 TF-IDF terms; posting-list groupby(token) computes
    exact df + idf, per-doc top-k with (score desc, token asc) tie-break."""
    from ..functions.text import tfidf_top_terms

    return tfidf_top_terms(_read(sf_dir, "documents", ["doc_id", "text"]),
                           k=3)


SQL_TFIDF_TERMS = """
with tok as (
  select doc_id, unnest(string_split(text, ' ')) as token from documents
),
tf as (select doc_id, token, count(*) as tf from tok group by 1, 2),
df as (select token, count(distinct doc_id) as df from tok group by 1),
n as (select count(*) as n from documents),
ranked as (
  select tf.doc_id, tf.token,
         tf.tf * ln(n.n::double / df.df) as score,
         row_number() over (
           partition by tf.doc_id
           order by tf.tf * ln(n.n::double / df.df) desc, tf.token)
           as rk
  from tf join df using (token) cross join n
)
select doc_id, token, round(score, 6) as tfidf
from ranked where rk <= 3
"""


# --------------------------------------------------------------------------
# 36. CDC-style compaction: latest record per key.  The keep-newest-version
#     shape every incremental ingest needs (reference analogue: the
#     re-list-and-skip restart helpers, nsw_dcs/03_...py:107-122, which keep
#     only the newest intermediate per tile).  Per-batch partial compaction
#     (vectorized lexsort keep-last per key) bounds the shuffle at <= 1 row
#     per (batch, key); the final per-key pick sees compacted rows only.

def q_latest_event(sf_dir: str):
    def partial_last(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        u = b.column("user_id").to_numpy()
        ts = b.column("ts").cast(pa.int64()).to_numpy()
        eid = b.column("event_id").to_numpy()
        order = np.lexsort((eid, ts, u))
        u_s = u[order]
        last = np.ones(len(u_s), dtype=bool)
        last[:-1] = u_s[1:] != u_s[:-1]
        return b.take(pa.array(np.sort(order[last])))

    def fold(b: pa.Table) -> pa.Table:
        # final keep-last per user over the compacted rows -- the same
        # lexsort run-tail sweep as the partial, one keyed fold instead
        # of a per-user map_groups
        if b.num_rows == 0 or "user_id" not in b.column_names:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "event_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.timestamp("us")),
                "value": pa.array([], pa.float64())})
        out = partial_last(b)
        return out.select(["user_id", "event_id", "ts", "value"])

    from ..partitions import keyed_fold

    return _keyed_scan(
        _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])
        .map_batches(partial_last, batch_format="pyarrow"), "user_id", fold,
        sf_dir=sf_dir, table="events",
        num_partitions=_join_parts(sf_dir, "events"))


SQL_LATEST_EVENT = """
select user_id, event_id, ts, value from events
qualify row_number() over (partition by user_id
                           order by ts desc, event_id desc) = 1
"""


# --------------------------------------------------------------------------
# 37. mode per group (most frequent value, smallest-value tie-break):
#     same composite-key pushed-partial count table as the quantile op --
#     the driver only ever sees (#groups x #distinct values) rows

def q_mode_per_flag(sf_dir: str):
    vc = _partial_count_sums(
        _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"]),
        ["l_returnflag", "l_quantity"], {}, count_alias="vn")
    tab = _collect(vc)
    flags = np.asarray(tab.column("l_returnflag").to_pylist())
    vals = tab.column("l_quantity").to_numpy()
    cnts = tab.column("vn").to_numpy()
    out_f, out_v, out_n = [], [], []
    for flag in sorted(set(flags.tolist())):
        sel = flags == flag
        v, c = vals[sel], cnts[sel]
        top = np.lexsort((v, -c))[0]
        out_f.append(flag)
        out_v.append(float(v[top]))
        out_n.append(int(c[top]))
    return pa.table({"l_returnflag": pa.array(out_f, pa.string()),
                     "mode_qty": pa.array(out_v, pa.float64()),
                     "n": pa.array(out_n, pa.int64())})


SQL_MODE_PER_FLAG = """
select l_returnflag, l_quantity as mode_qty, cast(count(*) as bigint) as n
from lineitem group by 1, 2
qualify row_number() over (partition by l_returnflag
                           order by count(*) desc, l_quantity) = 1
"""


# --------------------------------------------------------------------------
# 38. set difference (EXCEPT): customers with an 'O' order and no 'F'
#     order, as per-key boolean indicators folded through the pushed
#     partial (max of 0/1 flags) -- one keyed shuffle of tiny rows,
#     no distinct-materialize per side

def q_status_except(sf_dir: str):
    def ind(b: pa.Table) -> pa.Table:
        st = b.column("o_orderstatus")
        return pa.table({
            "o_custkey": b.column("o_custkey"),
            "has_f": pc.cast(pc.equal(st, "F"), pa.int64()),
            "has_o": pc.cast(pc.equal(st, "O"), pa.int64())})

    g = _partial_count_sums(
        _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"])
        .map_batches(ind, batch_format="pyarrow"),
        "o_custkey", {}, max_cols={"has_f": "has_f", "has_o": "has_o"})

    def keep(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(b.column("has_o"), 1),
                    pc.equal(b.column("has_f"), 0))
        return pa.table({"o_custkey": b.filter(m).column("o_custkey")})

    return g.map_batches(keep, batch_format="pyarrow")


SQL_STATUS_EXCEPT = """
select o_custkey from orders where o_orderstatus = 'O'
except
select o_custkey from orders where o_orderstatus = 'F'
"""


# --------------------------------------------------------------------------
# 39. multi-hop join aggregate: tiny dim broadcast (nation, 25 rows ->
#     closure dict) into customer, then a large-large hash join against
#     orders, then the pushed partial aggregate -- the
#     broadcast-then-shuffle-join chain of a star query

def q_nation_orders(sf_dir: str):
    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    n_name = dict(zip(nation.column("n_nationkey").to_pylist(),
                      nation.column("n_name").to_pylist()))

    def add_name(b: pa.Table) -> pa.Table:
        nk = b.column("c_nationkey").to_pylist()
        return pa.table({
            "c_custkey": b.column("c_custkey"),
            "n_name": pa.array([n_name[k] for k in nk], pa.string())})

    cust = (_read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
            .map_batches(add_name, batch_format="pyarrow"))
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    joined = orders.join(cust, "inner",
                         num_partitions=_join_parts(sf_dir, "orders",
                                                    "customer"),
                         on=("o_custkey",), right_on=("c_custkey",))
    return _partial_count_sums(joined, "n_name", {},
                               count_alias="n_orders",
                               max_cols={"o_totalprice": "max_price"})


SQL_NATION_ORDERS = """
select n_name, cast(count(*) as bigint) as n_orders,
       max(o_totalprice) as max_price
from orders
join customer on o_custkey = c_custkey
join nation on c_nationkey = n_nationkey
group by n_name
"""


# --------------------------------------------------------------------------
# 40. distributed exact correlation: one-pass sufficient statistics.
#     Each batch emits ONE row of integer moment sums (price scaled to
#     cents; the y^2 sum carried as hi/lo int64 halves so nothing
#     overflows); the driver combines the tiny per-batch table with
#     arbitrary-precision Python ints and applies the closed form.  The
#     oracle computes the identical formula from identical hugeint sums,
#     so the doubles agree bit-for-bit.

def q_corr_qty_price(sf_dir: str):
    def moments(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in
                             ("n", "sx", "sy", "sxx", "sxy",
                              "syy_hi", "syy_lo")})
        x = np.rint(b.column("l_quantity").to_numpy()).astype(np.int64)
        y = np.rint(b.column("l_extendedprice").to_numpy() * 100.0)
        y = y.astype(np.int64)
        y2 = y * y
        row = {"n": len(x), "sx": int(x.sum()), "sy": int(y.sum()),
               "sxx": int((x * x).sum()), "sxy": int((x * y).sum()),
               "syy_hi": int((y2 >> 32).sum()),
               "syy_lo": int((y2 & 0xFFFFFFFF).sum())}
        return pa.table({k: pa.array([v], pa.int64())
                         for k, v in row.items()})

    tab = _collect(
        _read(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])
        .map_batches(moments, batch_format="pyarrow"))
    if tab.num_rows == 0:
        return pa.table({"corr_qp": pa.array([], pa.float64())})
    tot = {c: sum(int(v) for v in tab.column(c).to_pylist())
           for c in tab.column_names}
    n, sx, sy = tot["n"], tot["sx"], tot["sy"]
    sxx, sxy = tot["sxx"], tot["sxy"]
    syy = (tot["syy_hi"] << 32) + tot["syy_lo"]
    import math

    num = float(n * sxy - sx * sy)
    den = math.sqrt(float(n * sxx - sx * sx) * float(n * syy - sy * sy))
    return pa.table({"corr_qp": pa.array([round(num / den, 6)],
                                         pa.float64())})


SQL_CORR_QTY_PRICE = """
with m as (
  select cast(count(*) as hugeint) as n,
         cast(sum(cast(l_quantity as bigint)) as hugeint) as sx,
         cast(sum(cast(round(l_extendedprice * 100) as bigint))
              as hugeint) as sy,
         cast(sum(cast(l_quantity as bigint) * cast(l_quantity as bigint))
              as hugeint) as sxx,
         cast(sum(cast(l_quantity as bigint)
                  * cast(round(l_extendedprice * 100) as bigint))
              as hugeint) as sxy,
         cast(sum(cast(round(l_extendedprice * 100) as bigint)
                  * cast(round(l_extendedprice * 100) as bigint))
              as hugeint) as syy
  from lineitem)
select round(cast(n * sxy - sx * sy as double)
             / sqrt(cast(n * sxx - sx * sx as double)
                    * cast(n * syy - sy * sy as double)), 6) as corr_qp
from m
"""


# --------------------------------------------------------------------------
# 41. calendar truncation + exact distinct-count: orders per month with
#     distinct customers, as the two-level groupby (month, cust) -> month
#     -- the scale-safe count-distinct shape (no whole-month group task)

def q_monthly_orders(sf_dir: str):
    def trunc(b: pa.Table) -> pa.Table:
        return pa.table({
            "month": pc.floor_temporal(b.column("o_orderdate"),
                                       unit="month"),
            "o_custkey": b.column("o_custkey")})

    lvl = _partial_count_sums(
        _read(sf_dir, "orders", ["o_orderdate", "o_custkey"])
        .map_batches(trunc, batch_format="pyarrow"),
        ["month", "o_custkey"], {}, count_alias="n_ev")
    return (_partial_count_sums(lvl, "month", {"n_ev": "n_orders"},
                                count_alias="n_cust")
            .select_columns(["month", "n_cust", "n_orders"]))


SQL_MONTHLY_ORDERS = """
select cast(date_trunc('month', o_orderdate) as timestamp) as month,
       cast(count(distinct o_custkey) as bigint) as n_cust,
       cast(count(*) as bigint) as n_orders
from orders group by 1
"""


# --------------------------------------------------------------------------
# 42. text normalization + exact near-identical dedup count: the
#     lowercase/strip-punctuation canonicalization every LLM-corpus clean
#     pass runs, counted per lang via the two-level distinct shape (at
#     100 TB the canonical string would be pre-hashed to 64-bit before the
#     shuffle; here the strings themselves are the exactness contract)

def q_norm_text_dedup(sf_dir: str):
    def norm(b: pa.Table) -> pa.Table:
        t = pc.utf8_lower(b.column("text"))
        t = pc.replace_substring_regex(t, "[^a-z0-9 ]", "")
        return pa.table({"lang": b.column("lang"), "norm": t})

    lvl = _partial_count_sums(
        _read(sf_dir, "documents", ["lang", "text"])
        .map_batches(norm, batch_format="pyarrow"),
        ["lang", "norm"], {}, count_alias="n_copies")
    return (_partial_count_sums(lvl, "lang", {"n_copies": "n_docs"},
                                count_alias="n_distinct")
            .select_columns(["lang", "n_distinct", "n_docs"]))


SQL_NORM_TEXT_DEDUP = """
with n as (select lang,
                  regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g') as norm
           from documents)
select lang, cast(count(distinct norm) as bigint) as n_distinct,
       cast(count(*) as bigint) as n_docs
from n group by lang
"""


# --------------------------------------------------------------------------
# 43. near-dup connected components: n-gram Jaccard pairs -> distributed
#     union-find contraction -> (doc, component=min member).  Completes
#     the dedup pipeline (pairs alone don't dedup anything); oracle is a
#     recursive-CTE transitive closure over the identical pair set.

def q_dedup_components(sf_dir: str):
    from ..functions.components import connected_components
    from ..functions.dedup import ngram_jaccard_pairs

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.8)
    return connected_components(pairs)


SQL_DEDUP_COMPONENTS = """
with recursive w as (
  select doc_id, string_split(text, ' ') as words from documents
),
sh as (
  select distinct doc_id,
         words[i] || ' ' || words[i+1] || ' ' || words[i+2] as s
  from w, unnest(range(1, len(words) - 1)) as t(i)
),
n as (select doc_id, count(*) as ns from sh group by doc_id),
p as (
  select a.doc_id as id_a, b.doc_id as id_b, count(*) as shared
  from sh a join sh b using (s)
  where a.doc_id < b.doc_id
  group by 1, 2
),
pr as (
  select id_a, id_b from p
  join n na on na.doc_id = p.id_a
  join n nb on nb.doc_id = p.id_b
  where shared / (na.ns + nb.ns - shared)::double >= 0.8
),
edges as (
  select id_a as a, id_b as b from pr
  union
  select id_b as a, id_a as b from pr
),
reach as (
  select a as v, a as r from edges
  union
  select e.b as v, reach.r from reach join edges e on e.a = reach.v
)
select v as doc_id, min(r) as component_id from reach group by v
"""


# --------------------------------------------------------------------------
# 44. language-ID histogram, fully SQL-checked: the engine's n-gram
#     heuristic (functions/text.langid_heuristic) re-expressed in the
#     oracle via non-overlapping substring counts (length/replace trick --
#     the same greedy left-to-right count semantics as str.count) and a
#     first-wins argmax in marker-dict order (en, fr, es, de) with the
#     CJK codepoint check first.

def q_langid_docs(sf_dir: str):
    from ..functions.text import langid_batch

    return _partial_count_sums(
        _read(sf_dir, "documents", ["text"])
        .map_batches(lambda b: langid_batch(b).drop_columns(["text"]),
                     batch_format="pyarrow"),
        "lang_pred", {}, count_alias="n")


SQL_LANGID_DOCS = """
with s as (
  select lower(substr(text, 1, 2000)) as t from documents
),
sc as (
  select t,
    (length(t) - length(replace(t, 'the', ''))) / 3
      + (length(t) - length(replace(t, ' th', ''))) / 3
      + (length(t) - length(replace(t, 'ing', ''))) / 3
      + (length(t) - length(replace(t, 'and', ''))) / 3
      + (length(t) - length(replace(t, ' of', ''))) / 3 as s_en,
    (length(t) - length(replace(t, 'le ', ''))) / 3
      + (length(t) - length(replace(t, ' de', ''))) / 3
      + (length(t) - length(replace(t, 'es ', ''))) / 3
      + (length(t) - length(replace(t, 'ent', ''))) / 3
      + (length(t) - length(replace(t, 'que', ''))) / 3 as s_fr,
    (length(t) - length(replace(t, 'de ', ''))) / 3
      + (length(t) - length(replace(t, ' de', ''))) / 3
      + (length(t) - length(replace(t, 'la ', ''))) / 3
      + (length(t) - length(replace(t, 'os ', ''))) / 3
      + (length(t) - length(replace(t, 'ión', ''))) / 3 as s_es,
    (length(t) - length(replace(t, 'der', ''))) / 3
      + (length(t) - length(replace(t, 'ein', ''))) / 3
      + (length(t) - length(replace(t, 'sch', ''))) / 3
      + (length(t) - length(replace(t, 'ich', ''))) / 3
      + (length(t) - length(replace(t, 'und', ''))) / 3 as s_de
  from s
),
pred as (
  select case
    when regexp_matches(substr(t, 1, 200), '[\\x{4e00}-\\x{9fff}]')
      then 'zh'
    when s_en >= s_fr and s_en >= s_es and s_en >= s_de then 'en'
    when s_fr >= s_es and s_fr >= s_de then 'fr'
    when s_es >= s_de then 'es'
    else 'de' end as lang_pred
  from sc
)
select lang_pred, cast(count(*) as bigint) as n from pred group by 1
"""


# --------------------------------------------------------------------------
# 45. corpus quality gate, fully SQL-checked: the LLM-cleaning filter
#     (min length, punctuation ratio, stopword ratio) with every
#     threshold as an INTEGER cross-multiplication (n_punct*5 < n_chars
#     instead of ratio < 0.2) so no float ever enters the compare, and
#     both sides on RE2 regex semantics (Arrow and DuckDB share the lib).

_QF_STOPWORDS = ("the a an and or of to in is are was were be been on at "
                 "by for with as it this that from").split()


def q_quality_filter(sf_dir: str):
    stop_set = pa.array(_QF_STOPWORDS, pa.string())

    def metrics(b: pa.Table) -> pa.Table:
        txt = b.column("text")
        n_chars = pc.utf8_length(txt).cast(pa.int64()).to_numpy()
        toks = pc.split_pattern(txt, " ")
        n_tokens = pc.list_value_length(toks).cast(pa.int64()).to_numpy()
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy()
        stop_mask = pc.is_in(flat, value_set=stop_set)
        n_stop = np.zeros(b.num_rows, np.int64)
        np.add.at(n_stop, parent,
                  stop_mask.to_numpy(zero_copy_only=False)
                  .astype(np.int64))
        stripped = pc.replace_substring_regex(txt, r"[\p{L}\p{N} ]", "")
        n_punct = pc.utf8_length(stripped).cast(pa.int64()).to_numpy()
        ok = ((n_tokens >= 5) & (n_punct * 5 < n_chars)
              & (n_stop * 10 >= n_tokens))
        return pa.table({"lang": b.column("lang"),
                         "is_pass": pa.array(ok.astype(np.int64),
                                             pa.int64())})

    return _partial_count_sums(
        _read(sf_dir, "documents", ["lang", "text"])
        .map_batches(metrics, batch_format="pyarrow"),
        "lang", {"is_pass": "n_pass"}, count_alias="n_docs"
    ).select_columns(["lang", "n_docs", "n_pass"])


SQL_QUALITY_FILTER = """
with m as (
  select lang,
         length(text) as n_chars,
         len(string_split(text, ' ')) as n_tokens,
         len(list_filter(string_split(text, ' '),
             x -> x in ('the','a','an','and','or','of','to','in','is',
                        'are','was','were','be','been','on','at','by',
                        'for','with','as','it','this','that','from')))
           as n_stop,
         length(regexp_replace(text, '[\\p{L}\\p{N} ]', '', 'g'))
           as n_punct
  from documents)
select lang,
       cast(count(*) as bigint) as n_docs,
       cast(sum(case when n_tokens >= 5 and n_punct * 5 < n_chars
                      and n_stop * 10 >= n_tokens then 1 else 0 end)
            as bigint) as n_pass
from m group by lang
"""


# --------------------------------------------------------------------------
# 46. ntile window over a distributed global ranking: one total-order
#     sort shuffle, block offsets from ref-bundle metadata (prefix sum,
#     no blocks on the driver), per-status quartile histogram with
#     max-per-bucket (which verifies the ORDER, not just the split).

def q_ntile_price(sf_dir: str):
    from ..stages.ranking import global_ranks, ntile_of_ranks

    ds = _read(sf_dir, "orders",
               ["o_orderstatus", "o_totalprice", "o_orderkey"])
    ranked = global_ranks(
        ds, ["o_orderstatus", "o_totalprice", "o_orderkey"],
        partition_col="o_orderstatus", rank_col="rn")
    cnt = {r["o_orderstatus"]: r["n"] for r in _partial_count_sums(
        _read(sf_dir, "orders", ["o_orderstatus"]),
        "o_orderstatus", {}, count_alias="n").take_all()}

    def bucketize(b: pa.Table) -> pa.Table:
        status = b.column("o_orderstatus").to_pylist()
        n = np.array([cnt[s] for s in status], dtype=np.int64)
        q = ntile_of_ranks(b.column("rn").to_numpy(), n, 4)
        return pa.table({"o_orderstatus": b.column("o_orderstatus"),
                         "quartile": pa.array(q, pa.int64()),
                         "o_totalprice": b.column("o_totalprice")})

    return _partial_count_sums(
        ranked.map_batches(bucketize, batch_format="pyarrow"),
        ["o_orderstatus", "quartile"], {}, count_alias="n",
        max_cols={"o_totalprice": "max_price"})


SQL_NTILE_PRICE = """
select o_orderstatus, quartile, cast(count(*) as bigint) as n,
       max(o_totalprice) as max_price
from (select o_orderstatus, o_totalprice,
             ntile(4) over (partition by o_orderstatus
                            order by o_totalprice, o_orderkey) as quartile
      from orders) t
group by 1, 2
"""


# --------------------------------------------------------------------------
# 47. document chunking: split each doc's whitespace tokens into fixed
#     64-token windows (the pretraining chunk stage; the text analogue of
#     stages/chips.py).  Stateless flat_map, fully vectorized (token
#     offsets via list_value_length + repeat, first token per chunk via a
#     flat gather -- the content probe that verifies window alignment,
#     not just counts).

def q_chunk_docs(sf_dir: str, win: int = 64):
    def chunks(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b.column("text"), " ")
        lens = pc.list_value_length(toks).cast(pa.int64()).to_numpy()
        n_chunks = -(-lens // win)                  # ceil; len>=1 always
        doc_ids = b.column("doc_id").to_numpy()
        rep = np.repeat(np.arange(len(lens)), n_chunks)
        # chunk index within each doc: global arange minus each doc's
        # first output position
        starts = np.concatenate([[0], np.cumsum(n_chunks[:-1])])
        chunk_id = np.arange(len(rep)) - starts[rep]
        n_tok = np.minimum(lens[rep] - chunk_id * win, win)
        # first token of each chunk: gather from the flattened tokens
        flat = pc.list_flatten(toks)
        tok_starts = np.concatenate([[0], np.cumsum(lens[:-1])])
        first_idx = tok_starts[rep] + chunk_id * win
        first = flat.take(pa.array(first_idx, pa.int64()))
        return pa.table({
            "doc_id": pa.array(doc_ids[rep], pa.int64()),
            "chunk_id": pa.array(chunk_id, pa.int64()),
            "n_tok": pa.array(n_tok, pa.int64()),
            "first_token": first})

    return (_read(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(chunks, batch_format="pyarrow"))


SQL_CHUNK_DOCS = """
with w as (
  select doc_id, string_split(text, ' ') as words,
         len(string_split(text, ' ')) as n from documents
)
select doc_id, i as chunk_id,
       least(64, n - i * 64) as n_tok,
       words[i * 64 + 1] as first_token
from w, unnest(range(0, cast(ceil(n / 64.0) as bigint))) as t(i)
"""


# --------------------------------------------------------------------------
# 48. bloom-prefiltered selective join: a ~128 KB bitset of the rare
#     'P'-order keys broadcast into the lineitem scan drops non-matching
#     rows BEFORE the shuffle join (the 100 TB shuffle-volume lever);
#     exact join afterwards removes bloom false positives, so the result
#     is exact.

def q_bloom_semi_join(sf_dir: str):
    from ..functions.bloom import build_bloom, filter_by_bloom

    p_orders = _read(sf_dir, "orders", ["o_orderkey"],
                     row_filter=pc.field("o_orderstatus") == "P")
    bloom = build_bloom(p_orders, "o_orderkey", n_bits=1 << 20, k=4)
    cand = filter_by_bloom(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]),
        "l_orderkey", bloom)
    # the exact membership check behind the bloom: the P-order key set
    # rides the footer-gated dim attach (broadcast under the gate, the
    # distributed sidecar join past it) -- the bloom still prunes the
    # probe side before anything moves
    joined = _attach_dim(cand, sf_dir, "orders",
                         fact_key="l_orderkey", dim_key="o_orderkey",
                         columns=["o_orderkey"],
                         row_filter=pc.field("o_orderstatus") == "P",
                         join_width=_join_parts(sf_dir, "orders"))

    def one(b: pa.Table) -> pa.Table:
        q = b.column("l_quantity").to_numpy()
        return pa.table({"n_items": pa.array([len(q)], pa.int64()),
                         "sum_qty": pa.array([float(q.sum())],
                                             pa.float64())})

    a = _agg()
    row = (joined.map_batches(one, batch_format="pyarrow")
           .aggregate(a.Sum("n_items", alias_name="n_items"),
                      a.Sum("sum_qty", alias_name="sum_qty")))
    # sums of integer-valued doubles are exact in any order (< 2^53)
    return pa.table({"n_items": pa.array([int(row["n_items"])], pa.int64()),
                     "sum_qty": pa.array([float(row["sum_qty"])],
                                         pa.float64())})


SQL_BLOOM_SEMI_JOIN = """
select cast(count(*) as bigint) as n_items, sum(l_quantity) as sum_qty
from lineitem join orders on l_orderkey = o_orderkey
where o_orderstatus = 'P'
"""


# --------------------------------------------------------------------------
# 49. calendar-bucketed aggregate (date_trunc month): the time-rollup
#     every monitoring/revenue pipeline needs; exact integer-cents money.

def q_monthly_revenue(sf_dir: str):
    def partial(b: pa.Table) -> pa.Table:
        ts = b.column("o_orderdate").cast(pa.timestamp("us")).to_numpy()
        months = ts.astype("datetime64[M]")
        cents = np.rint(b.column("o_totalprice").to_numpy()
                        * 100.0).astype(np.int64)
        uniq, inv = np.unique(months, return_inverse=True)
        # int64 accumulator, not bincount's float64 weights: a partial
        # past 2^53 would silently round and break the exact-cents
        # guarantee at scale
        rev = np.zeros(len(uniq), np.int64)
        np.add.at(rev, inv, cents)
        return pa.table({
            "month": pa.array(uniq.astype("datetime64[us]"),
                              pa.timestamp("us")),
            "n_orders": pa.array(np.bincount(inv), pa.int64()),
            "revenue_cents": pa.array(rev, pa.int64())})

    a = _agg()
    return (_read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("month")
            .aggregate(a.Sum("n_orders", alias_name="n_orders"),
                       a.Sum("revenue_cents", alias_name="revenue_cents")))


SQL_MONTHLY_REVENUE = """
select cast(date_trunc('month', o_orderdate) as timestamp) as month,
       cast(count(*) as bigint) as n_orders,
       cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint)
           as revenue_cents
from orders group by 1
"""


# --------------------------------------------------------------------------
# 50. exact fixed-width histogram over a numeric column: integer-cents
#     bucket arithmetic on BOTH sides, so no float boundary can disagree.

def q_price_histogram(sf_dir: str):
    def partial(b: pa.Table) -> pa.Table:
        cents = np.rint(b.column("o_totalprice").to_numpy()
                        * 100.0).astype(np.int64)
        bucket = cents // 1_000_000          # $10,000-wide buckets
        uniq, inv = np.unique(bucket, return_inverse=True)
        return pa.table({"bucket": pa.array(uniq, pa.int64()),
                         "n": pa.array(np.bincount(inv), pa.int64())})

    a = _agg()
    return (_read(sf_dir, "orders", ["o_totalprice"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("bucket")
            .aggregate(a.Sum("n", alias_name="n")))


SQL_PRICE_HISTOGRAM = """
select cast(round(o_totalprice * 100) as bigint) // 1000000 as bucket,
       cast(count(*) as bigint) as n
from orders group by bucket
"""


# --------------------------------------------------------------------------
# 51. exact median absolute deviation per group: robust statistics from
#     the same (group, value)-keyed count shuffle as zonal_group_stats --
#     the MAD needs NO second data pass, because |v - med| is a pure
#     transform of the already-collected value-count table.

def _weighted_median(v: np.ndarray, c: np.ndarray) -> float:
    """DuckDB median rule over a value-count table: average of the two
    middle elements for even totals."""
    order = np.argsort(v)
    v, c = v[order], c[order]
    cum = np.cumsum(c)
    n = int(cum[-1])
    lo = v[np.searchsorted(cum, (n - 1) // 2 + 1)]
    hi = v[np.searchsorted(cum, n // 2 + 1)]
    return float((lo + hi) / 2.0)


def q_mad_quantity(sf_dir: str):
    vc = _partial_count_sums(
        _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"]),
        ["l_returnflag", "l_quantity"], {}, count_alias="vn")
    tab = _collect(vc)
    flags = np.asarray(tab.column("l_returnflag").to_pylist())
    vals = tab.column("l_quantity").to_numpy().astype(np.float64)
    cnts = tab.column("vn").to_numpy().astype(np.int64)
    out = {"l_returnflag": [], "med_qty": [], "mad_qty": []}
    for flag in sorted(set(flags.tolist())):
        sel = flags == flag
        v, c = vals[sel], cnts[sel]
        med = _weighted_median(v, c)
        out["l_returnflag"].append(flag)
        out["med_qty"].append(med)
        out["mad_qty"].append(_weighted_median(np.abs(v - med), c))
    return pa.table({
        "l_returnflag": pa.array(out["l_returnflag"], pa.string()),
        "med_qty": pa.array(out["med_qty"], pa.float64()),
        "mad_qty": pa.array(out["mad_qty"], pa.float64())})


SQL_MAD_QUANTITY = """
with m as (
    select l_returnflag, median(l_quantity) as med
    from lineitem group by 1
)
select l.l_returnflag,
       cast(m.med as double) as med_qty,
       cast(median(abs(l.l_quantity - m.med)) as double) as mad_qty
from lineitem l join m on l.l_returnflag = m.l_returnflag
group by 1, m.med
"""


# --------------------------------------------------------------------------
# 52. ordered string aggregation (string_agg ... order by): the
#     order-sensitive aggregate shape -- broadcast dim + groupby with a
#     deterministic in-group sort before concatenation.

def q_region_nations_agg(sf_dir: str):
    region = pq.read_table(f"{sf_dir}/region.parquet",
                           columns=["r_regionkey", "r_name"])
    r_name = dict(zip(region.column("r_regionkey").to_pylist(),
                      region.column("r_name").to_pylist()))

    def tag(b: pa.Table) -> pa.Table:
        rk = b.column("n_regionkey").to_pylist()
        return pa.table({
            "r_name": pa.array([r_name[k] for k in rk], pa.string()),
            "n_name": b.column("n_name")})

    def agg_sorted(group: pa.Table) -> pa.Table:
        names = sorted(group.column("n_name").to_pylist())
        return pa.table({
            "r_name": pa.array([group.column("r_name")[0].as_py()],
                               pa.string()),
            "nations": pa.array([",".join(names)], pa.string()),
            "n_nations": pa.array([len(names)], pa.int64())})

    return (_read(sf_dir, "nation", ["n_regionkey", "n_name"])
            .map_batches(tag, batch_format="pyarrow")
            .groupby("r_name")
            .map_groups(agg_sorted, batch_format="pyarrow"))


SQL_REGION_NATIONS_AGG = """
select r_name, string_agg(n_name, ',' order by n_name) as nations,
       cast(count(*) as bigint) as n_nations
from region join nation on r_regionkey = n_regionkey
group by r_name
"""


# --------------------------------------------------------------------------
# hierarchical quad-cell index (the H3/S2-analogue's multi-resolution half:
# geo/quad.py — parent rollup + S2 CellUnion::Normalize compaction)


def q_quad_rollup(sf_dir: str):
    """Multi-resolution cell rollup (H3 ``cell_to_parent`` role): supplier
    points -> res-8 quad cells -> ``qparent`` x4 -> count per res-4 cell,
    keyed by the PACKED int64 id.  The SQL oracle recomputes the same bit
    layout ``(res << 52) | (cy << 26) | cx``, so the hash check pins the
    packing itself, not just the counts."""
    from ..geo.quad import point_to_qcell, qparent

    def cellify(b: pa.Table) -> pa.Table:
        sk = b.column("s_suppkey").to_numpy()
        x = (sk * 53) % 1000
        y = (sk * 97) % 1000
        fine = point_to_qcell(x, y, 8, 0.0, 1024.0, 1024.0)
        return pa.table({"qcell": pa.array(qparent(fine, 4), pa.int64())})

    a = _agg()
    return (_read(sf_dir, "supplier", ["s_suppkey"])
            .map_batches(cellify, batch_format="pyarrow")
            .groupby("qcell")
            .aggregate(a.Count(alias_name="n")))


# the window is 1024 world units, power of two, so the engine's float path
# (x / 1024 * 256) and the oracle's integer path (x // 4) are both exact;
# the y axis inverts (north edge = 1024) and clamps at the border cell.
SQL_QUAD_ROLLUP = """
select ((4::BIGINT << 52)
        | ((least((1024 - (s_suppkey * 97) % 1000) // 4, 255) // 16) << 26)
        | (least(((s_suppkey * 53) % 1000) // 4, 255) // 16)) as qcell,
       count(*) as n
from supplier
group by 1
"""


def q_quad_compact(sf_dir: str):
    """S2 ``CellUnion::Normalize`` as a gate query: supplier buffer squares
    -> distinct res-6 quad cells (64x64 grid over the 1024 window) ->
    :func:`balrog_ray.geo.quad.compact` -> ``(res, cx, cy)`` rows.  The SQL
    oracle unrolls the same finest-to-coarsest quartet promotion as chained
    CTEs, so the hash check pins compaction semantics end-to-end.  The
    distinct fine cover is bounded by the grid (<= 4096 rows regardless of
    input size), so the driver-side ``compact`` is O(grid), never O(input)."""
    from ..geo.quad import compact, qcell_id, qcell_res, qcell_xy

    def cover(b: pa.Table) -> pa.Table:
        sk = b.column("s_suppkey").to_numpy()
        x = (sk * 53) % 1000
        y = (sk * 97) % 1000
        r = 30 + (sk % 5) * 10
        cx0 = np.maximum(x - r, 0) // 16
        cx1 = np.minimum((x + r) // 16, 63)
        cy0 = np.maximum(1024 - (y + r), 0) // 16
        cy1 = np.minimum(np.maximum(1024 - (y - r), 0) // 16, 63)
        out_cx, out_cy = [], []
        for a0, a1, b0, b1 in zip(cx0, cx1, cy0, cy1):
            xs = np.arange(a0, a1 + 1)
            ys = np.arange(b0, b1 + 1)
            gx, gy = np.meshgrid(xs, ys)
            out_cx.append(gx.ravel())
            out_cy.append(gy.ravel())
        if not out_cx:
            return pa.table({"cx": pa.array([], pa.int64()),
                             "cy": pa.array([], pa.int64())})
        return pa.table({
            "cx": pa.array(np.concatenate(out_cx), pa.int64()),
            "cy": pa.array(np.concatenate(out_cy), pa.int64())})

    a = _agg()
    fine = _collect(
        _read(sf_dir, "supplier", ["s_suppkey"])
        .map_batches(cover, batch_format="pyarrow")
        .groupby(["cx", "cy"])
        .aggregate(a.Count(alias_name="n")))
    ids = compact(qcell_id(6, fine.column("cx").to_numpy(),
                           fine.column("cy").to_numpy()))
    cx, cy = qcell_xy(ids)
    return pa.table({"res": pa.array(qcell_res(ids), pa.int64()),
                     "cx": pa.array(cx, pa.int64()),
                     "cy": pa.array(cy, pa.int64())})


def _quad_compact_sql() -> str:
    """Unroll the level-by-level quartet promotion (res 6 -> 0) as chained
    CTEs: at each level, res-r cells whose 4 siblings are all present
    collapse into their parent; everything else passes through.  DuckDB's
    ``//`` truncates toward zero, so the fine-cover arithmetic clamps with
    greatest() BEFORE dividing (matching the engine's np.maximum) to keep
    every divided quantity non-negative."""
    steps = []
    for r in range(6, 0, -1):
        steps.append(f"""
p{r} as (
  select cx // 2 as pcx, cy // 2 as pcy from s{r}
  where res = {r}
  group by 1, 2 having count(*) = 4),
s{r - 1} as (
  select cast({r - 1} as bigint) as res, pcx as cx, pcy as cy from p{r}
  union all
  select res, cx, cy from s{r} c
  where res <> {r} or not exists (
    select 1 from p{r} p
    where p.pcx = c.cx // 2 and p.pcy = c.cy // 2))""")
    return """
with fine as (
  select distinct cx, cy from (
    select unnest(range(greatest(1024 - (y + r), 0) // 16,
                        least(greatest(1024 - (y - r), 0) // 16, 63) + 1))
             as cy, cx
    from (
      select unnest(range(greatest(x - r, 0) // 16,
                          least((x + r) // 16, 63) + 1)) as cx, y, r
      from (select (s_suppkey * 53) % 1000 as x,
                   (s_suppkey * 97) % 1000 as y,
                   30 + (s_suppkey % 5) * 10 as r
            from supplier) t0) t1) t2),
s6 as (select cast(6 as bigint) as res, cx, cy from fine),""" + ",".join(
        steps) + """
select res, cx, cy from s0
"""


SQL_QUAD_COMPACT = _quad_compact_sql()


# --------------------------------------------------------------------------
# heavy hitters: Misra-Gries candidate sketch + exact distributed recount
# (functions/sketch.heavy_hitter_tokens) -- frequent tokens with EXACT
# counts and no full token-frequency shuffle


def q_heavy_hitters(sf_dir: str):
    """Tokens occurring more than total_tokens // 200 times across the
    corpus, exact counts.  The sketch pass bounds what moves (512 counters
    per block), the recount pass restores exactness, so the result equals
    the SQL's full groupby-HAVING despite never shuffling every token."""
    from ..functions.sketch import heavy_hitter_tokens

    return heavy_hitter_tokens(_read(sf_dir, "documents", ["text"]),
                               width=512, denom=200)


SQL_HEAVY_HITTERS = """
with toks as (
  select unnest(string_split(text, ' ')) as token from documents)
select token, cast(count(*) as bigint) as n
from toks
group by token
having count(*) > (select count(*) from toks) // 200
"""


# --------------------------------------------------------------------------
# cross-document substring dedup: per-doc count of 8-token window positions
# whose window occurs in >= 2 distinct documents (functions/dedup.
# dup_window_counts -- the suffix-array substring-dedup role)


def q_substring_dedup(sf_dir: str):
    """Documents carrying cross-document duplicated 8-token substrings,
    with the exact count of duplicated window positions per doc.  The
    engine keys windows by 128-bit polynomial hashes over per-token
    hashes (never ships window text); the oracle enumerates the window
    strings themselves -- equality holds because equal token sequences
    always produce equal keys and the 128-bit id space makes cross-window
    collisions negligible."""
    from ..functions.dedup import dup_window_counts

    return dup_window_counts(_read(sf_dir, "documents", ["doc_id", "text"]),
                             win=8)


SQL_SUBSTRING_DEDUP = """
with toks as (
  select doc_id, string_split(text, ' ') as t from documents),
pos as (
  select doc_id, t,
         unnest(generate_series(1, greatest(len(t) - 7, 0))) as i
  from toks),
w as (select doc_id, array_to_string(t[i:i+7], ' ') as win from pos),
freq as (select win, count(distinct doc_id) as nd from w group by win)
select doc_id, cast(count(*) as bigint) as dup_windows
from w join freq using (win)
where nd >= 2
group by doc_id
"""


# --------------------------------------------------------------------------
# ordered conversion funnel over the event stream: view -> click ->
# purchase, each step within 86400 s of the previous, earliest-qualifying
# timestamp semantics


def q_funnel_steps(sf_dir: str):
    """Three-step ordered funnel: per user, the earliest 'view', then the
    earliest 'click' strictly after it within 86400 s, then the earliest
    'purchase' strictly after that within 86400 s; output is users
    reaching each step.  Scale shape: ONE keyed fold; each step is a
    masked segment-min (``minimum.reduceat``) over every complete user
    run at once, the fold emits a per-block (depth, n) partial
    histogram, and the final reduction is a 4-row groupby sum --
    nothing user-cardinality-sized reaches the driver."""
    WIN_US = 86_400 * 1_000_000

    from ..partitions import keyed_fold

    INF = np.iinfo(np.int64).max

    def fold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "user_id" not in b.column_names:
            return pa.table({"depth": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        order = pc.sort_indices(b, sort_keys=[("user_id", "ascending"),
                                              ("ts", "ascending")])
        g = b.take(order)
        uid = g.column("user_id").to_numpy()
        ts = (g.column("ts").to_numpy().astype("datetime64[us]")
              .astype(np.int64))
        et = g.column("event_type")
        code = np.full(len(uid), 3, np.int8)
        for ci, name in enumerate(("view", "click", "purchase")):
            code[pc.equal(et, name).to_numpy(
                zero_copy_only=False)] = ci
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        counts = np.diff(np.r_[starts, len(uid)])

        def seg_min(mask):
            return np.minimum.reduceat(np.where(mask, ts, INF), starts)

        t1 = seg_min(code == 0)
        t1r = np.repeat(t1, counts)
        ok1 = t1r != INF
        t2 = seg_min((code == 1) & ok1 & (ts > t1r)
                     & (ts - t1r <= WIN_US))
        t2r = np.repeat(t2, counts)
        ok2 = t2r != INF
        t3 = seg_min((code == 2) & ok2 & (ts > t2r)
                     & (ts - t2r <= WIN_US))
        d = ((t1 != INF).astype(np.int64) + (t2 != INF)
             + (t3 != INF))
        u, n = np.unique(d, return_counts=True)
        return pa.table({"depth": pa.array(u, pa.int64()),
                         "n": pa.array(n, pa.int64())})

    counts = (_keyed_scan(
        _read(sf_dir, "events", ["user_id", "ts", "event_type"]), "user_id", fold,
        sf_dir=sf_dir, table="events",
        num_partitions=_join_parts(sf_dir, "events"))
              .groupby("depth")
              .aggregate(_agg().Sum("n", alias_name="n"))
              .take_all())                       # <= 4 rows
    by_depth = {r["depth"]: r["n"] for r in counts}
    users = [sum(n for d, n in by_depth.items() if d >= k)
             for k in (1, 2, 3)]
    return pa.table({"step": pa.array(["view", "click", "purchase"],
                                      pa.string()),
                     "users": pa.array(users, pa.int64())})


SQL_FUNNEL_STEPS = """
with e as (select user_id, event_type, epoch(ts) as ts from events),
s1 as (select user_id, min(ts) as t1 from e
       where event_type = 'view' group by user_id),
s2 as (select e.user_id, min(e.ts) as t2 from e join s1 using (user_id)
       where event_type = 'click' and e.ts > t1 and e.ts <= t1 + 86400
       group by e.user_id),
s3 as (select e.user_id, min(e.ts) as t3 from e join s2 using (user_id)
       where event_type = 'purchase' and e.ts > t2 and e.ts <= t2 + 86400
       group by e.user_id)
select 'view' as step, cast((select count(*) from s1) as bigint) as users
union all
select 'click', cast((select count(*) from s2) as bigint)
union all
select 'purchase', cast((select count(*) from s3) as bigint)
"""


# --------------------------------------------------------------------------
# repetition quality signals (functions/text.repetition_stats) -- Gopher
# "fraction of characters in most common n-gram" family, n=1, zero shuffles


def q_repetition_docs(sf_dir: str):
    """Documents whose most frequent token is >= 20% of all tokens --
    integer numerator/denominator output so the compare is exact."""
    from ..functions.text import repetition_stats

    return repetition_stats(_read(sf_dir, "documents", ["doc_id", "text"]),
                            max_top_share=0.2)


def q_top_bigram_docs(sf_dir: str):
    """Documents whose most frequent adjacent token pair is >= 10% of
    all pairs (Gopher repetition rule family, n=2) -- integer
    numerator/denominator output so the compare is exact."""
    from ..functions.text import top_bigram_stats

    return top_bigram_stats(_read(sf_dir, "documents",
                                  ["doc_id", "text"]),
                            max_top_share=0.1)


SQL_TOP_BIGRAM_DOCS = """
with toks as (select doc_id, string_split(text, ' ') as l
              from documents),
pairs as (
  select doc_id, unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) as pr
  from toks where len(l) >= 2),
cnt as (select doc_id, pr, count(*) as c from pairs group by 1, 2),
top as (select doc_id, sum(c) as n_pairs, max(c) as top_count
        from cnt group by 1)
select doc_id, cast(n_pairs as bigint) as n_pairs,
       cast(top_count as bigint) as top_count
from top where top_count * 10 >= n_pairs
"""


def q_seasonal_decompose(sf_dir: str):
    """Classical additive seasonal decomposition of the hourly event
    count series (statsmodels ``seasonal_decompose`` role): dense
    hourly counts -> centered 2x24 moving-average trend -> per
    hour-of-day mean of the detrended series, centered to sum to
    zero -> the 24 seasonal indexes.

    Scale shape: the heavy pass is the distributed count -- per-batch
    ``np.unique`` partials then ONE ``groupby(hr).sum`` whose output
    is O(series length), independent of event count; the decomposition
    itself runs on that stat-sized table (696 detrended points here).
    Hour arithmetic is integer epoch-microseconds (TZ-independent,
    the round-2 lesson).  Trend sums are integer-valued in float64 --
    bit-exact under any summation order -- so only the final 29-value
    means carry float rounding, inside the driver's 1e-9 compare."""
    a = _agg()

    def hours(b: pa.Table) -> pa.Table:
        us = pc.cast(b.column("ts"), pa.int64()).to_numpy()
        hr, c = np.unique(us // 3_600_000_000, return_counts=True)
        return pa.table({"hr": pa.array(hr, pa.int64()),
                         "y": pa.array(c.astype(np.int64), pa.int64())})

    counts = (_read(sf_dir, "events", ["ts"])
              .map_batches(hours, batch_format="pyarrow")
              .groupby("hr")
              .aggregate(a.Sum("y", alias_name="y"))
              .to_pandas())                       # O(hours), tiny
    hrs = counts["hr"].to_numpy(np.int64)
    lo = int(hrs.min())
    dense = np.zeros(int(hrs.max()) - lo + 1, np.float64)
    dense[hrs - lo] = counts["y"].to_numpy(np.float64)
    n = len(dense)
    if n < 25:
        return pa.table({"hod": pa.array([], pa.int64()),
                         "seasonal": pa.array([], pa.float64())})
    # trend[t] = (y[t-12]/2 + sum_{|k|<=11} y[t+k] + y[t+12]/2) / 24
    s23 = np.convolve(dense, np.ones(23), "valid")   # s23[j]=sum j..j+22
    t_idx = np.arange(12, n - 12)
    trend = (0.5 * dense[t_idx - 12] + s23[t_idx - 11]
             + 0.5 * dense[t_idx + 12]) / 24.0
    d = dense[t_idx] - trend
    hod = (lo + t_idx) % 24
    s_raw = np.array([d[hod == h].mean() for h in range(24)])
    seasonal = s_raw - s_raw.mean()
    return pa.table({"hod": pa.array(np.arange(24), pa.int64()),
                     "seasonal": pa.array(seasonal, pa.float64())})


SQL_SEASONAL_DECOMPOSE = """
with h as (
  select cast(floor(epoch(ts) / 3600) as bigint) as hr, count(*) as y
  from events group by 1),
dense as (
  select u.hr, coalesce(h.y, 0) as y
  from (select unnest(range((select min(hr) from h),
                            (select max(hr) from h) + 1)) as hr) u
  left join h on h.hr = u.hr),
tr as (
  select hr, y,
    case when count(*) over
           (order by hr rows between 12 preceding and 12 following)
         = 25
    then (0.5 * first_value(y) over
            (order by hr rows between 12 preceding and 12 following)
          + sum(y) over
            (order by hr rows between 11 preceding and 11 following)
          + 0.5 * last_value(y) over
            (order by hr rows between 12 preceding and 12 following)
         ) / 24.0
    end as trend
  from dense),
det as (select hr, y - trend as d from tr where trend is not null),
si as (select hr % 24 as hod, avg(d) as s_raw from det group by 1),
m as (select avg(s_raw) as mu from si)
select si.hod, si.s_raw - m.mu as seasonal from si, m order by si.hod
"""


def q_ewma_user_value(sf_dir: str):
    """Per-user exponentially-weighted moving average of event values
    (alpha = 0.25) over the (ts, event_id)-ordered stream, reporting
    the FINAL state per user -- the canonical sequential-state scan
    (stream smoothing / online feature) that no window frame
    expresses; the oracle drives DuckDB's recursive CTE through the
    identical recurrence.

    Scale shape: ONE keyed fold; the scan is inherently sequential PER
    USER (each step reads the previous state), so the fold runs it in
    WAVES over the within-user rank -- wave k updates every user with
    a k-th event in one vectorized ``0.25 x + 0.75 s`` -- i.e. Python
    cost O(max events/user), not O(events).  Each user's arithmetic is
    the exact scalar recurrence in the same order (IEEE float64
    elementwise), so the compare against DuckDB's recursive CTE stays
    bit-tight, not just 1e-9-tight."""
    from ..partitions import keyed_fold

    def fold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "user_id" not in b.column_names:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "ewma": pa.array([], pa.float64())})
        order = pc.sort_indices(b, sort_keys=[
            ("user_id", "ascending"), ("ts", "ascending"),
            ("event_id", "ascending")])
        g = b.take(order)
        uid = g.column("user_id").to_numpy()
        x = g.column("value").to_numpy()
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        counts = np.diff(np.r_[starts, len(uid)])
        s = x[starts].copy()
        for k in range(1, int(counts.max())):
            valid = counts > k
            s[valid] = 0.25 * x[starts[valid] + k] + 0.75 * s[valid]
        return pa.table({
            "user_id": pa.array(uid[starts], pa.int64()),
            "ewma": pa.array(s, pa.float64())})

    return _keyed_scan(
        _read(sf_dir, "events", ["user_id", "event_id", "ts",
                                 "value"]), "user_id", fold,
        sf_dir=sf_dir, table="events",
        num_partitions=_join_parts(sf_dir, "events"))


SQL_EWMA_USER_VALUE = """
with seq as (
  select user_id, value,
         row_number() over (partition by user_id
                            order by ts, event_id) as t,
         count(*) over (partition by user_id) as n
  from events),
final_state as (
  with recursive r as (
    select user_id, t, value as s, n from seq where t = 1
    union all
    select seq.user_id, seq.t, 0.25 * seq.value + 0.75 * r.s, r.n
    from r join seq on seq.user_id = r.user_id and seq.t = r.t + 1)
  select user_id, s from r where t = n)
select user_id, s as ewma from final_state
"""


def q_session_paths(sf_dir: str):
    """Clickstream path analysis: sessionize each user's stream (same
    1800 s gap rule as `sessionize`), form the ordered event-type path
    per session ('view>click>...'), and count identical paths
    corpus-wide, keeping paths seen >= 3 times -- the funnel-mining /
    common-journey shape.

    Scale shape: ONE keyed fold co-locates each user's stream; inside
    the fold session ids come from a single vectorized cumsum over ALL
    user runs and the per-block (path, n) PARTIALS ship to the final
    groupby(path) -- aggregates, not sessions, cross the second
    exchange.  (The previous per-user map_groups paid ~45us/group plus
    an O(sessions x events) flatnonzero scan per user.)"""
    from ..partitions import keyed_fold

    a = _agg()

    def fold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "user_id" not in b.column_names:
            return pa.table({"path": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        order = pc.sort_indices(b, sort_keys=[
            ("user_id", "ascending"), ("ts", "ascending"),
            ("event_id", "ascending")])
        g = b.take(order)
        uid = g.column("user_id").to_numpy()
        ts = (g.column("ts").to_numpy().astype("datetime64[us]")
              .astype(np.int64))
        brk = np.r_[True, (uid[1:] != uid[:-1])
                    | ((ts[1:] - ts[:-1]) > 1800 * 1_000_000)]
        sid = np.cumsum(brk) - 1
        et = g.column("event_type").to_pylist()
        starts = np.flatnonzero(brk)
        bounds = np.r_[starts, len(sid)]
        paths = [">".join(et[bounds[i]:bounds[i + 1]])
                 for i in range(len(starts))]
        u, n = np.unique(np.asarray(paths, dtype=object),
                         return_counts=True)
        return pa.table({"path": pa.array(u, pa.string()),
                         "n": pa.array(n, pa.int64())})

    counted = (_keyed_scan(
        _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                 "event_type"]), "user_id", fold,
        sf_dir=sf_dir, table="events",
        num_partitions=_join_parts(sf_dir, "events"))
               .groupby("path")
               .aggregate(a.Sum("n", alias_name="n")))
    return counted.filter(expr="n >= 3")


SQL_SESSION_PATHS = """
with e as (
  select user_id, ts, event_id, event_type,
         case when epoch(ts) - lag(epoch(ts)) over
                (partition by user_id order by ts, event_id) > 1800
              then 1 else 0 end as brk
  from events),
s as (
  select user_id, ts, event_id, event_type,
         sum(brk) over (partition by user_id order by ts, event_id
                        rows unbounded preceding) as sess
  from e),
p as (
  select user_id, sess,
         string_agg(event_type, '>' order by ts, event_id) as path
  from s group by 1, 2)
select path, count(*) as n from p group by 1 having count(*) >= 3
"""


def q_mutual_info(sf_dir: str):
    """Mutual information (nats) between event type and hour-of-day,
    plus the two marginal entropies -- the information-theoretic
    dependence screen feature pipelines run before keeping a column.
    Distributed shape: per-batch (type, hour) partial counts then ONE
    tiny groupby; MI evaluates on the |types| x 24 contingency table
    from exact integer counts, rounded to 9 dp on both sides (term
    order is the only float freedom and sits at ~1e-16)."""
    a = _agg()

    def cells(b: pa.Table) -> pa.Table:
        us = pc.cast(b.column("ts"), pa.int64()).to_numpy()
        h = (us // 3_600_000_000) % 24
        t = np.asarray(b.column("event_type").to_pylist(), object)
        key = np.char.add(np.char.add(t.astype(str), "|"),
                          h.astype(str))
        u, c = np.unique(key, return_counts=True)
        return pa.table({"k": pa.array(u.tolist(), pa.string()),
                         "n": pa.array(c.astype(np.int64), pa.int64())})

    tab = (_read(sf_dir, "events", ["ts", "event_type"])
           .map_batches(cells, batch_format="pyarrow")
           .groupby("k")
           .aggregate(a.Sum("n", alias_name="n"))
           .to_pandas())                      # |types| x 24, tiny
    ks = tab["k"].str.split("|")
    t_lab = ks.str[0].to_numpy()
    h_lab = ks.str[1].astype(np.int64).to_numpy()
    n = tab["n"].to_numpy(np.float64)
    nn = n.sum()
    nt = {t: n[t_lab == t].sum() for t in np.unique(t_lab)}
    nh = {h: n[h_lab == h].sum() for h in np.unique(h_lab)}
    mi = float(sum((n[i] / nn)
                   * np.log((n[i] * nn) / (nt[t_lab[i]] * nh[h_lab[i]]))
                   for i in range(len(n))))
    ent_t = float(-sum((v / nn) * np.log(v / nn)
                       for v in nt.values()))
    ent_h = float(-sum((v / nn) * np.log(v / nn)
                       for v in nh.values()))
    return pa.table({"mi": pa.array([round(mi, 9)], pa.float64()),
                     "entropy_type": pa.array([round(ent_t, 9)],
                                              pa.float64()),
                     "entropy_hour": pa.array([round(ent_h, 9)],
                                              pa.float64())})


SQL_MUTUAL_INFO = """
with j as (select event_type as t,
                  cast(floor(epoch(ts) / 3600) as bigint) % 24 as h,
                  count(*) as n
           from events group by 1, 2),
tot as (select sum(n) as nn from j),
tt as (select t, sum(n) as nt from j group by 1),
hh as (select h, sum(n) as nh from j group by 1)
select round(sum((j.n / tot.nn)
                 * ln((j.n * tot.nn) / (tt.nt * hh.nh))), 9) as mi,
       round(-sum_t, 9) as entropy_type,
       round(-sum_h, 9) as entropy_hour
from (select sum((nt / (select nn from tot))
                 * ln(nt / (select nn from tot))) as sum_t from tt),
     (select sum((nh / (select nn from tot))
                 * ln(nh / (select nn from tot))) as sum_h from hh),
     j, tot, tt, hh
where j.t = tt.t and j.h = hh.h
group by sum_t, sum_h
"""


SQL_REPETITION_DOCS = """
with toks as (
  select doc_id, unnest(string_split(text, ' ')) as tok from documents),
per as (select doc_id, tok, count(*) as c from toks group by doc_id, tok),
st as (select doc_id, sum(c) as n_tokens, count(*) as n_distinct,
              max(c) as top_count
       from per group by doc_id)
select doc_id, cast(n_tokens as bigint) as n_tokens,
       cast(n_distinct as bigint) as n_distinct,
       cast(top_count as bigint) as top_count
from st
where top_count * 5 >= n_tokens
"""


# --------------------------------------------------------------------------
# left outer join: per-customer order counts INCLUDING zero-order customers


def q_customer_order_counts(sf_dir: str, broadcast_limit: int = 5_000_000):
    """Dimension LEFT OUTER fact-counts -- every customer with its count
    of finalized ('F') orders, zero included (the status filter
    guarantees genuinely unmatched dimension keys at every test scale,
    so the outer/null path is exercised by data, not just by code).
    Scale shape: the fact side is pre-aggregated
    to per-key counts BEFORE anything else (key-cardinality bounded, not
    fact-cardinality).  If that count table fits under
    ``broadcast_limit`` rows it is ``ray.put`` ONCE and the left-outer
    becomes a zero-shuffle sorted-lookup map over the streaming
    dimension (the broadcast-small-side rule; a hash-join operator costs
    ~5 s of fixed actor setup for the same answer at sf0.1); above the
    limit the distributed ``left_outer`` hash join runs instead, so
    open-web key cardinalities still work."""
    import ray

    agg = _agg()
    ocnt = (_read(sf_dir, "orders", ["o_custkey"],
                  row_filter=pc.field("o_orderstatus") == "F")
            .groupby("o_custkey")
            .aggregate(agg.Count(alias_name="n_orders"))
            .materialize())
    cust = _read(sf_dir, "customer", ["c_custkey"])
    if ocnt.count() <= broadcast_limit:
        tab = _collect(ocnt)
        keys = tab.column("o_custkey").to_numpy()
        vals = tab.column("n_orders").to_numpy().astype(np.int64)
        order = np.argsort(keys)
        ref = ray.put((keys[order], vals[order]))

        def lookup(b: pa.Table) -> pa.Table:
            k, v = ray.get(ref)
            ck = b.column("c_custkey").to_numpy()
            if len(k) == 0:
                n = np.zeros(len(ck), np.int64)
            else:
                pos = np.minimum(np.searchsorted(k, ck), len(k) - 1)
                n = np.where(k[pos] == ck, v[pos], 0)
            return pa.table({"c_custkey": b.column("c_custkey"),
                             "n_orders": pa.array(n, pa.int64())})

        return cust.map_batches(lookup, batch_format="pyarrow")

    joined = cust.join(
        ocnt, "left_outer",
        num_partitions=_join_parts(sf_dir, "customer", "orders"),
        on=("c_custkey",), right_on=("o_custkey",))

    def fill(b: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": b.column("c_custkey"),
            "n_orders": pc.fill_null(b.column("n_orders").cast(pa.int64()),
                                     0)})

    return joined.map_batches(fill, batch_format="pyarrow")


SQL_CUSTOMER_ORDER_COUNTS = """
select c_custkey, cast(count(o_orderkey) as bigint) as n_orders
from customer left join (select * from orders where o_orderstatus = 'F') o
  on c_custkey = o_custkey
group by c_custkey
"""


# --------------------------------------------------------------------------
# CUBE grouping sets: all four (status, priority) slices from ONE scan


def q_cube_counts(sf_dir: str):
    """``group by cube(o_orderstatus, o_orderpriority)`` -- the full
    grouping-set lattice.  Like rollup: ONE partial-aggregate scan
    produces the (#status x #priority)-bounded base table, and the four
    slices are re-aggregations of that tiny table, so the input is read
    exactly once and nothing slice-sized shuffles."""
    a = _agg()
    base = _partial_count_sums(
        _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"]),
        ["o_orderstatus", "o_orderpriority"], {}, count_alias="n"
    ).materialize()                       # <= (#status x #priority) rows

    def fmt(b: pa.Table, st=None, pr=None) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "st": b.column("o_orderstatus") if st is None
            else pa.array(["ALL"] * n, pa.string()),
            "pr": b.column("o_orderpriority") if pr is None
            else pa.array(["ALL"] * n, pa.string()),
            "n": b.column("n")})

    by_st = (base.groupby("o_orderstatus")
             .aggregate(a.Sum("n", alias_name="n")))
    by_pr = (base.groupby("o_orderpriority")
             .aggregate(a.Sum("n", alias_name="n")))
    total = base.aggregate(a.Sum("n", alias_name="n"))
    import functools

    import ray.data

    total_ds = ray.data.from_arrow(pa.table({
        "st": pa.array(["ALL"], pa.string()),
        "pr": pa.array(["ALL"], pa.string()),
        "n": pa.array([int(total["n"])], pa.int64())}))
    return (base.map_batches(fmt, batch_format="pyarrow")
            .union(by_st.map_batches(functools.partial(fmt, pr="ALL"),
                                     batch_format="pyarrow"))
            .union(by_pr.map_batches(functools.partial(fmt, st="ALL"),
                                     batch_format="pyarrow"))
            .union(total_ds))


SQL_CUBE_COUNTS = """
select coalesce(o_orderstatus, 'ALL') as st,
       coalesce(o_orderpriority, 'ALL') as pr,
       cast(count(*) as bigint) as n
from orders group by cube(o_orderstatus, o_orderpriority)
"""


# --------------------------------------------------------------------------
# FastSS typo pairs: edit-distance-<=1 dedup over short id-like strings
# (functions/dedup.edit_distance_pairs -- deletion-neighborhood candidate
# generation + exact verify, one shuffle, exactly-once pair emission)


def q_typo_pairs(sf_dir: str):
    """All customer-name pairs within Levenshtein distance 1.  The oracle
    is the quadratic ``levenshtein()`` self-join; the engine never forms
    the cross product -- candidates come from the deletion-key shuffle
    and each pair is verified with the exact distance test."""
    from ..functions.dedup import edit_distance_pairs

    pairs = edit_distance_pairs(
        _read(sf_dir, "customer", ["c_custkey", "c_name"]),
        "c_custkey", "c_name")

    def fmt(b: pa.Table) -> pa.Table:
        return pa.table({"key_a": b.column("id_a"),
                         "key_b": b.column("id_b"),
                         "dist": b.column("dist")})

    return pairs.map_batches(fmt, batch_format="pyarrow")


SQL_TYPO_PAIRS = """
select a.c_custkey as key_a, b.c_custkey as key_b,
       cast(levenshtein(a.c_name, b.c_name) as bigint) as dist
from customer a join customer b
  on a.c_custkey < b.c_custkey
where levenshtein(a.c_name, b.c_name) <= 1
"""


# --------------------------------------------------------------------------
# unpivot / melt: wide metric columns -> long (key, metric, value) rows,
# zero shuffle, exact integer-cents values


def q_unpivot_metrics(sf_dir: str):
    """Melt lineitem's four numeric measure columns into long form --
    the wide->long reshape every feature-store export needs.  Pure
    streaming ``map_batches`` (each batch emits its own 4x stack), no
    shuffle, values as exact cents so the compare is bit-stable."""
    METRICS = [("quantity", "l_quantity"),
               ("extendedprice", "l_extendedprice"),
               ("discount", "l_discount"),
               ("tax", "l_tax")]

    def melt(b: pa.Table) -> pa.Table:
        parts = []
        for name, col in METRICS:
            cents = np.rint(b.column(col).to_numpy() * 100.0) \
                .astype(np.int64)
            parts.append(pa.table({
                "l_orderkey": b.column("l_orderkey"),
                "l_linenumber": b.column("l_linenumber"),
                "metric": pa.array([name] * b.num_rows, pa.string()),
                "value_cents": pa.array(cents, pa.int64())}))
        return pa.concat_tables(parts)

    return (_read(sf_dir, "lineitem",
                  ["l_orderkey", "l_linenumber", "l_quantity",
                   "l_extendedprice", "l_discount", "l_tax"])
            .map_batches(melt, batch_format="pyarrow"))


SQL_UNPIVOT_METRICS = """
select l_orderkey, l_linenumber, 'quantity' as metric,
       cast(round(l_quantity * 100) as bigint) as value_cents from lineitem
union all
select l_orderkey, l_linenumber, 'extendedprice',
       cast(round(l_extendedprice * 100) as bigint) from lineitem
union all
select l_orderkey, l_linenumber, 'discount',
       cast(round(l_discount * 100) as bigint) from lineitem
union all
select l_orderkey, l_linenumber, 'tax',
       cast(round(l_tax * 100) as bigint) from lineitem
"""


# --------------------------------------------------------------------------
# FULL OUTER join: per-customer counts of 'F' vs 'O' orders, keys present
# on either side only included with a zero on the other


def q_order_status_outer(sf_dir: str):
    """Full outer join of two filtered per-key aggregates: customers
    with only finalized orders, only open orders, or both.  Both inputs
    are pre-aggregated to key-cardinality-bounded count tables BEFORE
    the join (the partial-aggregate-first rule), then the distributed
    ``full_outer`` hash join aligns them; null sides fill to 0.  Data
    guarantees genuinely unmatched keys on BOTH sides at every scale."""
    agg = _agg()

    def counts(status: str, key_out: str, n_out: str):
        def rename(b: pa.Table) -> pa.Table:
            return pa.table({key_out: b.column("o_custkey"),
                             n_out: b.column("n")})
        return (_read(sf_dir, "orders", ["o_custkey"],
                      row_filter=pc.field("o_orderstatus") == status)
                .groupby("o_custkey")
                .aggregate(agg.Count(alias_name="n"))
                .map_batches(rename, batch_format="pyarrow"))

    joined = counts("F", "ck_f", "n_f").join(
        counts("O", "ck_o", "n_o"), "full_outer",
        num_partitions=_join_parts(sf_dir, "orders"),
        on=("ck_f",), right_on=("ck_o",))

    def fmt(b: pa.Table) -> pa.Table:
        # Ray's full_outer coalesces the join key into the LEFT key
        # column (right-only rows land there too), so ck_f IS custkey
        return pa.table({
            "custkey": b.column("ck_f"),
            "n_f": pc.fill_null(b.column("n_f").cast(pa.int64()), 0),
            "n_o": pc.fill_null(b.column("n_o").cast(pa.int64()), 0)})

    return joined.map_batches(fmt, batch_format="pyarrow")


SQL_ORDER_STATUS_OUTER = """
with f as (select o_custkey, count(*) as n from orders
           where o_orderstatus = 'F' group by o_custkey),
     o as (select o_custkey, count(*) as n from orders
           where o_orderstatus = 'O' group by o_custkey)
select coalesce(f.o_custkey, o.o_custkey) as custkey,
       cast(coalesce(f.n, 0) as bigint) as n_f,
       cast(coalesce(o.n, 0) as bigint) as n_o
from f full outer join o on f.o_custkey = o.o_custkey
"""


# --------------------------------------------------------------------------
# interpolated (continuous) quantiles: exact distributed quantile_cont via
# value-count partials + closed-form interpolation at the quarter points


def q_quantile_cont_flag(sf_dir: str):
    """quantile_cont(l_quantity, .25/.50/.75) per returnflag, exact: the
    shuffle carries (flag, value)->count partials (value-domain bounded,
    never row-cardinality), and the interpolation h = (n-1)q lands on
    exact binary fractions (quarters) over integral values, so engine
    and oracle agree bit-for-bit; output scaled x4 to int64."""
    vc = _partial_count_sums(
        _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"]),
        ["l_returnflag", "l_quantity"], {}, count_alias="vn")
    tab = _collect(vc)
    flags = np.asarray(tab.column("l_returnflag").to_pylist())
    vals = tab.column("l_quantity").to_numpy().astype(np.float64)
    cnts = tab.column("vn").to_numpy().astype(np.int64)
    out = {"l_returnflag": [], "q25x4": [], "q50x4": [], "q75x4": []}
    for flag in sorted(set(flags.tolist())):
        sel = flags == flag
        v, c = vals[sel], cnts[sel]
        order = np.argsort(v)
        v, c = v[order], c[order]
        cum = np.cumsum(c)
        n = int(cum[-1])
        out["l_returnflag"].append(flag)
        for q, col in ((0.25, "q25x4"), (0.5, "q50x4"), (0.75, "q75x4")):
            h = (n - 1) * q
            i0 = int(np.floor(h))
            frac = h - i0
            # order statistics i0 and i0+1 (0-based) from the counts
            lo = float(v[np.searchsorted(cum, i0 + 1)])
            hi = float(v[np.searchsorted(cum, min(i0 + 2, n))])
            out[col].append(int(round((lo + frac * (hi - lo)) * 4)))
    return pa.table({"l_returnflag": pa.array(out["l_returnflag"],
                                              pa.string()),
                     "q25x4": pa.array(out["q25x4"], pa.int64()),
                     "q50x4": pa.array(out["q50x4"], pa.int64()),
                     "q75x4": pa.array(out["q75x4"], pa.int64())})


SQL_QUANTILE_CONT_FLAG = """
select l_returnflag,
       cast(round(quantile_cont(l_quantity, 0.25) * 4) as bigint) as q25x4,
       cast(round(quantile_cont(l_quantity, 0.50) * 4) as bigint) as q50x4,
       cast(round(quantile_cont(l_quantity, 0.75) * 4) as bigint) as q75x4
from lineitem group by l_returnflag
"""


# --------------------------------------------------------------------------
# native LEFT SEMI join (the EXISTS shape through Ray's join operator --
# complements bloom_semi_join's prefilter formulation)


def q_semi_join_native(sf_dir: str):
    """Lineitem rows whose order is status 'P', via ``join("left_semi")``:
    the build side is the filtered key column only (key-cardinality
    bounded), the probe side streams, and no payload from the build side
    is ever materialized -- the EXISTS semantics natively."""
    keys = (_read(sf_dir, "orders", ["o_orderkey"],
                  row_filter=pc.field("o_orderstatus") == "P"))
    return _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"]).join(
        keys, "left_semi",
        num_partitions=_join_parts(sf_dir, "lineitem"),
        on=("l_orderkey",), right_on=("o_orderkey",))


SQL_SEMI_JOIN_NATIVE = """
select l_orderkey, l_linenumber from lineitem l
where exists (select 1 from orders o
              where o.o_orderkey = l.l_orderkey
                and o.o_orderstatus = 'P')
"""


# --------------------------------------------------------------------------
# quad-cell neighbor finding (H3 grid_disk(1) / S2 GetEdgeNeighbors role):
# occupied-cell adjacency counts over the supplier point grid


def q_cell_neighbors(sf_dir: str):
    """Per occupied res-5 quad cell: point count + how many of its 8 grid
    neighbors are also occupied.  The aggregation shuffle is
    key-bounded; the adjacency pass runs on the <= 32x32 occupied-cell
    table (O(grid), never O(points)) with vectorized ``qneighbors`` bit
    arithmetic -- the same function that keys the halo exchange.  The SQL
    oracle recomputes both the packed id bit layout and the adjacency."""
    from ..geo.quad import point_to_qcell, qneighbors

    def cellify(b: pa.Table) -> pa.Table:
        sk = b.column("s_suppkey").to_numpy()
        x = (sk * 53) % 1000
        y = (sk * 97) % 1000
        return pa.table({"qcell": pa.array(
            point_to_qcell(x, y, 5, 0.0, 1024.0, 1024.0), pa.int64())})

    a = _agg()
    cells = _collect(
        _read(sf_dir, "supplier", ["s_suppkey"])
        .map_batches(cellify, batch_format="pyarrow")
        .groupby("qcell")
        .aggregate(a.Count(alias_name="n_pts")))     # <= 1024 rows
    ids = cells.column("qcell").to_numpy()
    nb = qneighbors(ids)                             # (n, 8)
    n_nbrs = (np.isin(nb, ids) & (nb != -1)).sum(axis=1)
    return pa.table({"qcell": cells.column("qcell"),
                     "n_pts": cells.column("n_pts"),
                     "n_nbrs": pa.array(n_nbrs.astype(np.int64),
                                        pa.int64())})


SQL_CELL_NEIGHBORS = """
with cells as (
  select least(((s_suppkey * 53) % 1000) // 32, 31) as cx,
         least((1024 - (s_suppkey * 97) % 1000) // 32, 31) as cy,
         count(*) as n_pts
  from supplier group by 1, 2)
select ((5::BIGINT << 52) | (a.cy << 26) | a.cx) as qcell,
       cast(a.n_pts as bigint) as n_pts,
       cast((select count(*) from cells b
             where abs(a.cx - b.cx) <= 1 and abs(a.cy - b.cy) <= 1
               and not (a.cx = b.cx and a.cy = b.cy)) as bigint) as n_nbrs
from cells a
"""


# --------------------------------------------------------------------------
# distributed PageRank (functions/graph.py -- the web-graph quality
# weighting role): irregular synthetic supplier graph, 4 power iterations,
# vs an unrolled chained-CTE oracle

_PR_ITERS = 4


def q_pagerank_suppliers(sf_dir: str):
    """PageRank over a deterministic irregular graph on the supplier
    keys (out-degree 1 + node % 3), via the BIT-EXACT integer-numerator
    path (:func:`balrog_ray.functions.graph.pagerank_exact`): ranks stay
    a distributed Dataset -- one edges x ranks hash join plus a
    teleport-seed-union ``groupby(node).sum`` per iteration -- and the
    fixed-point arithmetic makes the x1e9 rounded output identical to
    the oracle's HUGEINT evaluation at every scale (the float path can
    land exactly on a decimal rounding boundary: observed at sf0.1,
    where two of 1000 ranks are true half-integers at 1e-9 scale)."""
    from ..functions.graph import pagerank_exact

    n = pq.read_metadata(f"{sf_dir}/supplier.parquet").num_rows

    def edges(b: pa.Table) -> pa.Table:
        sk = b.column("s_suppkey").to_numpy()
        src_l, dst_l = [], []
        for j in (1, 2, 3):
            s = sk[(sk % 3) >= (j - 1)]
            src_l.append(s)
            dst_l.append((s * 7 + j * 13) % n)
        return pa.table({"src": pa.array(np.concatenate(src_l), pa.int64()),
                         "dst": pa.array(np.concatenate(dst_l),
                                         pa.int64())})

    from ..partitions import shuffle_width

    eds = (_read(sf_dir, "supplier", ["s_suppkey"])
           .map_batches(edges, batch_format="pyarrow"))
    # lo=2: per-iteration hash-shuffle actor startup dominates at graph
    # sizes this small, and the shared rule widens it on real graphs
    nums, denom = pagerank_exact(eds, n, iters=_PR_ITERS,
                                 num_partitions=shuffle_width(3 * n, lo=2))

    def fmt(b: pa.Table) -> pa.Table:
        # exact round-half-up of num/denom * 1e9 in unbounded ints (the
        # intermediate num * 1e9 exceeds int64; rows here are
        # node-cardinality-bounded output formatting)
        e9 = [int((2 * v * 10 ** 9 + denom) // (2 * denom))
              for v in b.column("num").to_pylist()]
        return pa.table({"node": b.column("node"),
                         "rank_e9": pa.array(e9, pa.int64())})

    return nums.map_batches(fmt, batch_format="pyarrow")


def _pagerank_sql(iters: int) -> str:
    """Integer-numerator oracle mirroring pagerank_exact: damping 17/20,
    degs {1,2,3} -> L = 6, per-iteration factor F = 120; HUGEINT keeps
    every value exact, and the final round-half-up runs in integer
    division, so the compare is bit-deterministic."""
    L, F, a, b = 6, 120, 17, 20
    steps = []
    for k in range(1, iters + 1):
        seed = (b - a) * L * F ** (k - 1)
        steps.append(f"""
r{k} as (
  select n2.node,
         {seed}::HUGEINT + coalesce((
           select sum(({a * L} // d.d) * r.num) from edges e
           join r{k - 1} r on r.node = e.src
           join deg d on d.src = e.src
           where e.dst = n2.node), 0) as num
  from nodes n2)""")
    return f"""
with nodes as (select s_suppkey as node from supplier),
nn as (select count(*) as n from supplier),
edges as (
  select node as src, (node * 7 + j * 13) % (select n from nn) as dst
  from nodes cross join (select unnest([1, 2, 3]) as j)
  where (node % 3) >= (j - 1)),
deg as (select src, count(*) as d from edges group by src),
r0 as (select node, 1::HUGEINT as num from nodes),""" \
        + ",".join(steps) + f"""
select node,
       cast((2 * num * 1000000000 + (select n from nn) * {F ** iters})
            // (2 * (select n from nn) * {F ** iters}) as bigint)
         as rank_e9
from r{iters}
"""


SQL_PAGERANK_SUPPLIERS = _pagerank_sql(_PR_ITERS)


# --------------------------------------------------------------------------
# time-series resample + forward fill: per-key regular grid (the sensor /
# metrics gap-fill role), SQL-checked against DuckDB's ASOF JOIN


def q_resample_events(sf_dir: str):
    """Per user, an hourly grid strictly after their first event through
    their last, each point carrying the latest value at-or-before it
    (forward fill).  ONE keyed fold; the per-user fill is a
    ``searchsorted`` against the (ts, event_id)-sorted events, so ties
    on ts resolve to the highest event_id -- the same rule the
    oracle's per-(user, ts) dedup enforces.  The fold loops over USER
    SEGMENTS (numpy per segment, output concatenated once), not rows
    -- grid sizes vary per user, so the grid build itself is the only
    per-group step.  Values pass through unchanged (selection, no
    arithmetic), so the compare is exact."""
    HOUR = 3_600 * 1_000_000

    from ..partitions import keyed_fold

    def fold(b: pa.Table) -> pa.Table:
        empty = pa.table({
            "user_id": pa.array([], pa.int64()),
            "grid_ts": pa.array([], pa.timestamp("us")),
            "value": pa.array([], pa.float64())})
        if b.num_rows == 0 or "user_id" not in b.column_names:
            return empty
        order = pc.sort_indices(b, sort_keys=[
            ("user_id", "ascending"), ("ts", "ascending"),
            ("event_id", "ascending")])
        g = b.take(order)
        uid = g.column("user_id").to_numpy()
        ts = (g.column("ts").to_numpy().astype("datetime64[us]")
              .astype(np.int64))
        val = g.column("value").to_numpy()
        bounds = np.r_[np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]]),
                       len(uid)]
        o_uid, o_ts, o_val = [], [], []
        for si in range(len(bounds) - 1):
            s, e = bounds[si], bounds[si + 1]
            t0, t1 = int(ts[s]), int(ts[e - 1])
            gs = (t0 // HOUR) * HOUR + HOUR     # strictly after t0
            if gs > t1:
                continue
            grid = np.arange(gs, t1 + 1, HOUR, dtype=np.int64)
            idx = np.searchsorted(ts[s:e], grid, side="right") - 1
            o_uid.append(np.full(len(grid), uid[s], np.int64))
            o_ts.append(grid)
            o_val.append(val[s + idx])
        if not o_uid:
            return empty
        return pa.table({
            "user_id": pa.array(np.concatenate(o_uid), pa.int64()),
            "grid_ts": pa.array(
                np.concatenate(o_ts).astype("datetime64[us]"),
                pa.timestamp("us")),
            "value": pa.array(np.concatenate(o_val), pa.float64())})

    return _keyed_scan(
        _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"]), "user_id", fold,
        sf_dir=sf_dir, table="events",
        num_partitions=_join_parts(sf_dir, "events"))


SQL_RESAMPLE_EVENTS = """
with e as (
  select user_id, ts, value from events
  qualify row_number() over (partition by user_id, ts
                             order by event_id desc) = 1),
b as (select user_id, min(ts) as t0, max(ts) as t1
      from events group by user_id),
g as (select user_id,
             unnest(generate_series(
               date_trunc('hour', t0) + interval 1 hour,
               t1, interval 1 hour)) as grid_ts
      from b)
select g.user_id, g.grid_ts, e.value
from g asof join e
  on e.user_id = g.user_id and e.ts <= g.grid_ts
"""


# --------------------------------------------------------------------------
# per-group winsorization: clip to [p05, p95] -- the outlier-clipping
# pass before model training, as a two-phase stat-then-map pipeline


def q_winsorize_prices(sf_dir: str):
    """Clip each order's price (exact cents) to its priority group's
    [p05, p95] discrete quantiles.  Phase 1 ships (group, value)->count
    partials (value-domain bounded); the tiny per-group bound table
    broadcasts by value into a stateless phase-2 clip map -- the input
    streams twice, nothing row-cardinality-sized moves or parks."""
    def to_cents(b: pa.Table) -> pa.Table:
        cents = np.rint(b.column("o_totalprice").to_numpy()
                        * 100.0).astype(np.int64)
        return pa.table({"pri": b.column("o_orderpriority"),
                         "cents": pa.array(cents, pa.int64())})

    src = (_read(sf_dir, "orders", ["o_orderkey", "o_orderpriority",
                                    "o_totalprice"]))
    vc = _partial_count_sums(
        src.map_batches(to_cents, batch_format="pyarrow"),
        ["pri", "cents"], {}, count_alias="vn")
    tab = _collect(vc)
    pris = np.asarray(tab.column("pri").to_pylist())
    vals = tab.column("cents").to_numpy()
    cnts = tab.column("vn").to_numpy()
    bounds = {}
    for p in sorted(set(pris.tolist())):
        sel = pris == p
        v, c = vals[sel], cnts[sel]
        order = np.argsort(v)
        v, c = v[order], c[order]
        cum = np.cumsum(c)
        n = int(cum[-1])
        lo = int(v[np.searchsorted(cum, int(np.ceil(0.05 * n)))])
        hi = int(v[np.searchsorted(cum, int(np.ceil(0.95 * n)))])
        bounds[p] = (lo, hi)

    def clip(b: pa.Table) -> pa.Table:
        pri = b.column("o_orderpriority").to_pylist()
        cents = np.rint(b.column("o_totalprice").to_numpy()
                        * 100.0).astype(np.int64)
        lo = np.fromiter((bounds[p][0] for p in pri), np.int64,
                         len(pri))
        hi = np.fromiter((bounds[p][1] for p in pri), np.int64,
                         len(pri))
        return pa.table({
            "o_orderkey": b.column("o_orderkey"),
            "clipped_cents": pa.array(np.clip(cents, lo, hi), pa.int64())})

    return src.map_batches(clip, batch_format="pyarrow")


SQL_WINSORIZE_PRICES = """
with c as (select o_orderkey, o_orderpriority,
                  cast(round(o_totalprice * 100) as bigint) as cents
           from orders),
q as (select o_orderpriority,
             quantile_disc(cents, 0.05) as lo,
             quantile_disc(cents, 0.95) as hi
      from c group by o_orderpriority)
select o_orderkey,
       cast(least(greatest(cents, lo), hi) as bigint) as clipped_cents
from c join q using (o_orderpriority)
"""


# --------------------------------------------------------------------------
# temperature / domain-mixture sampling: per-source 1/sqrt(count)
# downsampling (the corpus-mixing rule that flattens domain imbalance),
# deterministic via integer hash thresholds


def q_temperature_sample_docs(sf_dir: str):
    """Keep each document with probability ~ 1/sqrt(n_source): heavy
    sources are damped toward sqrt-proportional representation
    (temperature-2 mixing).  Phase 1 is a tiny per-source count;
    phase 2 is a stateless filter keeping rows whose Knuth-hash bucket
    falls under ``M // floor(sqrt(n_source))`` -- all-integer
    thresholds (IEEE sqrt of an int is correctly rounded, so the floor
    is bit-identical across engines), so the sample is exactly
    reproducible and SQL-checkable."""
    M = 1_000_000

    counts = _collect(
        _read(sf_dir, "documents", ["source"])
        .groupby("source")
        .aggregate(_agg().Count(alias_name="n")))
    thr = {s: M // int(np.floor(np.sqrt(float(n))))
           for s, n in zip(counts.column("source").to_pylist(),
                           counts.column("n").to_pylist())}

    def keep(b: pa.Table) -> pa.Table:
        did = b.column("doc_id").to_numpy()
        src = b.column("source").to_pylist()
        bucket = (did * 2654435761) % 2147483647 % M
        lim = np.fromiter((thr[s] for s in src), np.int64, len(src))
        m = bucket < lim
        return pa.table({
            "doc_id": pa.array(did[m], pa.int64()),
            "source": pa.array([s for s, k in zip(src, m) if k],
                               pa.string())})

    return (_read(sf_dir, "documents", ["doc_id", "source"])
            .map_batches(keep, batch_format="pyarrow"))


SQL_TEMPERATURE_SAMPLE_DOCS = """
with c as (select source,
                  1000000 // cast(floor(sqrt(count(*))) as bigint) as thr
           from documents group by source)
select d.doc_id, d.source
from documents d join c using (source)
where (d.doc_id * 2654435761) % 2147483647 % 1000000 < c.thr
"""


# --------------------------------------------------------------------------
# graph traversal: multi-source BFS hop distance over the deterministic
# supplier graph (crawl-frontier depth, the PageRank companion prior)

def _supplier_graph(sf_dir: str):
    """(edges Dataset, node count, shuffle width) for the deterministic
    irregular supplier graph shared by the graph-analytics queries:
    out-degree 1 + node % 3, dst = (node*7 + j*13) % n -- the same
    generator :func:`q_pagerank_suppliers` uses."""
    from ..partitions import shuffle_width

    n = pq.read_metadata(f"{sf_dir}/supplier.parquet").num_rows

    def edges(b: pa.Table) -> pa.Table:
        sk = b.column("s_suppkey").to_numpy()
        src_l, dst_l = [], []
        for j in (1, 2, 3):
            s = sk[(sk % 3) >= (j - 1)]
            src_l.append(s)
            dst_l.append((s * 7 + j * 13) % n)
        return pa.table({"src": pa.array(np.concatenate(src_l), pa.int64()),
                         "dst": pa.array(np.concatenate(dst_l),
                                         pa.int64())})

    eds = (_read(sf_dir, "supplier", ["s_suppkey"])
           .map_batches(edges, batch_format="pyarrow"))
    return eds, n, shuffle_width(3 * n, lo=2)


_BFS_HOPS = 6


def q_bfs_hops(sf_dir: str):
    """Hop distance from the seed set (node % 97 == 0) within
    ``_BFS_HOPS`` hops: frontier-only expansion
    (:func:`balrog_ray.functions.graph.bfs_levels`), one frontier x
    edges join + dedup + visited anti-join per hop; unreachable /
    too-deep nodes are absent, exactly as the oracle's per-level
    min-dist CTE chain drops them."""
    from ..functions.graph import bfs_levels

    eds, n, width = _supplier_graph(sf_dir)
    def pick_seeds(b: pa.Table) -> pa.Table:
        sk = b.column("s_suppkey").to_numpy()
        return pa.table({"node": pa.array(sk[sk % 97 == 0], pa.int64())})

    seeds = (_read(sf_dir, "supplier", ["s_suppkey"])
             .map_batches(pick_seeds, batch_format="pyarrow"))
    return bfs_levels(eds, seeds, max_hops=_BFS_HOPS,
                      num_partitions=width)


def _bfs_sql(hops: int) -> str:
    steps = []
    for k in range(1, hops + 1):
        steps.append(f"""
d{k} as (
  select node, min(dist) as dist from (
    select node, dist from d{k - 1}
    union all
    select e.dst as node, d.dist + 1 as dist
    from edges e join d{k - 1} d on d.node = e.src) t
  group by node)""")
    return """
with nodes as (select s_suppkey as node from supplier),
nn as (select count(*) as n from supplier),
edges as (
  select node as src, (node * 7 + j * 13) % (select n from nn) as dst
  from nodes cross join (select unnest([1, 2, 3]) as j)
  where (node % 3) >= (j - 1)),
d0 as (select node, 0 as dist from nodes where node % 97 = 0),""" \
        + ",".join(steps) + f"""
select node, cast(dist as bigint) as dist from d{hops}
"""


SQL_BFS_HOPS = _bfs_sql(_BFS_HOPS)


# --------------------------------------------------------------------------
# weighted shortest paths (link-distance / crawl-cost prior)

_SSSP_ROUNDS = 6


def q_graph_sssp(sf_dir: str):
    """Weighted multi-source shortest paths on the supplier graph with
    deterministic integer weights ``1 + (src*5 + dst*3) % 9``
    (:func:`balrog_ray.functions.graph.sssp`, frontier Bellman-Ford).
    Round k == the oracle's k-th min-fold CTE by the d_k invariant, so
    the capped-rounds tables match exactly, converged or not."""
    from ..functions.graph import sssp

    eds, _n, width = _supplier_graph(sf_dir)

    def weight(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy()
        d = b.column("dst").to_numpy()
        return b.append_column(
            "w", pa.array(1 + (s * 5 + d * 3) % 9, pa.int64()))

    def pick_seeds(b: pa.Table) -> pa.Table:
        sk = b.column("s_suppkey").to_numpy()
        return pa.table({"node": pa.array(sk[sk % 97 == 0], pa.int64())})

    seeds = (_read(sf_dir, "supplier", ["s_suppkey"])
             .map_batches(pick_seeds, batch_format="pyarrow"))
    return sssp(eds.map_batches(weight, batch_format="pyarrow"), seeds,
                rounds=_SSSP_ROUNDS, num_partitions=width)


def _sssp_sql(rounds: int) -> str:
    steps = []
    for k in range(1, rounds + 1):
        steps.append(f"""
d{k} as (
  select node, min(dist) as dist from (
    select node, dist from d{k - 1}
    union all
    select e.dst as node, d.dist + e.w as dist
    from wedges e join d{k - 1} d on d.node = e.src) t
  group by node)""")
    return """
with nodes as (select s_suppkey as node from supplier),
nn as (select count(*) as n from supplier),
edges as (
  select node as src, (node * 7 + j * 13) % (select n from nn) as dst
  from nodes cross join (select unnest([1, 2, 3]) as j)
  where (node % 3) >= (j - 1)),
wedges as (select src, dst, 1 + (src * 5 + dst * 3) % 9 as w from edges),
d0 as (select node, 0 as dist from nodes where node % 97 = 0),""" \
        + ",".join(steps) + f"""
select node, cast(dist as bigint) as dist from d{rounds}
"""


SQL_GRAPH_SSSP = _sssp_sql(_SSSP_ROUNDS)


# --------------------------------------------------------------------------
# exact triangle count (graph clustering / link-spam signal)

def q_triangle_count(sf_dir: str):
    """Exact triangles in the undirected supplier graph via
    degree-ordered wedge generation
    (:func:`balrog_ray.functions.graph.triangle_count`); the oracle is
    the canonical a<b<c three-way self-join."""
    from ..functions.graph import triangle_count

    eds, _n, width = _supplier_graph(sf_dir)
    cnt = triangle_count(eds, num_partitions=width)
    return pa.table({"n_triangles": pa.array([cnt], pa.int64())})


SQL_TRIANGLE_COUNT = """
with nodes as (select s_suppkey as node from supplier),
nn as (select count(*) as n from supplier),
raw as (
  select node as src, (node * 7 + j * 13) % (select n from nn) as dst
  from nodes cross join (select unnest([1, 2, 3]) as j)
  where (node % 3) >= (j - 1)),
und as (select distinct least(src, dst) as u, greatest(src, dst) as v
        from raw where src <> dst)
select count(*) as n_triangles
from und e1
join und e2 on e2.u = e1.u and e1.v < e2.v
join und e3 on e3.u = e1.v and e3.v = e2.v
"""


# --------------------------------------------------------------------------
# interval union length per key (gaps-and-islands; the session-coverage /
# uptime-merge role)

_IV_LEN_US = 1_800_000_000  # each event covers [ts, ts + 30 min)


def q_interval_coverage(sf_dir: str):
    """Merged-interval coverage per user: every event spans 30 min; the
    union length and merged-interval count are exact int64 microsecond
    arithmetic.  Fixed-length intervals sorted by start merge by the
    single rule ``s[i] <= s[i-1] + len`` (end order follows start
    order).  ONE keyed fold co-locates each user's events and the
    merge runs as a single vectorized diff over ALL user runs in the
    block (the high-cardinality groupby rule from
    partitions.keyed_fold)."""
    from ..partitions import keyed_fold

    def fold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "user_id" not in b.column_names:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "n_intervals": pa.array([], pa.int64()),
                "covered_us": pa.array([], pa.int64())})
        order = pc.sort_indices(b, sort_keys=[
            ("user_id", "ascending"), ("ts", "ascending"),
            ("event_id", "ascending")])
        g = b.take(order)
        uid = g.column("user_id").to_numpy()
        s = (g.column("ts").to_numpy().astype("datetime64[us]")
             .astype(np.int64))
        new_u = np.r_[True, uid[1:] != uid[:-1]]
        isl = new_u | np.r_[True, s[1:] > s[:-1] + _IV_LEN_US]
        i_starts = np.flatnonzero(isl)
        i_bounds = np.r_[i_starts, len(s)]
        lens = s[i_bounds[1:] - 1] - s[i_starts] + _IV_LEN_US
        u_of_isl = uid[i_starts]
        u_starts = np.flatnonzero(
            np.r_[True, u_of_isl[1:] != u_of_isl[:-1]])
        return pa.table({
            "user_id": pa.array(u_of_isl[u_starts], pa.int64()),
            "n_intervals": pa.array(
                np.diff(np.r_[u_starts, len(u_of_isl)]), pa.int64()),
            "covered_us": pa.array(
                np.add.reduceat(lens, u_starts), pa.int64())})

    return _keyed_scan(
        _read(sf_dir, "events", ["user_id", "ts", "event_id"]), "user_id", fold,
        sf_dir=sf_dir, table="events",
        num_partitions=_join_parts(sf_dir, "events"))


SQL_INTERVAL_COVERAGE = f"""
with b as (
  select user_id, event_id, epoch_us(ts) as s,
         case when epoch_us(ts) - lag(epoch_us(ts)) over w
                   > {_IV_LEN_US} then 1 else 0 end as brk
  from events
  window w as (partition by user_id order by epoch_us(ts), event_id)),
g as (
  select user_id, s,
         sum(brk) over (partition by user_id order by s, event_id
                        rows unbounded preceding) as island
  from b),
iv as (select user_id, island,
              max(s) - min(s) + {_IV_LEN_US} as len_us
       from g group by user_id, island)
select user_id, count(*) as n_intervals,
       cast(sum(len_us) as bigint) as covered_us
from iv group by user_id
"""


# --------------------------------------------------------------------------
# market-basket co-occurrence: brand pairs bought in the same order
# (the co-occurrence-statistics role; association mining shape)

def q_basket_brand_pairs(sf_dir: str):
    """Orders containing each unordered brand pair.  The brand domain is
    tiny (TPC-H: 25), so per-order brand SETS are int64 bitmasks: dedup
    (orderkey, brand-bit) with one groupby, OR the bits with a second
    ``groupby(orderkey).sum`` (exact -- bits are unique per order after
    the dedup), then a vectorized pair sweep over the mask column emits
    per-batch partial pair counts into a tiny final groupby.  The
    partkey -> brand-bit dimension attaches through the size-gated
    broadcast/hash path (``_attach_dim``); nothing order-, part- or
    lineitem-cardinality-sized reaches the driver."""
    # the brand DOMAIN is tiny (TPC-H: 25; asserted <= 62) and comes
    # from a distributed distinct; the SF-sized partkey->bit mapping
    # goes through the size-gated dim attach, never the driver
    brands = sorted(_read(sf_dir, "part", ["p_brand"]).unique("p_brand"))
    if len(brands) > 62:
        raise ValueError("brand domain exceeds the int64 bitmask")
    bnames = np.asarray(brands)

    def part_bits(t: pa.Table) -> pa.Table:
        idx = np.searchsorted(
            bnames, np.asarray(t.column("p_brand").to_pylist()))
        return pa.table({
            "p_partkey": t.column("p_partkey"),
            "bit": pa.array(np.int64(1) << idx.astype(np.int64),
                            pa.int64())})

    li = _attach_dim(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]),
        sf_dir, "part", fact_key="l_partkey", dim_key="p_partkey",
        columns=["p_partkey", "p_brand"], transform=part_bits,
        join_width=_join_parts(sf_dir, "lineitem"))

    def to_bits(b: pa.Table) -> pa.Table:
        ok = b.column("l_orderkey").to_numpy()
        bit = b.column("bit").to_numpy()
        # within-batch partial: OR-combine per order (associative, so
        # the single keyed fold below finishes it) -- cuts the one
        # exchange's volume to <= orders-per-batch rows
        order = np.argsort(ok, kind="stable")
        oks, bits = ok[order], bit[order]
        start = np.ones(len(oks), bool)
        start[1:] = oks[1:] != oks[:-1]
        starts = np.flatnonzero(start)
        return pa.table({
            "l_orderkey": pa.array(oks[starts], pa.int64()),
            "bit": pa.array(np.bitwise_or.reduceat(bits, starts)
                            if len(starts) else bits, pa.int64())})

    k = len(brands)

    def mask_pairs(b: pa.Table) -> pa.Table:
        # whole hash partition per call: complete order groups.  OR the
        # partial masks per order, then the k^2/2 vectorized pair sweep
        # emits per-block partial pair counts (<= k^2/2 rows).
        if b.num_rows == 0:
            return pa.table({"brand_a": pa.array([], pa.string()),
                             "brand_b": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        ok = b.column("l_orderkey").to_numpy()
        bit = b.column("bit").to_numpy()
        order = np.argsort(ok, kind="stable")
        oks, bits = ok[order], bit[order]
        start = np.ones(len(oks), bool)
        start[1:] = oks[1:] != oks[:-1]
        starts = np.flatnonzero(start)
        m = np.bitwise_or.reduceat(bits, starts)
        aa, bb, nn = [], [], []
        for i in range(k):
            mi = (m >> i) & 1
            for j in range(i + 1, k):
                c = int((mi & (m >> j)).sum())
                if c:
                    aa.append(brands[i])
                    bb.append(brands[j])
                    nn.append(c)
        return pa.table({"brand_a": pa.array(aa, pa.string()),
                         "brand_b": pa.array(bb, pa.string()),
                         "n": pa.array(nn, pa.int64())})

    from ..partitions import keyed_fold

    # ONE exchange (keyed fold by order), then the <= blocks * k^2/2
    # pair partials combine driver-side -- aggregate-sized, like the
    # other partial-fold scalar queries
    partials = _collect(keyed_fold(
        li.map_batches(to_bits, batch_format="pyarrow",
                       batch_size=65_536),
        ["l_orderkey"], mask_pairs,
        num_partitions=_join_parts(sf_dir, "lineitem")))
    if partials.num_rows == 0:
        return pa.table({"brand_a": pa.array([], pa.string()),
                         "brand_b": pa.array([], pa.string()),
                         "n_orders": pa.array([], pa.int64())})
    g = partials.group_by(["brand_a", "brand_b"]).aggregate([("n", "sum")])
    return pa.table({"brand_a": g.column("brand_a"),
                     "brand_b": g.column("brand_b"),
                     "n_orders": g.column("n_sum")})


SQL_BASKET_BRAND_PAIRS = """
with ob as (select distinct l_orderkey, p_brand
            from lineitem join part on p_partkey = l_partkey)
select a.p_brand as brand_a, b.p_brand as brand_b,
       count(*) as n_orders
from ob a join ob b
  on a.l_orderkey = b.l_orderkey and a.p_brand < b.p_brand
group by 1, 2
"""


# --------------------------------------------------------------------------
# ordered group concatenation (string_agg ... order by; the
# event-sequence-construction role for session modeling)

def q_status_string_agg(sf_dir: str):
    """Per customer: order statuses concatenated in (orderdate,
    orderkey) order -- a total order, so the string is deterministic.
    ONE keyed fold; the single-char statuses pack into one contiguous
    byte buffer (``np.array(dtype='S1').tobytes()`` preserves row
    order), so each customer's string is a buffer slice, not a
    per-row join."""
    from ..partitions import keyed_fold

    def fold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "o_custkey" not in b.column_names:
            return pa.table({"o_custkey": pa.array([], pa.int64()),
                             "status_seq": pa.array([], pa.string()),
                             "n_orders": pa.array([], pa.int64())})
        order = pc.sort_indices(b, sort_keys=[
            ("o_custkey", "ascending"), ("o_orderdate", "ascending"),
            ("o_orderkey", "ascending")])
        g = b.take(order)
        ck = g.column("o_custkey").to_numpy()
        sbytes = np.array(g.column("o_orderstatus").to_pylist(),
                          dtype="S1").tobytes()
        bounds = np.r_[np.flatnonzero(np.r_[True, ck[1:] != ck[:-1]]),
                       len(ck)]
        seqs = [sbytes[s:e].decode("ascii")
                for s, e in zip(bounds[:-1], bounds[1:])]
        return pa.table({
            "o_custkey": pa.array(ck[bounds[:-1]], pa.int64()),
            "status_seq": pa.array(seqs, pa.string()),
            "n_orders": pa.array(np.diff(bounds), pa.int64())})

    return _keyed_scan(
        _read(sf_dir, "orders",
              ["o_custkey", "o_orderkey", "o_orderdate",
               "o_orderstatus"]), "o_custkey", fold,
        sf_dir=sf_dir, table="orders",
        num_partitions=_join_parts(sf_dir, "orders"))


SQL_STATUS_STRING_AGG = """
select o_custkey,
       string_agg(o_orderstatus, '' order by o_orderdate, o_orderkey)
         as status_seq,
       count(*) as n_orders
from orders group by o_custkey
"""


# --------------------------------------------------------------------------
# token-language association lift (PMI's exact-rational core; the
# language-signature / keyword-extraction role)

_LIFT_MIN_COUNT = 50


def q_token_lift(sf_dir: str):
    """lift(token, lang) = N * c(t,l) / (c(t) * c(l)) as an EXACT
    round-half-up x1e6 integer (PMI = log(lift); the log is monotone, so
    ranking on lift_e6 is ranking on PMI without float hashing).  One
    explode + groupby builds c(t,l); c(t) derives from it by a second
    small groupby; c(l) and N are lang-cardinality-bounded broadcasts.
    The token-count attach is a token-keyed ``Dataset.join`` -- the
    at-scale path, no vocab broadcast.  The final x1e6 division runs in
    unbounded Python ints (2*N*c_tl*1e6 overflows int64 at corpus
    scale); the loop is output formatting on the aggregate-bounded
    result table, same as the PageRank formatter."""
    a = _agg()
    tok = _read(sf_dir, "documents", ["text", "lang"])

    def explode(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b.column("text"), " ")
        n_per = pc.list_value_length(toks).to_numpy().astype(np.int64)
        langs = np.repeat(b.column("lang").to_numpy(zero_copy_only=False),
                          n_per)
        return pa.table({"token": pc.list_flatten(toks),
                         "lang": pa.array(langs, pa.string())})

    tl = (tok.map_batches(explode, batch_format="pyarrow")
          .groupby(["token", "lang"])
          .aggregate(a.Count(alias_name="n_tl"))
          .materialize())
    t = (tl.groupby("token").aggregate(a.Sum("n_tl", alias_name="n_t")))
    lang_rows = (tl.groupby("lang")
                 .aggregate(a.Sum("n_tl", alias_name="n_l")).take_all())
    n_l = {r["lang"]: int(r["n_l"]) for r in lang_rows}
    N = sum(n_l.values())

    from ..partitions import shuffle_width

    kept = t.filter(expr=f"n_t >= {_LIFT_MIN_COUNT}").materialize()

    def fmt_with(nt_col: str):
        def fmt(b: pa.Table) -> pa.Table:
            lifts = []
            nls = [n_l[x] for x in b.column("lang").to_pylist()]
            for ntl, nt, nl in zip(b.column("n_tl").to_pylist(),
                                   b.column(nt_col).to_pylist(), nls):
                lifts.append((2 * N * ntl * 10 ** 6 + nt * nl)
                             // (2 * nt * nl))
            return pa.table({"token": b.column("token"),
                             "lang": b.column("lang"),
                             "n_tl": b.column("n_tl"),
                             "lift_e6": pa.array(lifts, pa.int64())})
        return fmt

    # the kept vocab is size-gated: under the bound its (token, n_t)
    # map rides ray.put into a semi-filter + attach inside map_batches
    # (no token-keyed join exchange); past it the Dataset.join owns it
    if kept.count() <= 4_000_000 and not _FORCE_DIM_JOIN:
        import ray as _ray

        tabs = [t_ for t_ in _ray.get(kept.to_arrow_refs())
                if t_.num_rows]
        vocab = {r["token"]: int(r["n_t"])
                 for t_ in tabs for r in t_.to_pylist()}
        vref = _ray.put(vocab)

        def attach_nt(b: pa.Table) -> pa.Table:
            import ray as _r

            v = _r.get(vref)
            toks = b.column("token").to_pylist()
            m = pa.array([x in v for x in toks])
            t2 = b.filter(m)
            nts = [v[x] for x in t2.column("token").to_pylist()]
            return t2.append_column("n_t", pa.array(nts, pa.int64()))

        return (tl.map_batches(attach_nt, batch_format="pyarrow")
                .map_batches(fmt_with("n_t"), batch_format="pyarrow"))

    joined = tl.join(kept, "inner",
                     num_partitions=shuffle_width(N, lo=2),
                     on=("token",))
    return joined.map_batches(fmt_with("n_t"), batch_format="pyarrow")


SQL_TOKEN_LIFT = f"""
with tok as (select unnest(string_split(text, ' ')) as token, lang
             from documents),
tl as (select token, lang, count(*) as n_tl from tok
       group by token, lang),
t as (select token, sum(n_tl) as n_t from tl group by token),
l as (select lang, sum(n_tl) as n_l from tl group by lang),
nn as (select sum(n_t) as n from t)
select tl.token, tl.lang, tl.n_tl,
       cast((2 * (select n from nn) * tl.n_tl * 1000000
             + t.n_t * l.n_l) // (2 * t.n_t * l.n_l) as bigint)
         as lift_e6
from tl join t using (token) join l using (lang)
where t.n_t >= {_LIFT_MIN_COUNT}
"""


# --------------------------------------------------------------------------
# grouped top-k with per-block partial pruning (the "best N per entity"
# serving shape; the partial prune is what survives web-scale groups)

_TOPK_PER_GROUP = 3


def q_topk_per_group(sf_dir: str):
    """Top ``_TOPK_PER_GROUP`` orders per customer by (price desc,
    orderkey asc) -- a total order, so ranks are deterministic.

    Scale shape: a per-BLOCK vectorized partial prune (lexsort + run
    boundaries) caps each block's contribution at k rows per group seen
    in that block BEFORE the shuffle, so the groupby ships at most
    k x blocks rows per group instead of the group's full history; the
    final per-group top-k then runs over tiny groups.  This is the
    combiner rule applied to an order statistic -- top-k is
    merge-decomposable even though rank itself is not."""
    k = _TOPK_PER_GROUP

    def partial(b: pa.Table) -> pa.Table:
        ck = b.column("o_custkey").to_numpy()
        ok = b.column("o_orderkey").to_numpy()
        cents = np.rint(b.column("o_totalprice").to_numpy() * 100.0) \
            .astype(np.int64)
        order = np.lexsort((ok, -cents, ck))
        ck_s = ck[order]
        # rank within each custkey run: position minus run start
        new_run = np.r_[True, ck_s[1:] != ck_s[:-1]]
        starts = np.flatnonzero(new_run)
        run_id = np.cumsum(new_run) - 1
        rank = np.arange(len(ck_s)) - starts[run_id]
        keep = order[rank < k]
        return pa.table({
            "o_custkey": pa.array(ck[keep], pa.int64()),
            "o_orderkey": pa.array(ok[keep], pa.int64()),
            "price_cents": pa.array(
                np.rint(b.column("o_totalprice").to_numpy()[keep]
                        * 100.0).astype(np.int64), pa.int64())})

    def fold(b: pa.Table) -> pa.Table:
        # final per-customer top-k over the pruned rows: one lexsort +
        # run-rank sweep across every complete group in the block
        if b.num_rows == 0 or "o_custkey" not in b.column_names:
            return pa.table({"o_custkey": pa.array([], pa.int64()),
                             "o_orderkey": pa.array([], pa.int64()),
                             "price_cents": pa.array([], pa.int64()),
                             "rk": pa.array([], pa.int64())})
        ck = b.column("o_custkey").to_numpy()
        ok = b.column("o_orderkey").to_numpy()
        cents = b.column("price_cents").to_numpy()
        order = np.lexsort((ok, -cents, ck))
        ck_s = ck[order]
        new_run = np.r_[True, ck_s[1:] != ck_s[:-1]]
        starts = np.flatnonzero(new_run)
        run_id = np.cumsum(new_run) - 1
        rank = np.arange(len(ck_s)) - starts[run_id]
        keep = rank < k
        sel = order[keep]
        return pa.table({
            "o_custkey": pa.array(ck[sel], pa.int64()),
            "o_orderkey": pa.array(ok[sel], pa.int64()),
            "price_cents": pa.array(cents[sel], pa.int64()),
            "rk": pa.array(rank[keep] + 1, pa.int64())})

    from ..partitions import keyed_fold

    return _keyed_scan(
        _read(sf_dir, "orders",
              ["o_custkey", "o_orderkey", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow"), "o_custkey", fold,
        sf_dir=sf_dir, table="orders",
        num_partitions=_join_parts(sf_dir, "orders"))


SQL_TOPK_PER_GROUP = f"""
select o_custkey, o_orderkey, price_cents, rk from (
  select o_custkey, o_orderkey,
         cast(round(o_totalprice * 100) as bigint) as price_cents,
         row_number() over (
           partition by o_custkey
           order by round(o_totalprice * 100) desc, o_orderkey) as rk
  from orders) t
where rk <= {_TOPK_PER_GROUP}
"""


# --------------------------------------------------------------------------
# CDC MERGE: apply a keyed changelog (upserts + deletes) to a base
# snapshot -- the lakehouse upsert / table-maintenance role

def q_merge_changelog(sf_dir: str):
    """Deterministic changelog from orders (op = delete when
    ``o_orderkey % 19 == 0`` else upsert-to-price), applied to the
    customer snapshot: the LATEST op per key in (o_orderdate,
    o_orderkey) order wins; deletes drop the key, upserts replace the
    balance, untouched keys keep the base value.

    One shuffle total: per-block partial latest-per-key prunes the
    changelog first (same run-boundary trick as top-k with k=1), then
    base rows (src 0) and pruned changelog rows (src 1) are union-tagged
    into a single keyed fold -- no join, no driver-side state.  Inside
    the fold the sort order (key, src, seq_d, seq_k) makes each key's
    LAST row the winner (changelog beats base, newest changelog beats
    older), so the whole merge is one lexsort + segment-tail sweep."""
    import ray.data

    def chlog(b: pa.Table) -> pa.Table:
        ck = b.column("o_custkey").to_numpy()
        ok = b.column("o_orderkey").to_numpy()
        od = b.column("o_orderdate").to_numpy().astype(
            "datetime64[D]").astype(np.int64)
        cents = np.rint(b.column("o_totalprice").to_numpy() * 100.0) \
            .astype(np.int64)
        # partial latest-per-key inside the block: keep the max
        # (orderdate, orderkey) row per custkey
        order = np.lexsort((-ok, -od, ck))
        ck_s = ck[order]
        first = np.r_[True, ck_s[1:] != ck_s[:-1]]
        keep = order[first]
        return pa.table({
            "key": pa.array(ck[keep], pa.int64()),
            "src": pa.array(np.ones(len(keep), np.int8), pa.int8()),
            "seq_d": pa.array(od[keep], pa.int64()),
            "seq_k": pa.array(ok[keep], pa.int64()),
            "is_del": pa.array(ok[keep] % 19 == 0, pa.bool_()),
            "bal_cents": pa.array(cents[keep], pa.int64())})

    def base_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "key": b.column("c_custkey"),
            "src": pa.array(np.zeros(n, np.int8), pa.int8()),
            "seq_d": pa.array(np.full(n, -1, np.int64), pa.int64()),
            "seq_k": pa.array(np.full(n, -1, np.int64), pa.int64()),
            "is_del": pa.array(np.zeros(n, bool), pa.bool_()),
            "bal_cents": pa.array(
                np.rint(b.column("c_acctbal").to_numpy() * 100.0)
                .astype(np.int64), pa.int64())})

    def fold(b: pa.Table) -> pa.Table:
        empty = pa.table({"c_custkey": pa.array([], pa.int64()),
                          "bal_cents": pa.array([], pa.int64())})
        if b.num_rows == 0 or "key" not in b.column_names:
            return empty
        key = b.column("key").to_numpy()
        src = b.column("src").to_numpy()
        d = b.column("seq_d").to_numpy()
        kk = b.column("seq_k").to_numpy()
        order = np.lexsort((kk, d, src, key))
        key_s, src_s = key[order], src[order]
        bounds = np.r_[np.flatnonzero(
            np.r_[True, key_s[1:] != key_s[:-1]]), len(key_s)]
        firsts, lasts = bounds[:-1], bounds[1:] - 1
        win = order[lasts]                  # newest changelog, else base
        has_base = src_s[firsts] == 0       # base sorts first in its key
        is_del = b.column("is_del").to_numpy(zero_copy_only=False)[win]
        # deletes drop the key; changelog keys absent from the base are
        # ignored (no insert source in this dataset)
        keep = np.where(src[win] == 1, has_base & ~is_del, has_base)
        win = win[keep]
        return pa.table({
            "c_custkey": pa.array(key[win], pa.int64()),
            "bal_cents": b.column("bal_cents").take(
                pa.array(win, pa.int64()))})

    from ..partitions import keyed_fold

    ch = (_read(sf_dir, "orders",
                ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"])
          .map_batches(chlog, batch_format="pyarrow"))
    base = (_read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
            .map_batches(base_rows, batch_format="pyarrow"))
    return _keyed_scan(base.union(ch), "key", fold,
        sf_dir=sf_dir, table="orders",
        num_partitions=_join_parts(sf_dir, "orders"), stat_col="o_custkey")


SQL_MERGE_CHANGELOG = """
with ch as (
  select o_custkey as key,
         o_orderkey % 19 = 0 as is_del,
         cast(round(o_totalprice * 100) as bigint) as bal,
         row_number() over (
           partition by o_custkey
           order by o_orderdate desc, o_orderkey desc) as rn
  from orders),
latest as (select key, is_del, bal from ch where rn = 1)
select c.c_custkey,
       cast(coalesce(l.bal, round(c.c_acctbal * 100)) as bigint)
         as bal_cents
from customer c left join latest l on l.key = c.c_custkey
where not coalesce(l.is_del, false)
"""


# --------------------------------------------------------------------------
# SCD2 validity intervals: change-point compression of a keyed event
# stream into [valid_from, valid_to) attribute history rows -- the
# dimension-history / temporal-table role

def q_scd2_intervals(sf_dir: str):
    """Per user: collapse the event_type stream into change intervals.
    Consecutive equal types merge; each surviving change opens an
    interval at its ts and closes at the NEXT change's ts (open-ended
    last interval = null).  (ts, event_id) is a total order, so the
    result is deterministic.  ONE keyed fold; the change-point compare
    runs user-boundary-masked over every complete run in the block."""
    from ..partitions import keyed_fold

    def fold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "user_id" not in b.column_names:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "valid_from_us": pa.array([], pa.int64()),
                "valid_to_us": pa.array([], pa.int64())})
        order = pc.sort_indices(b, sort_keys=[
            ("user_id", "ascending"), ("ts", "ascending"),
            ("event_id", "ascending")])
        g = b.take(order)
        uid = g.column("user_id").to_numpy()
        ts = (g.column("ts").to_numpy().astype("datetime64[us]")
              .astype(np.int64))
        et = g.column("event_type")
        neq = pc.not_equal(et.slice(1), et.slice(0, len(et) - 1)) \
            .to_numpy(zero_copy_only=False).astype(bool) \
            if len(et) > 1 else np.empty(0, bool)
        change = np.r_[True, (uid[1:] != uid[:-1]) | neq]
        idxs = np.flatnonzero(change)
        u_ch = uid[idxs]
        f = ts[idxs]
        nxt_same = np.r_[u_ch[1:] == u_ch[:-1], False]
        to = np.zeros(len(f), np.int64)
        to[:-1] = f[1:]
        return pa.table({
            "user_id": pa.array(u_ch, pa.int64()),
            "event_type": et.take(pa.array(idxs, pa.int64())),
            "valid_from_us": pa.array(f, pa.int64()),
            "valid_to_us": pa.array(to, pa.int64(),
                                    mask=~nxt_same)})   # null last

    return _keyed_scan(
        _read(sf_dir, "events", ["user_id", "event_id", "ts",
                                 "event_type"]), "user_id", fold,
        sf_dir=sf_dir, table="events",
        num_partitions=_join_parts(sf_dir, "events"))


SQL_SCD2_INTERVALS = """
with o as (
  select user_id, event_id, event_type, epoch_us(ts) as ts_us,
         lag(event_type) over (
           partition by user_id order by ts, event_id) as prev
  from events),
ch as (
  select user_id, event_id, event_type, ts_us
  from o where prev is null or event_type <> prev)
select user_id, event_type, ts_us as valid_from_us,
       lead(ts_us) over (
         partition by user_id order by ts_us, event_id) as valid_to_us
from ch
"""


# --------------------------------------------------------------------------
# event-transition matrix: consecutive-pair counts over per-key ordered
# streams (the Markov-prior / session-model shape)

def q_event_transitions(sf_dir: str):
    """(prev_type, next_type) counts over each user's (ts, event_id)
    ordered stream.  ONE keyed fold emits a PARTIAL pair-count table
    per block (bounded by type-domain squared, not events) with
    user-boundary pairs masked out, so the final groupby ships tiny
    aggregates."""
    from ..partitions import keyed_fold

    a = _agg()

    def fold(b: pa.Table) -> pa.Table:
        empty = pa.table({"prev_type": pa.array([], pa.string()),
                          "next_type": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if b.num_rows < 2 or "user_id" not in b.column_names:
            return empty
        order = pc.sort_indices(b, sort_keys=[
            ("user_id", "ascending"), ("ts", "ascending"),
            ("event_id", "ascending")])
        g = b.take(order)
        uid = g.column("user_id").to_numpy()
        et = np.asarray(g.column("event_type").to_pylist(),
                        dtype=object)
        vocab, codes = np.unique(et.astype(str), return_inverse=True)
        same = uid[1:] == uid[:-1]
        key = codes[:-1][same] * len(vocab) + codes[1:][same]
        if len(key) == 0:
            return empty
        u, c = np.unique(key, return_counts=True)
        return pa.table({
            "prev_type": pa.array(vocab[u // len(vocab)], pa.string()),
            "next_type": pa.array(vocab[u % len(vocab)], pa.string()),
            "n": pa.array(c.astype(np.int64), pa.int64())})

    return (_keyed_scan(
        _read(sf_dir, "events", ["user_id", "event_id", "ts",
                                 "event_type"]), "user_id", fold,
        sf_dir=sf_dir, table="events",
        num_partitions=_join_parts(sf_dir, "events"))
            .groupby(["prev_type", "next_type"])
            .aggregate(a.Sum("n", alias_name="n")))


SQL_EVENT_TRANSITIONS = """
with o as (
  select event_type,
         lead(event_type) over (
           partition by user_id order by ts, event_id) as nxt
  from events)
select event_type as prev_type, nxt as next_type, count(*) as n
from o where nxt is not null
group by 1, 2
"""


# --------------------------------------------------------------------------
# Per-group least-squares regression (regr_slope / regr_intercept role):
# price-on-quantity fit per l_returnflag from exact integer sufficient
# statistics.  The distributed fold ships 5 int64s per (block, group) --
# bit-deterministic under any scheduling; the only float ops are the two
# final IEEE divisions, mirrored operation-for-operation in the oracle.


def q_regr_by_flag(sf_dir: str):
    a = _agg()

    def partials(b: pa.Table) -> pa.Table:
        cols = ("n", "sx", "sy", "sxx", "sxy")
        if b.num_rows == 0:
            return pa.table({"l_returnflag": pa.array([], pa.string()),
                             **{c: pa.array([], pa.int64())
                                for c in cols}})
        f = np.asarray(b.column("l_returnflag").to_pylist(), dtype=object)
        x = np.rint(b.column("l_quantity").to_numpy()).astype(np.int64)
        y = np.rint(b.column("l_extendedprice").to_numpy()
                    * 100.0).astype(np.int64)
        keys, inv = np.unique(f.astype(str), return_inverse=True)

        def seg(v: np.ndarray) -> np.ndarray:
            acc = np.zeros(len(keys), np.int64)
            np.add.at(acc, inv, v)          # exact int64, no float fold
            return acc

        return pa.table({
            "l_returnflag": pa.array(keys, pa.string()),
            "n": pa.array(seg(np.ones(len(x), np.int64)), pa.int64()),
            "sx": pa.array(seg(x), pa.int64()),
            "sy": pa.array(seg(y), pa.int64()),
            "sxx": pa.array(seg(x * x), pa.int64()),
            "sxy": pa.array(seg(x * y), pa.int64())})

    def finish(b: pa.Table) -> pa.Table:
        flags, slopes, inters, ns = [], [], [], []
        for r in b.to_pylist():
            n, sx, sy = int(r["n"]), int(r["sx"]), int(r["sy"])
            sxx, sxy = int(r["sxx"]), int(r["sxy"])
            num, den = n * sxy - sx * sy, n * sxx - sx * sx
            slope = float(num) / float(den)
            inter = (float(sy) - slope * float(sx)) / float(n)
            flags.append(r["l_returnflag"])
            ns.append(n)
            slopes.append(round(slope, 6))
            inters.append(round(inter, 6))
        return pa.table({
            "l_returnflag": pa.array(flags, pa.string()),
            "n_rows": pa.array(ns, pa.int64()),
            "slope_cents": pa.array(slopes, pa.float64()),
            "intercept_cents": pa.array(inters, pa.float64())})

    return (_read(sf_dir, "lineitem",
                  ["l_returnflag", "l_quantity", "l_extendedprice"])
            .map_batches(partials, batch_format="pyarrow")
            .groupby("l_returnflag")
            .aggregate(a.Sum("n", alias_name="n"),
                       a.Sum("sx", alias_name="sx"),
                       a.Sum("sy", alias_name="sy"),
                       a.Sum("sxx", alias_name="sxx"),
                       a.Sum("sxy", alias_name="sxy"))
            .map_batches(finish, batch_format="pyarrow"))


SQL_REGR_BY_FLAG = """
with m as (
  select l_returnflag,
         cast(count(*) as hugeint) as n,
         cast(sum(cast(l_quantity as bigint)) as hugeint) as sx,
         cast(sum(cast(round(l_extendedprice * 100) as bigint))
              as hugeint) as sy,
         cast(sum(cast(l_quantity as bigint) * cast(l_quantity as bigint))
              as hugeint) as sxx,
         cast(sum(cast(l_quantity as bigint)
                  * cast(round(l_extendedprice * 100) as bigint))
              as hugeint) as sxy
  from lineitem group by l_returnflag)
select l_returnflag,
       cast(n as bigint) as n_rows,
       round(cast(n * sxy - sx * sy as double)
             / cast(n * sxx - sx * sx as double), 6) as slope_cents,
       round((cast(sy as double)
              - (cast(n * sxy - sx * sy as double)
                 / cast(n * sxx - sx * sx as double))
                * cast(sx as double)) / cast(n as double), 6)
           as intercept_cents
from m
"""


# --------------------------------------------------------------------------
# percent_rank / cume_dist window functions per user over the events
# stream.  High-cardinality partition key (one group per user), so
# per-group materialization is the scale-safe shape; both statistics are
# one small-integer IEEE division, bit-identical to the SQL builtins.


def q_pct_rank_events(sf_dir: str):
    """percent_rank / cume_dist per user: ONE keyed fold; rank-with-
    ties is a value-run sweep (first/last index of each equal-value
    run, rebased per user segment), vectorized over every complete
    user run in the block."""
    from ..partitions import keyed_fold

    def fold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "user_id" not in b.column_names:
            return pa.table({
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "pct_rank": pa.array([], pa.float64()),
                "cume": pa.array([], pa.float64())})
        order = pc.sort_indices(b, sort_keys=[
            ("user_id", "ascending"), ("value", "ascending"),
            ("event_id", "ascending")])
        g = b.take(order)
        uid = g.column("user_id").to_numpy()
        v = g.column("value").to_numpy()
        n_rows = len(v)
        new_seg = np.r_[True, uid[1:] != uid[:-1]]
        seg_starts = np.flatnonzero(new_seg)
        seg_n = np.diff(np.r_[seg_starts, n_rows])
        seg_start_of = np.repeat(seg_starts, seg_n)
        n_of = np.repeat(seg_n, seg_n).astype(np.float64)
        # equal-value runs within a segment
        new_run = np.r_[True, new_seg[1:] | (v[1:] != v[:-1])]
        run_starts = np.flatnonzero(new_run)
        run_n = np.diff(np.r_[run_starts, n_rows])
        run_first = np.repeat(run_starts, run_n)
        run_last = np.repeat(run_starts + run_n - 1, run_n)
        rank = run_first - seg_start_of + 1                # RANK w/ ties
        cume = (run_last - seg_start_of + 1) / n_of
        with np.errstate(invalid="ignore", divide="ignore"):
            pr = np.where(n_of > 1, (rank - 1) / (n_of - 1), 0.0)
        return pa.table({
            "event_id": g.column("event_id"),
            "user_id": g.column("user_id"),
            "pct_rank": pa.array(pr, pa.float64()),
            "cume": pa.array(cume, pa.float64())})

    return _keyed_scan(
        _read(sf_dir, "events", ["user_id", "event_id", "value"]), "user_id", fold,
        sf_dir=sf_dir, table="events",
        num_partitions=_join_parts(sf_dir, "events"))


SQL_PCT_RANK_EVENTS = """
select event_id, user_id,
       percent_rank() over (partition by user_id order by value)
           as pct_rank,
       cume_dist() over (partition by user_id order by value) as cume
from events
"""


# --------------------------------------------------------------------------
# Deterministic epoch shuffle for training-data sharding: every doc gets
# a pseudo-random position inside a pseudo-random shard, reproducible
# across runs and engines (the global-shuffle-without-random_shuffle
# shape: ONE hash-keyed groupby instead of a full random all-to-all; a
# new epoch/seed just changes the multiplier-XOR constant).


def q_epoch_shuffle(sf_dir: str):
    def keyed(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        h = ((ids ^ 40503) * 2654435761) % 2147483647
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "h": pa.array(h, pa.int64()),
                         "shard": pa.array(h % 8, pa.int64())})

    def number(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[
            ("h", "ascending"), ("doc_id", "ascending")])
        g = group.take(order)
        return pa.table({
            "doc_id": g.column("doc_id"),
            "shard": g.column("shard"),
            "pos": pa.array(np.arange(1, g.num_rows + 1), pa.int64())})

    return (_read(sf_dir, "documents", ["doc_id"])
            .map_batches(keyed, batch_format="pyarrow")
            .groupby("shard")
            .map_groups(number, batch_format="pyarrow"))


SQL_EPOCH_SHUFFLE = """
with k as (
  select doc_id,
         (xor(doc_id, 40503) * 2654435761) % 2147483647 as h
  from documents)
select doc_id, h % 8 as shard,
       row_number() over (partition by h % 8 order by h, doc_id) as pos
from k
"""


# --------------------------------------------------------------------------
# Deterministic training-mix downsampling: every source is hash-admitted
# down to the rarest source's row count (the equal-proportion data-mix
# recipe), with the admission threshold in EXACT integer arithmetic so
# engine and oracle agree row-for-row.  Two tiny shuffles: one count
# groupby to size the rates (5-row table, broadcast in the closure), one
# count groupby over the admitted rows.


def q_mix_sources(sf_dir: str):
    a = _agg()
    docs = _read(sf_dir, "documents", ["doc_id", "source"])
    counts = {r["source"]: r["n"] for r in
              docs.groupby("source")
              .aggregate(a.Count(alias_name="n")).take_all()}
    lo = min(counts.values())
    d = 1 << 20
    thr = {s: (d * lo) // n for s, n in counts.items()}

    def admit(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        src = np.asarray(b.column("source").to_pylist(), dtype=object)
        h = ((ids * 2654435761) % 2147483647) % d
        t = np.array([thr[s] for s in src], np.int64)
        return b.take(pa.array(np.flatnonzero(h < t)))

    return (docs.map_batches(admit, batch_format="pyarrow")
            .groupby("source")
            .aggregate(a.Count(alias_name="n_admitted")))


SQL_MIX_SOURCES = """
with c as (
  select source, count(*) as n from documents group by source),
t as (
  select source,
         ((1 << 20) * (select min(n) from c)) // n as thr
  from c)
select d.source, count(*) as n_admitted
from documents d join t on d.source = t.source
where ((d.doc_id * 2654435761) % 2147483647) % (1 << 20) < t.thr
group by d.source
"""


# --------------------------------------------------------------------------
# Window-over-aggregate composition: per (month, status) order counts
# plus each status's share of its month -- the aggregate feeds a second
# grouped pass over MONTH-sized rows (tiny), so the expensive shuffle
# happens once on the raw table and the window runs on aggregates.


def q_share_of_month(sf_dir: str):
    a = _agg()

    def month_status(b: pa.Table) -> pa.Table:
        d = b.column("o_orderdate").cast(pa.date32()).to_pylist()
        return pa.table({
            "month": pa.array([f"{x.year:04d}-{x.month:02d}"
                               for x in d], pa.string()),
            "o_orderstatus": b.column("o_orderstatus")})

    counts = (_read(sf_dir, "orders", ["o_orderdate", "o_orderstatus"])
              .map_batches(month_status, batch_format="pyarrow")
              .groupby(["month", "o_orderstatus"])
              .aggregate(a.Count(alias_name="n")))

    def share(group: pa.Table) -> pa.Table:
        n = group.column("n").to_numpy()
        tot = int(n.sum())
        return pa.table({
            "month": group.column("month"),
            "o_orderstatus": group.column("o_orderstatus"),
            "n": group.column("n"),
            "share": pa.array(n.astype(np.float64) / float(tot),
                              pa.float64())})

    return counts.groupby("month").map_groups(share,
                                              batch_format="pyarrow")


SQL_SHARE_OF_MONTH = """
with c as (
  select strftime(o_orderdate, '%Y-%m') as month, o_orderstatus,
         count(*) as n
  from orders group by 1, 2)
select month, o_orderstatus, n,
       cast(n as double)
           / cast(sum(n) over (partition by month) as double) as share
from c
"""


# --------------------------------------------------------------------------
# BM25 lexical retrieval (Robertson idf, k1=1.2, b=0.75): per-(doc,
# query-term) scores for a fixed 3-term query, global top-10.  Scores
# stay PER TERM (no cross-term float sum whose order could differ), so
# engine and oracle compute the identical float64 op chain from exact
# integer tf/df/dl statistics.  One tiny stats pass (2 ints), one
# term-filtered df groupby (3 rows), one stateless scoring pass.

_BM25_TERMS = ("hash", "merge", "window")


def q_bm25_docs(sf_dir: str):
    import math

    import ray

    a = _agg()
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def corpus_stats(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b.column("text"), " ")
        return pa.table({
            "n_docs": pa.array([b.num_rows], pa.int64()),
            "n_words": pa.array(
                [int(pc.sum(pc.list_value_length(toks)).as_py() or 0)],
                pa.int64())})

    stats = (docs.map_batches(corpus_stats, batch_format="pyarrow")
             .aggregate(a.Sum("n_docs", alias_name="n"),
                        a.Sum("n_words", alias_name="w")))
    n, w = int(stats["n"]), int(stats["w"])
    avgdl = float(w) / float(n)

    def df_partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b.column("text"), " ").to_pylist()
        cnt = {t: 0 for t in _BM25_TERMS}
        for lst in toks:
            s = set(lst)
            for t in _BM25_TERMS:
                if t in s:
                    cnt[t] += 1
        ks = sorted(cnt)
        return pa.table({"token": pa.array(ks, pa.string()),
                         "df": pa.array([cnt[k] for k in ks],
                                        pa.int64())})

    df_rows = (docs.map_batches(df_partial, batch_format="pyarrow")
               .groupby("token").aggregate(a.Sum("df", alias_name="df"))
               .take_all())
    idf = {r["token"]: math.log(
        (n - int(r["df"]) + 0.5) / (int(r["df"]) + 0.5) + 1.0)
        for r in df_rows}
    idf_ref = ray.put(idf)

    def score(b: pa.Table) -> pa.Table:
        k1, bb = 1.2, 0.75
        idf_m: dict = ray.get(idf_ref)
        ids, toks_out, scores = [], [], []
        toks = pc.split_pattern(b.column("text"), " ").to_pylist()
        for did, lst in zip(b.column("doc_id").to_pylist(), toks):
            dl = len(lst)
            for t in _BM25_TERMS:
                tf = lst.count(t)
                if tf == 0:
                    continue
                denom = tf + k1 * (1.0 - bb + bb * dl / avgdl)
                s = idf_m[t] * (tf * (k1 + 1.0)) / denom
                ids.append(did)
                toks_out.append(t)
                scores.append(round(s, 6))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "token": pa.array(toks_out, pa.string()),
                         "bm25": pa.array(scores, pa.float64())})

    return (docs.map_batches(score, batch_format="pyarrow")
            .sort(["bm25", "doc_id", "token"],
                  descending=[True, False, False])
            .limit(10))


SQL_BM25_DOCS = """
with tok as (
  select doc_id, unnest(string_split(text, ' ')) as token from documents
),
dl as (select doc_id, count(*) as dl from tok group by 1),
stats as (
  select (select count(*) from documents) as n,
         (select count(*) from tok) as w),
df as (
  select token, count(distinct doc_id) as df from tok
  where token in ('hash', 'merge', 'window') group by 1),
tf as (
  select doc_id, token, count(*) as tf from tok
  where token in ('hash', 'merge', 'window') group by 1, 2),
scored as (
  select tf.doc_id, tf.token,
         round(
           ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1)
           * (tf.tf * (1.2 + 1.0))
           / (tf.tf + 1.2 * (1.0 - 0.75
                             + 0.75 * dl.dl
                               / (cast(stats.w as double)
                                  / cast(stats.n as double)))),
           6) as bm25
  from tf join df using (token) join dl using (doc_id)
  cross join stats)
select doc_id, token, bm25 from scored
order by bm25 desc, doc_id, token limit 10
"""


#: name -> (ray_fn, oracle_sql or None)
# --------------------------------------------------------------------------
# gaps-and-islands: consecutive-activity runs per customer (the classic
# sessionize-on-dates window composition; deduped to distinct days so the
# island assignment is tie-free and deterministic)

def q_gaps_islands(sf_dir: str):
    """Per customer: split the customer's DISTINCT order days into
    islands broken by gaps > 7 days; report island count, the largest
    island's distinct-day count and its day span (all exact ints).
    ONE keyed fold, with dedup / island split / per-customer maxima all
    vectorized across every complete customer run in the block (the
    high-cardinality groupby rule from partitions.keyed_fold)."""
    US_DAY = 86_400_000_000

    from ..partitions import keyed_fold

    def fold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "o_custkey" not in b.column_names:
            return pa.table({
                "o_custkey": pa.array([], pa.int64()),
                "n_islands": pa.array([], pa.int64()),
                "max_island_days": pa.array([], pa.int64()),
                "max_span_days": pa.array([], pa.int64())})
        ck = b.column("o_custkey").to_numpy()
        day = (b.column("o_orderdate").cast(pa.int64()).to_numpy()
               // US_DAY)
        order = np.lexsort((day, ck))
        ck, day = ck[order], day[order]
        keep = np.r_[True, (ck[1:] != ck[:-1]) | (day[1:] != day[:-1])]
        ck, day = ck[keep], day[keep]           # distinct (cust, day)
        new_c = np.r_[True, ck[1:] != ck[:-1]]
        isl = new_c | np.r_[True, (day[1:] - day[:-1]) > 7]
        i_starts = np.flatnonzero(isl)
        i_bounds = np.r_[i_starts, len(day)]
        sizes = np.diff(i_bounds)
        spans = day[i_bounds[1:] - 1] - day[i_starts]
        c_of_isl = ck[i_starts]
        c_starts = np.flatnonzero(
            np.r_[True, c_of_isl[1:] != c_of_isl[:-1]])
        return pa.table({
            "o_custkey": pa.array(c_of_isl[c_starts], pa.int64()),
            "n_islands": pa.array(
                np.diff(np.r_[c_starts, len(c_of_isl)]), pa.int64()),
            "max_island_days": pa.array(
                np.maximum.reduceat(sizes, c_starts), pa.int64()),
            "max_span_days": pa.array(
                np.maximum.reduceat(spans, c_starts), pa.int64())})

    return _keyed_scan(
        _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]), "o_custkey", fold,
        sf_dir=sf_dir, table="orders",
        num_partitions=_join_parts(sf_dir, "orders"))


SQL_GAPS_ISLANDS = """
with d as (
  select distinct o_custkey,
         datediff('day', TIMESTAMP '1970-01-01', o_orderdate) as day
  from orders),
s as (
  select o_custkey, day,
         case when day - lag(day) over (partition by o_custkey
                                        order by day) > 7
              then 1 else 0 end as brk
  from d),
i as (
  select o_custkey, day,
         sum(brk) over (partition by o_custkey order by day
                        rows unbounded preceding) as isl
  from s),
g as (
  select o_custkey, isl, count(*) as n_days,
         max(day) - min(day) as span
  from i group by o_custkey, isl)
select o_custkey,
       count(*) as n_islands,
       max(n_days) as max_island_days,
       max(span) as max_span_days
from g group by o_custkey
"""


# --------------------------------------------------------------------------
# per-group z-score standardization: exact integer sufficient statistics
# per user (one groupby), per-user denominator finished driver-free, then
# a distributed hash join back onto the event rows -- the scale shape for
# any per-row standardization / anomaly score

def q_zscore_anomalies(sf_dir: str):
    ev = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def vc(b: pa.Table) -> pa.Table:
        v = np.rint(b.column("value").to_numpy() * 100.0).astype(np.int64)
        return pa.table({"event_id": b.column("event_id"),
                         "user_id": b.column("user_id"),
                         "vcent": pa.array(v, pa.int64())})

    v = ev.map_batches(vc, batch_format="pyarrow")

    def partials(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64()),
                             "q": pa.array([], pa.int64())})
        u = b.column("user_id").to_numpy()
        x = b.column("vcent").to_numpy()
        keys, inv = np.unique(u, return_inverse=True)

        def seg(vals):
            acc = np.zeros(len(keys), np.int64)
            np.add.at(acc, inv, vals)
            return acc

        return pa.table({"user_id": pa.array(keys, pa.int64()),
                         "n": pa.array(seg(np.ones(len(x), np.int64)),
                                       pa.int64()),
                         "s": pa.array(seg(x), pa.int64()),
                         "q": pa.array(seg(x * x), pa.int64())})

    a = _agg()
    stats = (v.map_batches(partials, batch_format="pyarrow")
             .groupby("user_id")
             .aggregate(a.Sum("n", alias_name="n"),
                        a.Sum("s", alias_name="s"),
                        a.Sum("q", alias_name="q")))

    def mkden(b: pa.Table) -> pa.Table:
        # exact n*q - s*s, float only at the sqrt -- identical to the
        # oracle's hugeint-then-double.  Vectorized int64 when the
        # products provably fit (the common case by orders of
        # magnitude); the exact Python-int loop only for blocks whose
        # extremes could overflow
        n = b.column("n").to_numpy()
        s = b.column("s").to_numpy()
        q = b.column("q").to_numpy()
        lim = 1 << 62
        if (len(n) == 0 or (int(n.max()) * int(q.max()) < lim
                            and int(np.abs(s).max()) ** 2 < lim)):
            den = np.sqrt((n * q - s * s).astype(np.float64))
        else:
            den = np.array([float(int(ni) * int(qi) - int(si) * int(si))
                            ** 0.5 for ni, si, qi in
                            zip(n.tolist(), s.tolist(), q.tolist())])
        return pa.table({"user_id": b.column("user_id"),
                         "n": b.column("n"), "s": b.column("s"),
                         "den": pa.array(den, pa.float64())})

    stats = stats.map_batches(mkden, batch_format="pyarrow")

    # the per-user stat table is user-cardinality-bounded; under the
    # dim gate (footer min/max user domain, metadata-only) it rides
    # ray.put into a searchsorted lookup instead of a second hash-join
    # exchange; past the gate the distributed join owns it
    n_users = _key_domain(sf_dir, "events", "user_id")
    if n_users <= _DIM_BROADCAST_MAX_ROWS and not _FORCE_DIM_JOIN:
        import ray as _ray

        tabs = [t for t in _ray.get(
            stats.materialize().to_arrow_refs()) if t.num_rows]
        if not tabs:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "user_id": pa.array([], pa.int64()),
                             "zscore": pa.array([], pa.float64())})
        st = pa.concat_tables(tabs)
        uid = st.column("user_id").to_numpy()
        order = np.argsort(uid, kind="stable")
        stat_ref = _ray.put((
            uid[order],
            st.column("n").to_numpy().astype(np.float64)[order],
            st.column("s").to_numpy().astype(np.float64)[order],
            st.column("den").to_numpy()[order]))

        def finish_bcast(b: pa.Table) -> pa.Table:
            import ray as _r

            k, nv, sv, dv = _r.get(stat_ref)
            u = b.column("user_id").to_numpy()
            pos = np.searchsorted(k, u)     # every user has stats
            x = b.column("vcent").to_numpy().astype(np.float64)
            den = dv[pos]
            with np.errstate(invalid="ignore", divide="ignore"):
                z = np.where(den > 0,
                             np.round((nv[pos] * x - sv[pos]) / den, 6),
                             0.0)
            return pa.table({"event_id": b.column("event_id"),
                             "user_id": b.column("user_id"),
                             "zscore": pa.array(z, pa.float64())})

        return v.map_batches(finish_bcast, batch_format="pyarrow")

    joined = v.join(
        stats.repartition(max(2, _join_parts(sf_dir, "events") // 4)),
        "inner", num_partitions=_join_parts(sf_dir, "events"),
        on=("user_id",))

    def finish(b: pa.Table) -> pa.Table:
        n = b.column("n").to_numpy().astype(np.float64)
        s = b.column("s").to_numpy().astype(np.float64)
        den = b.column("den").to_numpy()
        x = b.column("vcent").to_numpy().astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            z = np.where(den > 0, np.round((n * x - s) / den, 6), 0.0)
        return pa.table({"event_id": b.column("event_id"),
                         "user_id": b.column("user_id"),
                         "zscore": pa.array(z, pa.float64())})

    return joined.map_batches(finish, batch_format="pyarrow")


SQL_ZSCORE_ANOMALIES = """
with v as (
  select event_id, user_id, cast(round(value * 100) as bigint) as vc
  from events),
m as (
  select user_id, cast(count(*) as hugeint) as n,
         cast(sum(vc) as hugeint) as s,
         sum(cast(vc as hugeint) * vc) as q
  from v group by user_id)
select v.event_id, v.user_id,
       case when m.n * m.q - m.s * m.s <= 0 then 0.0
            else round(cast(m.n * v.vc - m.s as double)
                       / sqrt(cast(m.n * m.q - m.s * m.s as double)), 6)
       end as zscore
from v join m using (user_id)
"""


# --------------------------------------------------------------------------
# Spearman rank correlation, exact: both columns are low-cardinality, so
# the joint value-count table (<= |q| x |d| cells) carries ALL the rank
# information -- doubled average ranks stay integers, every moment is an
# exact Python-int fold over the tiny cell table

def q_spearman_qty_discount(sf_dir: str):
    vc = _partial_count_sums(
        _read(sf_dir, "lineitem", ["l_quantity", "l_discount"])
        .map_batches(lambda b: pa.table({
            "q": pa.array(np.rint(b.column("l_quantity").to_numpy())
                          .astype(np.int64), pa.int64()),
            "d": pa.array(np.rint(b.column("l_discount").to_numpy()
                                  * 100.0).astype(np.int64), pa.int64())}),
            batch_format="pyarrow"),
        ["q", "d"], {}, count_alias="cnt")
    tab = _collect(vc)
    qv = tab.column("q").to_numpy()
    dv = tab.column("d").to_numpy()
    cnt = tab.column("cnt").to_numpy().astype(np.int64)

    def doubled_ranks(vals):
        """value -> 2 * average rank (exact int), from marginal counts."""
        u = np.unique(vals)
        marg = {int(x): 0 for x in u}
        for x, c in zip(vals, cnt):
            marg[int(x)] += int(c)
        r2, cum = {}, 0
        for x in sorted(marg):
            r2[x] = 2 * cum + marg[x] + 1      # 2*(cum + (m+1)/2)
            cum += marg[x]
        return r2

    r2q = doubled_ranks(qv)
    r2d = doubled_ranks(dv)
    n = sx = sy = sxx = syy = sxy = 0
    for x, y, c in zip(qv, dv, cnt):
        X, Y, c = r2q[int(x)], r2d[int(y)], int(c)
        n += c
        sx += c * X
        sy += c * Y
        sxx += c * X * X
        syy += c * Y * Y
        sxy += c * X * Y
    num = n * sxy - sx * sy
    den = (float(n * sxx - sx * sx) ** 0.5
           * float(n * syy - sy * sy) ** 0.5)
    rho = round(float(num) / den, 6) if den > 0 else 0.0
    return pa.table({"n_rows": pa.array([n], pa.int64()),
                     "spearman_rho": pa.array([rho], pa.float64())})


SQL_SPEARMAN_QTY_DISCOUNT = """
with r as (
  select cast(l_quantity as bigint) as q,
         cast(round(l_discount * 100) as bigint) as d
  from lineitem),
rk as (
  select cast(2 * rank() over (order by q)
              + count(*) over (partition by q) - 1 as hugeint) as x2,
         cast(2 * rank() over (order by d)
              + count(*) over (partition by d) - 1 as hugeint) as y2
  from r),
m as (
  select cast(count(*) as hugeint) as n, sum(x2) as sx, sum(y2) as sy,
         sum(x2 * x2) as sxx, sum(y2 * y2) as syy, sum(x2 * y2) as sxy
  from rk)
select cast(n as bigint) as n_rows,
       round(cast(n * sxy - sx * sy as double)
             / (sqrt(cast(n * sxx - sx * sx as double))
                * sqrt(cast(n * syy - sy * sy as double))), 6)
           as spearman_rho
from m
"""


# --------------------------------------------------------------------------
# skyline (Pareto frontier): maximize (price, recency) over a date-
# filtered slice.  Per-block partial frontier (closed under union) then
# one final pass -- no all-pairs stage anywhere; the predicate is pushed
# into the parquet scan

def _skyline_mask(p: np.ndarray, d: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of the maximize-both skyline; equal points all
    survive (they don't strictly dominate each other)."""
    order = np.lexsort((-d, -p))            # p desc, then d desc
    p2, d2 = p[order], d[order]
    new = np.r_[True, p2[1:] != p2[:-1]]
    gid = np.cumsum(new) - 1
    gmax = d2[new]                           # per-p max d (d desc in group)
    run = np.maximum.accumulate(gmax)
    bh = np.r_[np.int64(np.iinfo(np.int64).min), run[:-1]]
    keepg = gmax > bh
    keep_sorted = keepg[gid] & (d2 == gmax[gid])
    keep = np.zeros(len(p), bool)
    keep[order[keep_sorted]] = True
    return keep


def q_skyline_orders(sf_dir: str):
    from datetime import datetime

    lo = pa.scalar(datetime(1996, 1, 1), pa.timestamp("us"))
    hi = pa.scalar(datetime(1996, 7, 1), pa.timestamp("us"))
    flt = ((pc.field("o_orderdate") >= lo)
           & (pc.field("o_orderdate") < hi))
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice",
                                  "o_orderdate"], row_filter=flt)
    US_DAY = 86_400_000_000

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"o_orderkey": pa.array([], pa.int64()),
                          "price_cents": pa.array([], pa.int64()),
                          "day": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        p = np.rint(b.column("o_totalprice").to_numpy() * 100.0
                    ).astype(np.int64)
        d = b.column("o_orderdate").cast(pa.int64()).to_numpy() // US_DAY
        keep = _skyline_mask(p, d)
        return pa.table({
            "o_orderkey": pa.array(
                b.column("o_orderkey").to_numpy()[keep], pa.int64()),
            "price_cents": pa.array(p[keep], pa.int64()),
            "day": pa.array(d[keep], pa.int64())})

    def final(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        keep = _skyline_mask(b.column("price_cents").to_numpy(),
                             b.column("day").to_numpy())
        return b.filter(pa.array(keep))

    return (ds.map_batches(partial, batch_format="pyarrow")
            .repartition(1)
            .map_batches(final, batch_format="pyarrow",
                         batch_size=None))


SQL_SKYLINE_ORDERS = """
with o as (
  select o_orderkey,
         cast(round(o_totalprice * 100) as bigint) as p,
         datediff('day', TIMESTAMP '1970-01-01', o_orderdate) as d
  from orders
  where o_orderdate >= TIMESTAMP '1996-01-01'
    and o_orderdate < TIMESTAMP '1996-07-01'),
pd as (select p, max(d) as dmax from o group by p),
run as (
  select p, dmax,
         coalesce(max(dmax) over (order by p desc
                                  rows between unbounded preceding
                                  and 1 preceding), -9223372036854775808)
             as best_higher
  from pd)
select o.o_orderkey, o.p as price_cents, o.d as day
from o join run on o.p = run.p
where o.d = run.dmax and run.dmax > run.best_higher
"""


def q_hexbin_customers(sf_dir: str):
    """Hexbin aggregation on the H3-analogue axial grid
    (geo/hexgrid.py): key-derived points -> pointy-top hex cell ids ->
    per-cell counts.  The oracle replays the identical IEEE expression
    tree (HEX_OF_SQL), so cube rounding matches bit-exactly."""
    from ..geo.hexgrid import hex_of

    def assign(b: pa.Table) -> pa.Table:
        ck = b.column("c_custkey").to_numpy()
        x = ((ck * 53) % 1200).astype(np.float64)
        y = ((ck * 29) % 1200).astype(np.float64)
        hq, hr = hex_of(x, y, 45.0)
        return pa.table({"hq": pa.array(hq, pa.int64()),
                         "hr": pa.array(hr, pa.int64())})

    a = _agg()
    return (_read(sf_dir, "customer", ["c_custkey"])
            .map_batches(assign, batch_format="pyarrow")
            .groupby(["hq", "hr"])
            .aggregate(a.Count(alias_name="n")))


def _hexbin_sql() -> str:
    from ..geo.hexgrid import HEX_OF_SQL

    return (HEX_OF_SQL.format(src="customer", pk="c_custkey",
                              x="(c_custkey * 53) % 1200",
                              y="(c_custkey * 29) % 1200",
                              size="45.0")
            + "\nselect hq, hr, count(*) as n from hexed group by 1, 2")


SQL_HEXBIN_CUSTOMERS = _hexbin_sql()


def q_kernel_density(sf_dir: str):
    """Quartic kernel-density heat map over a 40 m cell grid, radius
    100 (stages/gridding.kernel_density_cells): key-derived integer
    points -> vectorized local stamp -> ONE groupby(cell).sum.  The
    integer numerator ``sum((R^2 - d2)^2)`` makes the fold bit-exact,
    so the oracle replays it with a cells-x-points join."""
    from ..stages.gridding import kernel_density_cells

    def coords(b: pa.Table) -> pa.Table:
        ck = b.column("c_custkey").to_numpy()
        return pa.table({"x": pa.array((ck * 53) % 1200, pa.int64()),
                         "y": pa.array((ck * 29) % 1200, pa.int64())})

    pts = (_read(sf_dir, "customer", ["c_custkey"])
           .map_batches(coords, batch_format="pyarrow"))
    return kernel_density_cells(pts, cell_size=40, radius=100)


SQL_KERNEL_DENSITY = """
with pts as (
  select (c_custkey * 53) % 1200 as px, (c_custkey * 29) % 1200 as py
  from customer),
cells as (
  select i.range as cx, j.range as cy
  from range(-3, 33) i cross join range(-3, 33) j),
hits as (
  select c.cx, c.cy,
         (c.cx * 40 + 20 - p.px) * (c.cx * 40 + 20 - p.px)
       + (c.cy * 40 + 20 - p.py) * (c.cy * 40 + 20 - p.py) as d2
  from cells c cross join pts p)
select cx, cy, count(*) as n_points,
       cast(sum((10000 - d2) * (10000 - d2)) as bigint) as density_num
from hits where d2 <= 10000
group by cx, cy
"""


def q_pii_redact(sf_dir: str):
    """PII scrub (functions/pii.py): per-document email / IP / phone
    detection counts + placeholder-redacted text.  The gate corpus is
    synthesized by appending deterministic doc_id-derived PII to each
    document (mirrored literally in the oracle SQL -- the parquet word
    soup itself carries none); the operator under test is the
    vectorized RE2 count+replace pass, identical engine-side (pyarrow)
    and oracle-side (DuckDB) because both are RE2."""
    from ..functions.pii import redact_pii

    def augment(b: pa.Table) -> pa.Table:
        # test scaffolding, not the operator: plant PII per doc
        ids = b.column("doc_id").to_numpy()
        txt = b.column("text").to_pylist()
        aug = [f"{t} contact user{i}@mail.example.com from "
               f"10.0.{i % 256}.{(i * 7) % 256} call +61-555-{i % 10000:04d}"
               for t, i in zip(txt, ids)]
        return pa.table({"doc_id": b.column("doc_id"),
                         "text": pa.array(aug, pa.string())})

    ds = (_read(sf_dir, "documents", ["doc_id", "text"])
          .map_batches(augment, batch_format="pyarrow"))
    return redact_pii(ds)


from ..functions.pii import DEFAULT_PATTERNS as _PII_PATS  # noqa: E402

_PII_AUG_SQL = (
    "text || ' contact user' || cast(doc_id as varchar)"
    " || '@mail.example.com from 10.0.' || cast(doc_id % 256 as varchar)"
    " || '.' || cast((doc_id * 7) % 256 as varchar)"
    " || ' call +61-555-' || lpad(cast(doc_id % 10000 as varchar), 4, '0')")

# the oracle replays the engine's order exactly: pattern k is counted
# on the text AFTER patterns 1..k-1 were replaced, then replaced itself
_PII_CLEAN_SQL = "t"
_PII_COUNT_SQL = []
for _name, _pat, _tok in _PII_PATS:
    _PII_COUNT_SQL.append(
        f"cast(len(regexp_extract_all({_PII_CLEAN_SQL}, '{_pat}')) "
        f"as bigint) as {_name}")
    _PII_CLEAN_SQL = (f"regexp_replace({_PII_CLEAN_SQL}, '{_pat}', "
                      f"'{_tok}', 'g')")

SQL_PII_REDACT = f"""
with aug as (
  select doc_id, {_PII_AUG_SQL} as t
  from documents)
select doc_id,
       {", ".join(_PII_COUNT_SQL)},
       {_PII_CLEAN_SQL} as clean
from aug
"""


# --------------------------------------------------------------------------
# time-RANGE window frame: sum over a sliding 1-hour interval per user

def q_range_frame_sum(sf_dir: str):
    """``sum(value) over (partition by user_id order by ts RANGE between
    interval 1 hour preceding and current row)`` -- the value-based
    window frame (a ROWS frame cannot express it: the frame width varies
    per row and all ts-peers share one frame).  Per-group two-pointer:
    sort by ts, prefix-sum integer cents, then
    ``csum[searchsorted(ts, ts, right)] - csum[searchsorted(ts, ts-1h,
    left)]`` vectorizes every frame at once.  Cents use
    ``floor(v*100+0.5)`` so engine (numpy) and oracle (DuckDB) round the
    same doubles identically; the fold is exact int64.  ONE keyed fold,
    looping over USER SEGMENTS (numpy per segment), not rows."""
    from ..partitions import keyed_fold

    def fold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "user_id" not in b.column_names:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "user_id": pa.array([], pa.int64()),
                             "win_cents": pa.array([], pa.int64())})
        order = pc.sort_indices(b, sort_keys=[
            ("user_id", "ascending"), ("ts", "ascending")])
        g = b.take(order)
        uid = g.column("user_id").to_numpy()
        ts = g.column("ts").cast(pa.int64()).to_numpy()
        cents = np.floor(g.column("value").to_numpy() * 100.0
                         + 0.5).astype(np.int64)
        bounds = np.r_[np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]]),
                       len(uid)]
        win = np.empty(len(uid), np.int64)
        for si in range(len(bounds) - 1):
            s, e = bounds[si], bounds[si + 1]
            t = ts[s:e]
            csum = np.concatenate(([0], np.cumsum(cents[s:e])))
            hi = np.searchsorted(t, t, side="right")
            lo = np.searchsorted(t, t - 3_600_000_000, side="left")
            win[s:e] = csum[hi] - csum[lo]
        return pa.table({"event_id": g.column("event_id"),
                         "user_id": g.column("user_id"),
                         "win_cents": pa.array(win, pa.int64())})

    return _keyed_scan(
        _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"]), "user_id", fold,
        sf_dir=sf_dir, table="events",
        num_partitions=_join_parts(sf_dir, "events"))


SQL_RANGE_FRAME_SUM = """
select event_id, user_id,
       cast(sum(cast(floor(value * 100 + 0.5) as bigint)) over (
           partition by user_id order by ts
           range between interval 1 hour preceding and current row
       ) as bigint) as win_cents
from events
"""


# --------------------------------------------------------------------------
# streaming watermark: late-arrival detection (event time vs arrival order)

def q_late_events(sf_dir: str):
    """Out-of-order arrival audit -- the streaming-watermark primitive.
    Arrival order is ``event_id``; event time is ``ts``.  For each event
    the high-watermark is ``max(ts)`` over all EARLIER-ARRIVED events of
    the same user, and the event is late when its own ``ts`` lags that
    watermark by more than the 15-minute allowed lateness.  ONE keyed
    fold; the per-user shifted running max is the shared grouped-cummax
    helper (stages/streaming._prev_running_max) over every complete
    user run in the block -- exact integer microseconds throughout."""
    lateness_us = 15 * 60 * 1_000_000

    from ..partitions import keyed_fold
    from ..stages.streaming import _prev_running_max

    def fold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "user_id" not in b.column_names:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "user_id": pa.array([], pa.int64()),
                             "watermark_us": pa.array([], pa.int64()),
                             "late": pa.array([], pa.int64())})
        order = pc.sort_indices(b, sort_keys=[
            ("user_id", "ascending"), ("event_id", "ascending")])
        g = b.take(order)
        uid = g.column("user_id").to_numpy()
        ts = g.column("ts").cast(pa.int64()).to_numpy()
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        prev, no_prior = _prev_running_max(ts, starts)
        wm = np.where(no_prior, np.int64(-1), prev)
        late = ((wm >= 0) & (ts < wm - lateness_us)).astype(np.int64)
        return pa.table({"event_id": g.column("event_id"),
                         "user_id": g.column("user_id"),
                         "watermark_us": pa.array(wm, pa.int64()),
                         "late": pa.array(late, pa.int64())})

    return _keyed_scan(
        _read(sf_dir, "events", ["user_id", "ts", "event_id"]), "user_id", fold,
        sf_dir=sf_dir, table="events",
        num_partitions=_join_parts(sf_dir, "events"))


# --------------------------------------------------------------------------
# k-core decomposition: iterative degree peeling to the unique fixed point

_KCORE_K = 5
_KCORE_ROUNDS = 8


def q_kcore_customers(sf_dir: str):
    """Members of the 5-core of the deterministic customer graph
    (out-degree 1 + c_custkey % 7, dst = (key*7 + j*13) % n) with their
    within-core degree.  Iterative peel (functions/graph.kcore): one
    degree groupby + two endpoint semi-joins per round, edge set
    monotonically shrinking; converges in <= 5 rounds on this graph at
    every sf and the engine RAISES if the oracle's fixed round budget
    would be exceeded."""
    from ..functions.graph import kcore
    from ..partitions import shuffle_width

    n = pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows

    def edges(b: pa.Table) -> pa.Table:
        ck = b.column("c_custkey").to_numpy()
        src_l, dst_l = [], []
        for j in range(1, 8):
            s = ck[(ck % 7) >= (j - 1)]
            src_l.append(s)
            dst_l.append((s * 7 + j * 13) % n)
        return pa.table({"src": pa.array(np.concatenate(src_l), pa.int64()),
                         "dst": pa.array(np.concatenate(dst_l),
                                         pa.int64())})

    eds = (_read(sf_dir, "customer", ["c_custkey"])
           .map_batches(edges, batch_format="pyarrow"))
    return kcore(eds, _KCORE_K, max_rounds=_KCORE_ROUNDS,
                 num_partitions=shuffle_width(4 * n, lo=2))


def _kcore_sql(k: int, rounds: int) -> str:
    steps = []
    for t in range(1, rounds + 1):
        steps.append(f"""
d{t} as materialized (
  select node, count(*) as deg from (
    select a as node from e{t - 1}
    union all
    select b as node from e{t - 1}) t
  group by node),
k{t} as materialized (select node from d{t} where deg >= {k}),
e{t} as materialized (
  select a, b from e{t - 1}
  where a in (select node from k{t})
    and b in (select node from k{t}))""")
    return """
with nodes as (select c_custkey as node from customer),
nn as (select count(*) as n from customer),
raw as (
  select node as src, (node * 7 + j * 13) % (select n from nn) as dst
  from nodes cross join (select unnest([1, 2, 3, 4, 5, 6, 7]) as j)
  where (node % 7) >= (j - 1)),
e0 as materialized (
  select distinct least(src, dst) as a, greatest(src, dst) as b
  from raw where src <> dst),""" + ",".join(steps) + f"""
select node, cast(deg as bigint) as deg from (
  select node, count(*) as deg from (
    select a as node from e{rounds}
    union all
    select b as node from e{rounds}) t
  group by node) final
where deg >= {k}
"""


SQL_KCORE_CUSTOMERS = _kcore_sql(_KCORE_K, _KCORE_ROUNDS)


# --------------------------------------------------------------------------
# exact distributed Gram matrix over the embedding column (PCA moments)

def q_embedding_gram(sf_dir: str):
    """Upper-triangle exact Gram table of the quantized embedding
    vectors (functions/pca.gram_fold): per-block int64 ``Q.T @ Q``
    partials -> one tiny ``groupby((i,j)).sum``.  The only shuffled
    payload is d*(d+1)/2 rows per block -- vectors never move.  The
    oracle replays the quantization (``floor(v*10^4+0.5)``, identical
    double math) with a vec_id self-join."""
    from ..functions.pca import gram_fold

    return gram_fold(_read(sf_dir, "embeddings", ["embedding"]), dim=64)


SQL_EMBEDDING_GRAM = """
with e as (
  select vec_id, i.range as i,
         cast(floor(cast(embedding[i.range] as double) * 10000 + 0.5) as bigint) as q
  from embeddings, range(1, 65) i)
select a.i as i, b.i as j,
       cast(count(*) as bigint) as n,
       cast(sum(a.q * b.q) as bigint) as sxy
from e a join e b using (vec_id)
where a.i <= b.i
group by a.i, b.i
"""


SQL_LATE_EVENTS = """
with wm as (
  select event_id, user_id, epoch_us(ts) as t_us,
         coalesce(max(epoch_us(ts)) over (
             partition by user_id order by event_id
             rows between unbounded preceding and 1 preceding), -1)
             as watermark_us
  from events)
select event_id, user_id, watermark_us,
       case when watermark_us >= 0
                 and t_us < watermark_us - 900000000
            then 1 else 0 end as late
from wm
"""


# --------------------------------------------------------------------------
# local-supplier volume (TPC-H Q5 shape): the six-table join --
# region/nation tiny (constant-size) and driver-broadcast, supplier
# nation attached through the size-gated broadcast/hash dim path,
# customer and lineitem pre-filtered AT THE MAP before the only two
# real exchanges (orders |x| customer, lineitem |x| that), and revenue
# carried as exact integer cents*(100-disc).

def q_local_supplier_volume(sf_dir: str):
    region = pq.read_table(f"{sf_dir}/region.parquet")
    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    asia_rk = {r["r_regionkey"] for r in region.to_pylist()
               if r["r_name"] == "ASIA"}
    n_name = {r["n_nationkey"]: r["n_name"] for r in nation.to_pylist()
              if r["n_regionkey"] in asia_rk}
    asia_keys = np.asarray(sorted(n_name), np.int64)
    name_arr = np.asarray([n_name[k] for k in asia_keys])

    lo = np.datetime64("1996-01-01")
    hi = np.datetime64("1998-01-01")

    def ord_keep(b: pa.Table) -> pa.Table:
        d = b.column("o_orderdate").to_numpy()
        m = (d >= lo) & (d < hi)
        return pa.table({
            "o_orderkey": pa.array(b.column("o_orderkey").to_numpy()[m]),
            "o_custkey": pa.array(b.column("o_custkey").to_numpy()[m])})

    orders = (_read(sf_dir, "orders",
                    ["o_orderkey", "o_custkey", "o_orderdate"])
              .map_batches(ord_keep, batch_format="pyarrow"))

    # the customer nationkey attaches through the footer-gated dim path
    # (broadcast under the gate, sidecar join past it) -- one fewer
    # hash-join exchange than the previous orders x customer join
    oc = (_attach_dim(
        orders, sf_dir, "customer", fact_key="o_custkey",
        dim_key="c_custkey", columns=["c_custkey", "c_nationkey"],
        row_filter=pc.field("c_nationkey").isin(
            [int(k) for k in asia_keys]),
        join_width=_join_parts(sf_dir, "orders", "customer"))
        .select_columns(["o_orderkey", "c_nationkey"]))

    def li_map(b: pa.Table) -> pa.Table:
        ep = np.rint(b.column("l_extendedprice").to_numpy()
                     * 100.0).astype(np.int64)
        dc = np.rint(b.column("l_discount").to_numpy()
                     * 100.0).astype(np.int64)
        return pa.table({
            "l_orderkey": b.column("l_orderkey"),
            "s_nationkey": b.column("s_nationkey").cast(pa.int64()),
            "rev_c": pa.array(ep * (100 - dc), pa.int64())})

    li = (_attach_dim(
        _read(sf_dir, "lineitem",
              ["l_orderkey", "l_suppkey", "l_extendedprice",
               "l_discount"]),
        sf_dir, "supplier", fact_key="l_suppkey", dim_key="s_suppkey",
        columns=["s_suppkey", "s_nationkey"],
        row_filter=pc.field("s_nationkey").isin(
            [int(k) for k in asia_keys]),
        join_width=_join_parts(sf_dir, "lineitem"))
        .map_batches(li_map, batch_format="pyarrow"))
    j = li.join(oc, "inner",
                num_partitions=_join_parts(sf_dir, "lineitem", "orders"),
                on=("l_orderkey",), right_on=("o_orderkey",))

    def local_only(b: pa.Table) -> pa.Table:
        sn = b.column("s_nationkey").to_numpy()
        m = sn == b.column("c_nationkey").to_numpy()
        names = name_arr[np.searchsorted(asia_keys, sn[m])]
        return pa.table({
            "n_name": pa.array(names.tolist(), pa.string()),
            "rev_c": pa.array(b.column("rev_c").to_numpy()[m])})

    return _partial_count_sums(
        j.map_batches(local_only, batch_format="pyarrow"),
        "n_name", {"rev_c": "revenue_c"}, count_alias="n_items")


SQL_LOCAL_SUPPLIER_VOLUME = """
select n_name,
       cast(count(*) as bigint) as n_items,
       cast(sum(cast(round(l_extendedprice * 100) as bigint)
                * (100 - cast(round(l_discount * 100) as bigint)))
            as bigint) as revenue_c
from lineitem
join orders on l_orderkey = o_orderkey
join customer on o_custkey = c_custkey
join supplier on l_suppkey = s_suppkey
join nation on s_nationkey = n_nationkey
join region on n_regionkey = r_regionkey
where r_name = 'ASIA'
  and c_nationkey = s_nationkey
  and o_orderdate >= date '1996-01-01'
  and o_orderdate < date '1998-01-01'
group by n_name
"""


# --------------------------------------------------------------------------
# shipping-delay SLA by order priority (TPC-H Q12's late-line shape on
# this dataset's columns): ONE lineitem |x| orders exchange, integer
# day arithmetic, per-priority partial fold.

def q_priority_sla(sf_dir: str):
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    j = li.join(orders, "inner",
                num_partitions=_join_parts(sf_dir, "lineitem", "orders"),
                on=("l_orderkey",), right_on=("o_orderkey",))

    def classify(b: pa.Table) -> pa.Table:
        ship = b.column("l_shipdate").to_numpy()
        od = b.column("o_orderdate").to_numpy()
        delay = ((ship - od) // np.timedelta64(1, "D")).astype(np.int64)
        return pa.table({
            "o_orderpriority": b.column("o_orderpriority"),
            "delay_days": pa.array(delay, pa.int64()),
            "is_late": pa.array((delay > 90).astype(np.int64),
                                pa.int64())})

    return _partial_count_sums(
        j.map_batches(classify, batch_format="pyarrow"),
        "o_orderpriority", {"is_late": "n_late"}, count_alias="n_lines",
        max_cols={"delay_days": "max_delay"})


SQL_PRIORITY_SLA = """
select o_orderpriority,
       cast(count(*) as bigint) as n_lines,
       cast(sum(case when date_diff('day', o_orderdate, l_shipdate)
                     > 90 then 1 else 0 end) as bigint) as n_late,
       cast(max(date_diff('day', o_orderdate, l_shipdate)) as bigint)
           as max_delay
from lineitem join orders on l_orderkey = o_orderkey
group by o_orderpriority
"""


# --------------------------------------------------------------------------
# retention cohort matrix -- the classic product-analytics triangle: each
# customer's cohort is their first active month; count how many customers
# of each cohort are active again N months later.  Shape: one
# partial-deduped (custkey, month) shuffle, ONE keyed fold over custkey
# (vectorized sorted-run cohort subtraction across every complete
# customer group in a block -- the high-cardinality groupby rule from
# partitions.keyed_fold: the previous per-customer map_groups paid
# ~45us/group and scaled with customer cardinality), one tiny
# (cohort, since) count.

def q_retention_cohorts(sf_dir: str):
    from ..partitions import keyed_fold

    def mth(b: pa.Table) -> pa.Table:
        d = b.column("o_orderdate")
        m = pc.add(pc.multiply(pc.cast(pc.year(d), pa.int64()), 12),
                   pc.cast(pc.month(d), pa.int64()))
        return pa.table({"o_custkey": b.column("o_custkey"), "mth": m})

    def dedup_pairs(b: pa.Table) -> pa.Table:
        # per-BLOCK (custkey, month) dedup -- a shuffle-free combiner
        # (the former pre-dedup GROUPBY here inherited the fold's hash
        # strategy and its aggregator cost tripled the query; in-block
        # dedup shrinks the exchange without a second one)
        ck = b.column("o_custkey").to_numpy()
        m = b.column("mth").to_numpy().astype(np.int64)
        order = np.lexsort((m, ck))
        ck, m = ck[order], m[order]
        keep = np.r_[True, (ck[1:] != ck[:-1]) | (m[1:] != m[:-1])]
        return pa.table({"o_custkey": pa.array(ck[keep], pa.int64()),
                         "mth": pa.array(m[keep], pa.int64())})

    def fold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "o_custkey" not in b.column_names:
            return pa.table({
                "cohort_month": pa.array([], pa.int64()),
                "months_since": pa.array([], pa.int64())})
        ck = b.column("o_custkey").to_numpy()
        m = b.column("mth").to_numpy().astype(np.int64)
        order = np.lexsort((m, ck))
        ck, m = ck[order], m[order]
        keep = np.r_[True, (ck[1:] != ck[:-1]) | (m[1:] != m[:-1])]
        ck, m = ck[keep], m[keep]           # cross-block dedup
        starts = np.flatnonzero(np.r_[True, ck[1:] != ck[:-1]])
        counts = np.diff(np.r_[starts, len(ck)])
        cohort = np.repeat(m[starts], counts)   # min month per customer
        return pa.table({
            "cohort_month": pa.array(cohort, pa.int64()),
            "months_since": pa.array(m - cohort, pa.int64())})

    tri = _keyed_scan(
        _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])
        .map_batches(mth, batch_format="pyarrow")
        .map_batches(dedup_pairs, batch_format="pyarrow"), "o_custkey", fold,
        sf_dir=sf_dir, table="orders",
        num_partitions=_join_parts(sf_dir, "orders"))
    return (_partial_count_sums(tri, ["cohort_month", "months_since"],
                                {}, count_alias="n_customers")
            .select_columns(["cohort_month", "months_since",
                             "n_customers"]))


SQL_RETENTION_COHORTS = """
with m as (
  select o_custkey,
         cast(extract(year from o_orderdate) * 12
              + extract(month from o_orderdate) as bigint) as mth
  from orders group by 1, 2
), c as (
  select o_custkey, min(mth) as cohort from m group by 1
)
select c.cohort as cohort_month,
       m.mth - c.cohort as months_since,
       cast(count(*) as bigint) as n_customers
from m join c using (o_custkey)
group by 1, 2
"""


# --------------------------------------------------------------------------
# TPC-H Q1 shape (pricing summary report): scan-heavy single-table
# aggregate over a shipdate cutoff, grouped by the 2-value flag pair.
# Discount/tax arithmetic runs entirely in integer units (cents x
# percent x percent), so no float product can disagree with the oracle:
# disc_u = cents*(100-d_pct), charge_u = cents*(100-d_pct)*(100+t_pct).

def q_pricing_summary(sf_dir: str):
    cutoff = np.datetime64("1998-09-02T00:00:00", "us")

    def prep(b: pa.Table) -> pa.Table:
        ship = b.column("l_shipdate").cast(pa.timestamp("us")).to_numpy()
        keep = ship <= cutoff
        mask = pa.array(keep)
        qty = np.rint(b.column("l_quantity").to_numpy()[keep]) \
            .astype(np.int64)
        cents = np.rint(b.column("l_extendedprice").to_numpy()[keep]
                        * 100.0).astype(np.int64)
        d = np.rint(b.column("l_discount").to_numpy()[keep]
                    * 100.0).astype(np.int64)
        t = np.rint(b.column("l_tax").to_numpy()[keep]
                    * 100.0).astype(np.int64)
        disc_u = cents * (100 - d)
        return pa.table({
            "l_returnflag": b.column("l_returnflag").filter(mask),
            "l_linestatus": b.column("l_linestatus").filter(mask),
            "qty": pa.array(qty, pa.int64()),
            "base_cents": pa.array(cents, pa.int64()),
            "disc_u": pa.array(disc_u, pa.int64()),
            "charge_u": pa.array(disc_u * (100 + t), pa.int64())})

    return _partial_count_sums(
        _read(sf_dir, "lineitem",
              ["l_shipdate", "l_quantity", "l_extendedprice",
               "l_discount", "l_tax", "l_returnflag", "l_linestatus"])
        .map_batches(prep, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        {"qty": "sum_qty", "base_cents": "sum_base_cents",
         "disc_u": "sum_disc_u", "charge_u": "sum_charge_u"},
        count_alias="n_lines")


SQL_PRICING_SUMMARY = """
with c as (
  select l_returnflag, l_linestatus,
         cast(round(l_quantity) as bigint) as qty,
         cast(round(l_extendedprice * 100) as bigint) as cents,
         cast(round(l_discount * 100) as bigint) as d,
         cast(round(l_tax * 100) as bigint) as t
  from lineitem
  where l_shipdate <= timestamp '1998-09-02 00:00:00'
)
select l_returnflag, l_linestatus,
       cast(count(*) as bigint) as n_lines,
       cast(sum(qty) as bigint) as sum_qty,
       cast(sum(cents) as bigint) as sum_base_cents,
       cast(sum(cents * (100 - d)) as bigint) as sum_disc_u,
       cast(sum(cents * (100 - d) * (100 + t)) as bigint)
           as sum_charge_u
from c group by l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# Relational division: customers whose orders span EVERY order status
# present in the table (the "suppliers who supply all parts" classic).
# The divisor set is found first (per-batch uniques -> tiny driver set);
# the dividend collapses to distinct (custkey, status) pairs inside each
# batch before ONE keyed shuffle, so the exchange carries at most
# |statuses| rows per (batch, customer) -- never raw orders.

def q_division_customers(sf_dir: str):
    statuses: set[str] = set()
    for t in _collect(
            _read(sf_dir, "orders", ["o_orderstatus"])
            .map_batches(lambda b: b.group_by(["o_orderstatus"])
                         .aggregate([]), batch_format="pyarrow")
            ).column("o_orderstatus").to_pylist():
        statuses.add(t)
    n_total = len(statuses)

    def distinct_pairs(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        return b.group_by(["o_custkey", "o_orderstatus"]).aggregate([])

    def fold(b: pa.Table) -> pa.Table:
        # relational division over the deduped (cust, status) pairs:
        # one sorted run-length sweep counts distinct statuses per
        # customer across every complete group in the block
        if b.num_rows == 0 or "o_custkey" not in b.column_names:
            return pa.table({"c_custkey": pa.array([], pa.int64()),
                             "n_status": pa.array([], pa.int64())})
        dd = b.group_by(["o_custkey", "o_orderstatus"]).aggregate([])
        ck = np.sort(dd.column("o_custkey").to_numpy())
        starts = np.flatnonzero(np.r_[True, ck[1:] != ck[:-1]])
        n_st = np.diff(np.r_[starts, len(ck)])
        keep = n_st == n_total
        return pa.table({
            "c_custkey": pa.array(ck[starts][keep], pa.int64()),
            "n_status": pa.array(n_st[keep], pa.int64())})

    from ..partitions import keyed_fold

    return _keyed_scan(
        _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"])
        .map_batches(distinct_pairs, batch_format="pyarrow"), "o_custkey", fold,
        sf_dir=sf_dir, table="orders",
        num_partitions=_join_parts(sf_dir, "orders"))


SQL_DIVISION_CUSTOMERS = """
select o_custkey as c_custkey,
       cast(count(distinct o_orderstatus) as bigint) as n_status
from orders
group by o_custkey
having count(distinct o_orderstatus) =
       (select count(distinct o_orderstatus) from orders)
"""


# --------------------------------------------------------------------------
# Revenue concentration: exact integer Gini numerator per market segment.
# Uses the rank form  G_num = sum_i (2i - n - 1) * x_i  over customers
# sorted by revenue within their segment -- ranks come from the
# distributed global_ranks primitive (one sort shuffle + block-offset
# prefix), never a whole-segment map_groups.  All terms are integer
# (cents x small rank), so the compare is bit-deterministic; int64 holds
# to ~sf10 (1e16 per segment), noted here as the overflow bound.

def q_gini_revenue(sf_dir: str):
    from ..stages.ranking import global_ranks

    def to_cents(b: pa.Table) -> pa.Table:
        cents = np.rint(b.column("o_totalprice").to_numpy()
                        * 100.0).astype(np.int64)
        return pa.table({"o_custkey": b.column("o_custkey"),
                         "cents": pa.array(cents, pa.int64())})

    a = _agg()
    per_cust = (_read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
                .map_batches(to_cents, batch_format="pyarrow")
                .groupby("o_custkey")
                .aggregate(a.Sum("cents", alias_name="cents")))
    # mktsegment attaches through the footer-gated dim path (broadcast
    # under the gate, sidecar join past it) instead of a full hash join
    joined = _attach_dim(per_cust, sf_dir, "customer",
                         fact_key="o_custkey", dim_key="c_custkey",
                         columns=["c_custkey", "c_mktsegment"],
                         join_width=_join_parts(sf_dir, "customer"))

    # the joined table is customer-bounded; under the dim gate the
    # whole rank + Gini-term fold runs driver-side in numpy (exact
    # ints, same rank form), skipping the global sort exchange; past
    # the gate the distributed global_ranks path owns it
    if (pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
            <= _DIM_BROADCAST_MAX_ROWS and not _FORCE_DIM_JOIN):
        import ray as _ray

        tabs = [t for t in _ray.get(
            joined.materialize().to_arrow_refs()) if t.num_rows]
        if not tabs:
            return pa.table({
                "seg": pa.array([], pa.string()),
                "n_cust": pa.array([], pa.int64()),
                "gini_num": pa.array([], pa.int64()),
                "total_cents": pa.array([], pa.int64())})
        t = pa.concat_tables(tabs)
        seg = np.asarray(t.column("c_mktsegment").to_pylist())
        cents = t.column("cents").to_numpy()
        ck = t.column("o_custkey").to_numpy()
        order = np.lexsort((ck, cents, seg))
        seg, cents = seg[order], cents[order]
        starts = np.flatnonzero(np.r_[True, seg[1:] != seg[:-1]])
        counts = np.diff(np.r_[starts, len(seg)])
        i = (np.arange(len(seg))
             - np.repeat(starts, counts) + 1)       # rank within seg
        nrep = np.repeat(counts, counts)
        term = (2 * i - nrep - 1) * cents
        return pa.table({
            "seg": pa.array(seg[starts].tolist(), pa.string()),
            "n_cust": pa.array(counts, pa.int64()),
            "gini_num": pa.array(np.add.reduceat(term, starts),
                                 pa.int64()),
            "total_cents": pa.array(np.add.reduceat(cents, starts),
                                    pa.int64())})

    def pick(b: pa.Table) -> pa.Table:
        return pa.table({"seg": b.column("c_mktsegment"),
                         "cents": b.column("cents"),
                         "ck": b.column("o_custkey")})

    ranked = global_ranks(
        joined.map_batches(pick, batch_format="pyarrow"),
        ["seg", "cents", "ck"], partition_col="seg",
        rank_col="i").materialize()
    n_seg = {r["seg"]: r["n"] for r in
             ranked.groupby("seg")
             .aggregate(a.Max("i", alias_name="n")).take_all()}

    def terms(b: pa.Table) -> pa.Table:
        seg = b.column("seg").to_pylist()
        n = np.array([n_seg[s] for s in seg], dtype=np.int64)
        i = b.column("i").to_numpy()
        cents = b.column("cents").to_numpy()
        return pa.table({"seg": b.column("seg"),
                         "term": pa.array((2 * i - n - 1) * cents,
                                          pa.int64()),
                         "cents": b.column("cents")})

    return _partial_count_sums(
        ranked.map_batches(terms, batch_format="pyarrow"),
        "seg", {"term": "gini_num", "cents": "total_cents"},
        count_alias="n_cust")


SQL_GINI_REVENUE = """
with tot as (
  select c_mktsegment as seg, o_custkey as ck,
         sum(cast(round(o_totalprice * 100) as bigint)) as cents
  from orders join customer on o_custkey = c_custkey
  group by 1, 2
), ranked as (
  select seg, cents,
         row_number() over (partition by seg order by cents, ck) as i,
         count(*) over (partition by seg) as n
  from tot
)
select seg,
       cast(count(*) as bigint) as n_cust,
       cast(sum((2*i - n - 1) * cents) as bigint) as gini_num,
       cast(sum(cents) as bigint) as total_cents
from ranked
group by seg
"""


# --------------------------------------------------------------------------
# Bitwise aggregates (bitmap-index semantics): bit_or / bit_and / bit_xor
# of a per-event flag mask, folded per event type.  Each batch collapses
# to <= |event_type| partial rows with numpy reduceat over the
# dictionary-encoded key (or/and/xor are associative + commutative, so
# partial-then-final is exact); the final fold runs over #batches-sized
# tiny groups.

_BIT_MOD = 13


def q_bit_flags_events(sf_dir: str):
    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "m_or": pa.array([], pa.int64()),
                             "m_and": pa.array([], pa.int64()),
                             "m_xor": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        mask = np.left_shift(
            np.int64(1),
            b.column("event_id").to_numpy() % _BIT_MOD).astype(np.int64)
        enc = pc.dictionary_encode(
            b.column("event_type").combine_chunks())
        idx = enc.indices.to_numpy(zero_copy_only=False)
        order = np.argsort(idx, kind="stable")
        srt = idx[order]
        starts = np.flatnonzero(
            np.concatenate([[True], srt[1:] != srt[:-1]]))
        m = mask[order]
        ends = np.concatenate([starts[1:], [len(srt)]])
        return pa.table({
            "event_type": enc.dictionary.take(
                pa.array(srt[starts], pa.int32())),
            "m_or": pa.array(np.bitwise_or.reduceat(m, starts), pa.int64()),
            "m_and": pa.array(np.bitwise_and.reduceat(m, starts),
                              pa.int64()),
            "m_xor": pa.array(np.bitwise_xor.reduceat(m, starts),
                              pa.int64()),
            "n": pa.array(ends - starts, pa.int64())})

    def fold(g: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": g.column("event_type")[:1],
            "m_or": pa.array([np.bitwise_or.reduce(
                g.column("m_or").to_numpy())], pa.int64()),
            "m_and": pa.array([np.bitwise_and.reduce(
                g.column("m_and").to_numpy())], pa.int64()),
            "m_xor": pa.array([np.bitwise_xor.reduce(
                g.column("m_xor").to_numpy())], pa.int64()),
            "n": pa.array([int(pc.sum(g.column("n")).as_py())],
                          pa.int64())})

    return (_read(sf_dir, "events", ["event_type", "event_id"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("event_type")
            .map_groups(fold, batch_format="pyarrow"))


SQL_BIT_FLAGS_EVENTS = f"""
with m as (
  select event_type,
         cast(1 as bigint) << (event_id % {_BIT_MOD}) as mask
  from events
)
select event_type,
       cast(bit_or(mask) as bigint) as m_or,
       cast(bit_and(mask) as bigint) as m_and,
       cast(bit_xor(mask) as bigint) as m_xor,
       cast(count(*) as bigint) as n
from m group by event_type
"""


# --------------------------------------------------------------------------
# Benford leading-digit histogram over order totals in integer cents --
# the fraud-screening screening classic.  The leading digit is found with
# a bounded vectorized integer divide loop (<= 19 rounds for int64), so
# no float log10 can disagree with the oracle's string slice at decade
# boundaries.

def q_benford_prices(sf_dir: str):
    def digits(b: pa.Table) -> pa.Table:
        x = np.rint(b.column("o_totalprice").to_numpy()
                    * 100.0).astype(np.int64)
        x = np.abs(x)
        for _ in range(19):
            m = x >= 10
            if not m.any():
                break
            x = np.where(m, x // 10, x)
        return pa.table({"digit": pa.array(x, pa.int64())})

    return _partial_count_sums(
        _read(sf_dir, "orders", ["o_totalprice"])
        .map_batches(digits, batch_format="pyarrow"),
        "digit", {}, count_alias="n")


SQL_BENFORD_PRICES = """
select cast(substr(cast(cast(round(o_totalprice * 100) as bigint)
                        as varchar), 1, 1) as bigint) as digit,
       cast(count(*) as bigint) as n
from orders
group by 1
"""


# --------------------------------------------------------------------------
# TPC-H completion shapes (Q15/Q17/Q18/Q19/Q21/Q22 on this dataset's
# columns).  Each exercises a distinct dataflow the registry lacked:
# aggregate -> global-max -> equality filter (Q15), two-pass correlated
# aggregate with an exact rational comparison (Q17), having-over-groupby
# then join back (Q18), disjunctive multi-band join predicate (Q19),
# two-level grouped semi/anti logic on a self-ish join (Q21), and a
# scalar-subquery threshold plus a date-windowed anti-join (Q22).

def q_top_revenue_supplier(sf_dir: str):
    """TPC-H Q15 shape: per-supplier revenue over a shipdate window,
    then the supplier(s) achieving the global maximum.  Revenue is
    exact integer cents*(100-disc).  The per-supplier table is
    dim-sized (suppliers ~ customers/10 in TPC-H), so it is
    materialized once and reused for the max + the equality filter;
    supplier names come from the broadcast dim, not a shuffle."""
    lo = np.datetime64("1996-01-01")
    hi = np.datetime64("1996-07-01")

    def li_map(b: pa.Table) -> pa.Table:
        d = b.column("l_shipdate").to_numpy()
        m = (d >= lo) & (d < hi)
        ep = np.rint(b.column("l_extendedprice").to_numpy()[m]
                     * 100.0).astype(np.int64)
        dc = np.rint(b.column("l_discount").to_numpy()[m]
                     * 100.0).astype(np.int64)
        return pa.table({
            "s_suppkey": pa.array(b.column("l_suppkey").to_numpy()[m]),
            "rev_c": pa.array(ep * (100 - dc), pa.int64())})

    rev = _partial_count_sums(
        _read(sf_dir, "lineitem",
              ["l_suppkey", "l_shipdate", "l_extendedprice",
               "l_discount"])
        .map_batches(li_map, batch_format="pyarrow"),
        "s_suppkey", {"rev_c": "total_rev_c"}).materialize()
    best = rev.max("total_rev_c") if rev.count() else None
    if best is None:   # no lineitem in the window: oracle yields 0 rows
        return pa.table({"s_suppkey": pa.array([], pa.int64()),
                         "s_name": pa.array([], pa.string()),
                         "total_rev_c": pa.array([], pa.int64())})

    top = rev.filter(expr=f"total_rev_c == {int(best)}")
    return (_attach_dim(top, sf_dir, "supplier",
                        fact_key="s_suppkey", dim_key="s_suppkey",
                        columns=["s_suppkey", "s_name"])
            .select_columns(["s_suppkey", "s_name", "total_rev_c"]))


SQL_TOP_REVENUE_SUPPLIER = """
with rev as (
  select l_suppkey as s_suppkey,
         cast(sum(cast(round(l_extendedprice * 100) as bigint)
                  * (100 - cast(round(l_discount * 100) as bigint)))
              as bigint) as total_rev_c
  from lineitem
  where l_shipdate >= date '1996-01-01'
    and l_shipdate < date '1996-07-01'
  group by l_suppkey)
select supplier.s_suppkey, s_name, total_rev_c
from supplier join rev on supplier.s_suppkey = rev.s_suppkey
where total_rev_c = (select max(total_rev_c) from rev)
"""


def q_small_qty_revenue(sf_dir: str):
    """TPC-H Q17 shape: revenue from lineitems of one brand whose
    quantity is below 20% of that part's average order quantity.  The
    correlated avg is an exact rational comparison
    ``5 * qty * cnt < sum_qty`` (no float average), computed in a first
    per-part fold over the brand's lineitems; both the brand semi-join
    and the stats re-attach go through the size-gated broadcast/hash
    path (``_attach_dim``/``_attach_small``), so open-web part
    cardinality flips them to partkey-keyed ``Dataset.join``s."""
    def li_cents(b: pa.Table) -> pa.Table:
        q = np.rint(b.column("l_quantity").to_numpy()).astype(np.int64)
        ep = np.rint(b.column("l_extendedprice").to_numpy()
                     * 100.0).astype(np.int64)
        return pa.table({"l_partkey": b.column("l_partkey"),
                         "qty": pa.array(q, pa.int64()),
                         "ep_c": pa.array(ep, pa.int64())})

    width = _join_parts(sf_dir, "lineitem")
    li = _attach_dim(
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_quantity", "l_extendedprice"]),
        sf_dir, "part", fact_key="l_partkey", dim_key="p_partkey",
        columns=["p_partkey", "p_brand"],
        row_filter=pc.field("p_brand") == "Brand#4",
        transform=lambda t: t.select(["p_partkey"]),
        join_width=width,
    ).map_batches(li_cents, batch_format="pyarrow").materialize()
    # the brand slice is reused by both the stats fold and the final
    # scan; per-part stats stay a Dataset and re-attach via the same
    # size-gated path (part-slice cardinality grows with SF)
    per_part = _collect(_partial_count_sums(
        li, "l_partkey", {"qty": "sum_qty"}, count_alias="cnt"))

    def small(b: pa.Table) -> pa.Table:
        m = (5 * b.column("qty").to_numpy() * b.column("cnt").to_numpy()
             < b.column("sum_qty").to_numpy())
        return pa.table({
            "n_lines": pa.array([int(m.sum())], pa.int64()),
            "rev_c": pa.array([int(b.column("ep_c").to_numpy()[m].sum())],
                              pa.int64())})

    a = _agg()
    row = (_attach_small(li, per_part, fact_key="l_partkey",
                         dim_key="l_partkey", join_width=width)
           .map_batches(small, batch_format="pyarrow")
           .aggregate(a.Sum("n_lines", alias_name="n_lines"),
                      a.Sum("rev_c", alias_name="rev_c")))
    if row is None:          # brand absent entirely: oracle's
        row = {"n_lines": 0, "rev_c": 0}     # no-groups aggregate row
    return pa.table({"n_lines": pa.array([row["n_lines"]], pa.int64()),
                     "rev_c": pa.array([row["rev_c"]], pa.int64())})


SQL_SMALL_QTY_REVENUE = """
with pb as (select p_partkey from part where p_brand = 'Brand#4'),
agg as (
  select l_partkey,
         cast(sum(cast(round(l_quantity) as bigint)) as bigint) as sq,
         cast(count(*) as bigint) as cnt
  from lineitem join pb on l_partkey = p_partkey
  group by l_partkey)
select cast(count(*) as bigint) as n_lines,
       cast(coalesce(sum(cast(round(l_extendedprice * 100) as bigint)),
                     0) as bigint) as rev_c
from lineitem join agg using (l_partkey)
where 5 * cast(round(l_quantity) as bigint) * cnt < sq
"""


def q_large_orders(sf_dir: str, broadcast_rows: int = 100_000):
    """TPC-H Q18 shape: orders whose total quantity exceeds 250 --
    groupby-having on the high-cardinality order key (in-batch partial
    collapse, ONE exchange), then the surviving set rejoins orders and
    customer for names.  The survivor set is size-gated (the ranking.py
    pattern): at or below ``broadcast_rows`` it is broadcast and the
    orders/customer scans filter against it map-only (zero further
    exchanges -- having > 250 keeps ~1.5% of orders, so the common case
    at bench scale); above, two hash joins so nothing
    having-cardinality-sized reaches the driver.  Quantities are
    integral, price in exact cents."""
    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "sum_qty": pa.array([], pa.int64())})
        q = np.rint(b.column("l_quantity").to_numpy()).astype(np.int64)
        g = (pa.table({"l_orderkey": b.column("l_orderkey"),
                       "sum_qty": pa.array(q, pa.int64())})
             .group_by(["l_orderkey"]).aggregate([("sum_qty", "sum")]))
        return pa.table({"l_orderkey": g.column("l_orderkey"),
                         "sum_qty": g.column("sum_qty_sum")})

    def having(b: pa.Table) -> pa.Table:
        g = b.group_by(["l_orderkey"]).aggregate([("sum_qty", "sum")])
        t = pa.table({"l_orderkey": g.column("l_orderkey"),
                      "sum_qty": g.column("sum_qty_sum")})
        return t.filter(pc.greater(t.column("sum_qty"), 250))

    from ..partitions import keyed_fold

    partials_ds = (_read(sf_dir, "lineitem",
                         ["l_orderkey", "l_quantity"])
                   .map_batches(partial, batch_format="pyarrow")
                   .materialize())
    # the per-block partials are <= one row per (block, orderkey);
    # under the output bound the having runs as a driver merge (two
    # ints per row) instead of a keyed-fold exchange; past it the fold
    # owns it
    if partials_ds.count() <= 4_000_000:
        import ray as _ray
        import ray.data as _rd

        tabs = [t for t in _ray.get(partials_ds.to_arrow_refs())
                if t.num_rows]
        if tabs:
            allp = pa.concat_tables(tabs)
            ok_ = allp.column("l_orderkey").to_numpy()
            qq = allp.column("sum_qty").to_numpy()
            order = np.argsort(ok_, kind="stable")
            ok_, qq = ok_[order], qq[order]
            starts = np.flatnonzero(np.r_[True, ok_[1:] != ok_[:-1]])
            tot = np.add.reduceat(qq, starts)
            keep = tot > 250
            big_tab = pa.table({
                "l_orderkey": pa.array(ok_[starts][keep], pa.int64()),
                "sum_qty": pa.array(tot[keep], pa.int64())})
        else:
            big_tab = pa.table({
                "l_orderkey": pa.array([], pa.int64()),
                "sum_qty": pa.array([], pa.int64())})
        big = _rd.from_arrow(big_tab)
    else:
        big = keyed_fold(
            partials_ds, ["l_orderkey"], having,
            num_partitions=_join_parts(sf_dir, "lineitem")).materialize()

    def ord_map(b: pa.Table) -> pa.Table:
        p = np.rint(b.column("o_totalprice").to_numpy()
                    * 100.0).astype(np.int64)
        return pa.table({"o_orderkey": b.column("o_orderkey"),
                         "o_custkey": b.column("o_custkey"),
                         "o_orderdate": b.column("o_orderdate"),
                         "price_c": pa.array(p, pa.int64())})

    orders = (_read(sf_dir, "orders",
                    ["o_orderkey", "o_custkey", "o_orderdate",
                     "o_totalprice"])
              .map_batches(ord_map, batch_format="pyarrow"))
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])

    if big.count() <= broadcast_rows:
        import ray

        t = _collect(big)
        ok = t.column("l_orderkey").to_numpy()
        srt = np.argsort(ok)
        big_ref = ray.put((ok[srt], t.column("sum_qty").to_numpy()[srt]))

        def ord_filter(b: pa.Table) -> pa.Table:
            k, sq = ray.get(big_ref)
            okk = b.column("o_orderkey").to_numpy()
            pos = np.clip(np.searchsorted(k, okk), 0, max(len(k) - 1, 0))
            m = (k[pos] == okk) if len(k) else np.zeros(len(okk), bool)
            return (b.filter(pa.array(m))
                    .append_column("sum_qty",
                                   pa.array(sq[pos[m]], pa.int64())))

        hits = (orders.map_batches(ord_filter, batch_format="pyarrow")
                .materialize())
        ck = np.unique(_collect(hits).column("o_custkey").to_numpy())
        ck_ref = ray.put(ck)

        def cust_filter(b: pa.Table) -> pa.Table:
            k = ray.get(ck_ref)
            cc = b.column("c_custkey").to_numpy()
            pos = np.clip(np.searchsorted(k, cc), 0, max(len(k) - 1, 0))
            m = (k[pos] == cc) if len(k) else np.zeros(len(cc), bool)
            return b.filter(pa.array(m))

        names = _collect(cust.map_batches(cust_filter,
                                          batch_format="pyarrow"))
        nk = names.column("c_custkey").to_numpy()
        nsrt = np.argsort(nk)
        nk = nk[nsrt]
        nname = np.asarray(names.column("c_name").to_pylist())[nsrt]
        name_ref = ray.put((nk, nname))

        def attach(b: pa.Table) -> pa.Table:
            k, nm = ray.get(name_ref)
            cc = b.column("o_custkey").to_numpy()
            return pa.table({
                "c_name": pa.array(
                    nm[np.searchsorted(k, cc)].tolist(), pa.string()),
                "o_custkey": b.column("o_custkey"),
                "o_orderkey": b.column("o_orderkey"),
                "o_orderdate": b.column("o_orderdate"),
                "price_c": b.column("price_c"),
                "sum_qty": b.column("sum_qty")})

        return hits.map_batches(attach, batch_format="pyarrow")

    j = big.join(orders, "inner",
                 num_partitions=_join_parts(sf_dir, "orders"),
                 on=("l_orderkey",), right_on=("o_orderkey",))
    # the join keeps only the LEFT key column (l_orderkey) -- restore
    # the oracle's o_orderkey name
    return (j.join(cust, "inner",
                   num_partitions=_join_parts(sf_dir, "customer"),
                   on=("o_custkey",), right_on=("c_custkey",))
            .rename_columns({"l_orderkey": "o_orderkey"})
            .select_columns(["c_name", "o_custkey", "o_orderkey",
                             "o_orderdate", "price_c", "sum_qty"]))


SQL_LARGE_ORDERS = """
with big as (
  select l_orderkey,
         cast(sum(cast(round(l_quantity) as bigint)) as bigint)
             as sum_qty
  from lineitem group by l_orderkey
  having sum_qty > 250)
select c_name, o_custkey, o_orderkey, o_orderdate,
       cast(round(o_totalprice * 100) as bigint) as price_c, sum_qty
from big
join orders on l_orderkey = o_orderkey
join customer on o_custkey = c_custkey
"""


def q_disjunctive_revenue(sf_dir: str):
    """TPC-H Q19 shape: revenue by OR'd (brand, size-range, qty-range)
    band over lineitem |x| part.  The partkey -> band-id mapping (band
    brand slices of the part dim) attaches through the size-gated
    broadcast/hash path, then the scan applies the whole qty
    disjunction in one vectorized pass."""
    BANDS = [("Brand#1", 1, 15, 1, 20), ("Brand#2", 1, 25, 10, 30),
             ("Brand#3", 1, 35, 20, 40)]
    qlo = np.array([b[3] for b in BANDS], np.int64)
    qhi = np.array([b[4] for b in BANDS], np.int64)

    def part_bands(t: pa.Table) -> pa.Table:
        pb = np.asarray(t.column("p_brand").to_pylist())
        psz = t.column("p_size").to_numpy()
        band_of = np.zeros(len(pb), np.int64)
        for i, (brand, s_lo, s_hi, _, _) in enumerate(BANDS, 1):
            band_of[(pb == brand) & (psz >= s_lo) & (psz <= s_hi)] = i
        keep = band_of > 0
        return pa.table({
            "p_partkey": t.column("p_partkey").filter(pa.array(keep)),
            "band": pa.array(band_of[keep], pa.int64())})

    def li_map(b: pa.Table) -> pa.Table:
        bnd = b.column("band").to_numpy()
        q = np.rint(b.column("l_quantity").to_numpy()).astype(np.int64)
        m = (q >= qlo[bnd - 1]) & (q <= qhi[bnd - 1])
        ep = np.rint(b.column("l_extendedprice").to_numpy()[m]
                     * 100.0).astype(np.int64)
        dc = np.rint(b.column("l_discount").to_numpy()[m]
                     * 100.0).astype(np.int64)
        return pa.table({"band": pa.array(bnd[m], pa.int64()),
                         "rev_c": pa.array(ep * (100 - dc), pa.int64())})

    li = _attach_dim(
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_quantity", "l_extendedprice",
               "l_discount"]),
        sf_dir, "part", fact_key="l_partkey", dim_key="p_partkey",
        columns=["p_partkey", "p_brand", "p_size"],
        transform=part_bands,
        join_width=_join_parts(sf_dir, "lineitem"))
    return _partial_count_sums(
        li.map_batches(li_map, batch_format="pyarrow"),
        "band", {"rev_c": "rev_c"}, count_alias="n_lines")


SQL_DISJUNCTIVE_REVENUE = """
select band, cast(count(*) as bigint) as n_lines,
       cast(sum(cast(round(l_extendedprice * 100) as bigint)
                * (100 - cast(round(l_discount * 100) as bigint)))
            as bigint) as rev_c
from (
  select case
    when p_brand = 'Brand#1' and p_size between 1 and 15
         and l_quantity between 1 and 20 then 1
    when p_brand = 'Brand#2' and p_size between 1 and 25
         and l_quantity between 10 and 30 then 2
    when p_brand = 'Brand#3' and p_size between 1 and 35
         and l_quantity between 20 and 40 then 3
  end as band, l_extendedprice, l_discount
  from lineitem join part on l_partkey = p_partkey) t
where band is not null
group by band
"""


def q_late_sole_supplier(sf_dir: str):
    """TPC-H Q21 shape on this dataset's columns: suppliers who were
    the SOLE late shipper (shipdate > orderdate + 730 days) on
    multi-supplier orders, with per-supplier order counts.  One
    lineitem |x| orders exchange tags lateness; per-(order, supplier)
    flags collapse in-batch, then ONE groupby(orderkey) pass applies
    the exists/not-exists pair inside each (tiny) order group."""
    LATE = np.timedelta64(730, "D")

    # orderdate attaches through the footer-gated dim path (broadcast
    # under 2M orders, sidecar join past it) instead of a full
    # lineitem x orders hash-join exchange
    j = _attach_dim(
        _read(sf_dir, "lineitem",
              ["l_orderkey", "l_suppkey", "l_shipdate"]),
        sf_dir, "orders", fact_key="l_orderkey", dim_key="o_orderkey",
        columns=["o_orderkey", "o_orderdate"],
        join_width=_join_parts(sf_dir, "lineitem", "orders"))

    def flag(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "l_suppkey": pa.array([], pa.int64()),
                             "late": pa.array([], pa.int64())})
        late = ((b.column("l_shipdate").to_numpy()
                 - b.column("o_orderdate").to_numpy()) > LATE)
        g = (pa.table({"l_orderkey": b.column("l_orderkey"),
                       "l_suppkey": b.column("l_suppkey"),
                       "late": pa.array(late.astype(np.int64))})
             .group_by(["l_orderkey", "l_suppkey"])
             .aggregate([("late", "max")]))
        return pa.table({"l_orderkey": g.column("l_orderkey"),
                         "l_suppkey": g.column("l_suppkey"),
                         "late": g.column("late_max")})

    def sole(b: pa.Table) -> pa.Table:
        # whole hash partition per call: complete order groups.  Fold
        # (order, supplier) pairs, then per-order supplier/late counts,
        # all via sorted-run reduceat -- no per-group Python.
        if b.num_rows == 0:
            return pa.table({"s_suppkey": pa.array([], pa.int64())})
        ok = b.column("l_orderkey").to_numpy()
        sk = b.column("l_suppkey").to_numpy()
        lt = b.column("late").to_numpy()
        order = np.lexsort((sk, ok))
        ok, sk, lt = ok[order], sk[order], lt[order]
        pair_start = np.ones(len(ok), bool)
        pair_start[1:] = (ok[1:] != ok[:-1]) | (sk[1:] != sk[:-1])
        starts = np.flatnonzero(pair_start)
        p_ok = ok[starts]
        p_sk = sk[starts]
        p_late = np.maximum.reduceat(lt, starts)
        ord_start = np.ones(len(p_ok), bool)
        ord_start[1:] = p_ok[1:] != p_ok[:-1]
        ostarts = np.flatnonzero(ord_start)
        n_supp = np.diff(np.append(ostarts, len(p_ok)))
        n_late = np.add.reduceat(p_late, ostarts)
        ord_ok = (n_supp > 1) & (n_late == 1)
        keep = np.repeat(ord_ok, n_supp) & (p_late == 1)
        return pa.table({"s_suppkey": pa.array(p_sk[keep], pa.int64())})

    def supp_count(b: pa.Table) -> pa.Table:
        g = b.group_by(["s_suppkey"]).aggregate([("n_orders", "sum")])
        return pa.table({"s_suppkey": g.column("s_suppkey"),
                         "n_orders": g.column("n_orders_sum")})

    def sole_partial(b: pa.Table) -> pa.Table:
        t = sole(b)
        g = t.group_by(["s_suppkey"]).aggregate([([], "count_all")])
        return pa.table({"s_suppkey": g.column("s_suppkey"),
                         "n_orders": g.column("count_all")})

    from ..partitions import keyed_fold

    inner = keyed_fold(j.map_batches(flag, batch_format="pyarrow"),
                       ["l_orderkey"], sole_partial,
                       num_partitions=_join_parts(sf_dir, "lineitem"))

    # final supplier rollup: the per-block partials are supplier-
    # bounded, so under the dim gate they driver-merge (footer-gated
    # like every dim read) and the names attach by searchsorted; past
    # the gate a second keyed_fold + distributed dim attach own it
    # (the plan is hash-strategy after the fold, so a sort-based
    # groupby here would run as the slow hash aggregate anyway)
    n_supp_meta = pq.read_metadata(
        f"{sf_dir}/supplier.parquet").num_rows
    if n_supp_meta <= _DIM_BROADCAST_MAX_ROWS and not _FORCE_DIM_JOIN:
        import ray as _ray

        sk_l, n_l = [], []
        for t in _ray.get(inner.materialize().to_arrow_refs()):
            if t.num_rows:
                sk_l.append(t.column("s_suppkey").to_numpy())
                n_l.append(t.column("n_orders").to_numpy())
        if not sk_l:
            return pa.table({"s_suppkey": pa.array([], pa.int64()),
                             "s_name": pa.array([], pa.string()),
                             "n_orders": pa.array([], pa.int64())})
        sk = np.concatenate(sk_l)
        nn = np.concatenate(n_l)
        order = np.argsort(sk, kind="stable")
        sk, nn = sk[order], nn[order]
        starts = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]])
        counts_tab = pa.table({
            "s_suppkey": pa.array(sk[starts], pa.int64()),
            "n_orders": pa.array(np.add.reduceat(nn, starts),
                                 pa.int64())})
        import ray.data as _rd

        return (_attach_dim(_rd.from_arrow(counts_tab), sf_dir,
                            "supplier", fact_key="s_suppkey",
                            dim_key="s_suppkey",
                            columns=["s_suppkey", "s_name"])
                .select_columns(["s_suppkey", "s_name", "n_orders"]))

    counts = keyed_fold(inner, ["s_suppkey"], supp_count,
                        num_partitions=8)
    return (_attach_dim(counts, sf_dir, "supplier",
                        fact_key="s_suppkey", dim_key="s_suppkey",
                        columns=["s_suppkey", "s_name"])
            .select_columns(["s_suppkey", "s_name", "n_orders"]))


SQL_LATE_SOLE_SUPPLIER = """
with li as (
  select l_orderkey, l_suppkey,
         max(case when l_shipdate > o_orderdate + interval 730 day
                  then 1 else 0 end) as late
  from lineitem join orders on l_orderkey = o_orderkey
  group by l_orderkey, l_suppkey),
agg as (
  select l_orderkey, count(*) as n_supp, sum(late) as n_late
  from li group by l_orderkey)
select s_suppkey, s_name, cast(count(*) as bigint) as n_orders
from li
join agg using (l_orderkey)
join supplier on l_suppkey = s_suppkey
where li.late = 1 and agg.n_supp > 1 and agg.n_late = 1
group by s_suppkey, s_name
"""


def q_idle_rich_customers(sf_dir: str):
    """TPC-H Q22 shape: customers whose balance (exact cents) exceeds
    the positive-balance average -- an exact rational comparison
    ``bal_c * n_pos > sum_pos_c`` against a one-row global fold -- and
    who placed NO order since 2001-01-01 (date-windowed anti-join,
    filter pushed into the orders scan).  Grouped by nation."""
    from datetime import datetime

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey", "c_acctbal"])

    def pos_partial(b: pa.Table) -> pa.Table:
        bal = np.rint(b.column("c_acctbal").to_numpy()
                      * 100.0).astype(np.int64)
        p = bal[bal > 0]
        return pa.table({"n": pa.array([len(p)], pa.int64()),
                         "s": pa.array([int(p.sum())], pa.int64())})

    a = _agg()
    tot = (cust.map_batches(pos_partial, batch_format="pyarrow")
           .aggregate(a.Sum("n", alias_name="n"),
                      a.Sum("s", alias_name="s")))
    n_pos, s_pos = int(tot["n"]), int(tot["s"])

    def rich(b: pa.Table) -> pa.Table:
        bal = np.rint(b.column("c_acctbal").to_numpy()
                      * 100.0).astype(np.int64)
        m = bal * n_pos > s_pos
        return pa.table({
            "c_custkey": pa.array(b.column("c_custkey").to_numpy()[m]),
            "c_nationkey": pa.array(
                b.column("c_nationkey").to_numpy()[m]),
            "bal_c": pa.array(bal[m], pa.int64())})

    cut = pa.scalar(datetime(2001, 1, 1), pa.timestamp("us"))
    recent = (_read(sf_dir, "orders", ["o_custkey", "o_orderdate"],
                    row_filter=pc.field("o_orderdate") >= cut)
              .select_columns(["o_custkey"]))
    idle = (cust.map_batches(rich, batch_format="pyarrow")
            .join(recent, "left_anti",
                  num_partitions=_join_parts(sf_dir, "customer",
                                             "orders"),
                  on=("c_custkey",), right_on=("o_custkey",)))
    return _partial_count_sums(idle, "c_nationkey",
                               {"bal_c": "bal_c"},
                               count_alias="n_cust")


SQL_IDLE_RICH_CUSTOMERS = """
with pos as (
  select cast(count(*) as bigint) as n,
         cast(sum(cast(round(c_acctbal * 100) as bigint)) as bigint)
             as s
  from customer where cast(round(c_acctbal * 100) as bigint) > 0)
select c_nationkey,
       cast(count(*) as bigint) as n_cust,
       cast(sum(cast(round(c_acctbal * 100) as bigint)) as bigint)
           as bal_c
from customer, pos
where cast(round(c_acctbal * 100) as bigint) * pos.n > pos.s
  and c_custkey not in (select o_custkey from orders
                        where o_orderdate >= date '2001-01-01')
group by c_nationkey
"""


# --------------------------------------------------------------------------
# TPC-H completion shapes, batch 2 (Q2/Q7/Q10/Q14/Q16/Q20): correlated
# argmin join-back, nation-pair bidirectional volume, returned-revenue
# top-k over a high-cardinality key, promo share as exact integer
# numerator/denominator, anti-filtered distinct-count, and a
# having-semi-join.  With batch 1 and the earlier Q1/Q3/Q4/Q5/Q6/Q12/Q13
# analogues the registry now covers all 22 TPC-H dataflow shapes.

def q_cheapest_supplier_per_part(sf_dir: str):
    """TPC-H Q2 shape: per part, the minimum extended price any
    supplier charged, and the supplier achieving it (min-suppkey
    tie-break) -- a correlated-min + join-back collapsed into ONE
    exchange: in-batch argmin partials (one candidate row per part per
    batch) feed a per-part final argmin; the combine is associative so
    block order cannot change the result."""
    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"p_partkey": pa.array([], pa.int64()),
                             "min_ep_c": pa.array([], pa.int64()),
                             "s_suppkey": pa.array([], pa.int64())})
        pk = b.column("l_partkey").to_numpy()
        ep = np.rint(b.column("l_extendedprice").to_numpy()
                     * 100.0).astype(np.int64)
        sk = b.column("l_suppkey").to_numpy()
        # lexicographic argmin (ep, suppkey) per part in one sort pass
        order = np.lexsort((sk, ep, pk))
        pk_s = pk[order]
        first = np.ones(len(pk_s), bool)
        first[1:] = pk_s[1:] != pk_s[:-1]
        return pa.table({"p_partkey": pa.array(pk_s[first]),
                         "min_ep_c": pa.array(ep[order][first], pa.int64()),
                         "s_suppkey": pa.array(sk[order][first],
                                               pa.int64())})

    def final(b: pa.Table) -> pa.Table:
        # whole hash partition per call: many complete part groups --
        # same lexicographic first-of-key sweep as the partial
        pk = b.column("p_partkey").to_numpy()
        ep = b.column("min_ep_c").to_numpy()
        sk = b.column("s_suppkey").to_numpy()
        order = np.lexsort((sk, ep, pk))
        pk_s = pk[order]
        first = np.ones(len(pk_s), bool)
        first[1:] = pk_s[1:] != pk_s[:-1]
        return pa.table({"p_partkey": pa.array(pk_s[first]),
                         "min_ep_c": pa.array(ep[order][first], pa.int64()),
                         "s_suppkey": pa.array(sk[order][first],
                                               pa.int64())})

    from ..partitions import keyed_fold

    return keyed_fold(
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_extendedprice", "l_suppkey"])
        .map_batches(partial, batch_format="pyarrow"),
        ["p_partkey"], final,
        num_partitions=_join_parts(sf_dir, "lineitem"))


SQL_CHEAPEST_SUPPLIER_PER_PART = """
with m as (
  select l_partkey,
         min(cast(round(l_extendedprice * 100) as bigint)) as min_ep_c
  from lineitem group by l_partkey)
select lineitem.l_partkey as p_partkey, min_ep_c,
       cast(min(l_suppkey) as bigint) as s_suppkey
from lineitem join m
  on lineitem.l_partkey = m.l_partkey
 and cast(round(l_extendedprice * 100) as bigint) = min_ep_c
group by 1, 2
"""


def q_nation_pair_volume(sf_dir: str):
    """TPC-H Q7 shape: shipping volume between NATION_3 and NATION_8
    in both directions, by shipdate year.  Supplier nation attaches
    through the size-gated broadcast/hash dim path (pre-filtered to the
    two nations, so the inner attach IS the filter); customer nation
    rides the orders |x| customer exchange; the lineitem |x| orders
    join is the only unavoidable large-large exchange.  Revenue in
    exact integer cents*(100-disc)."""
    NA, NB = 3, 8
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    oc = (_attach_dim(
        orders, sf_dir, "customer", fact_key="o_custkey",
        dim_key="c_custkey", columns=["c_custkey", "c_nationkey"],
        row_filter=pc.field("c_nationkey").isin([NA, NB]),
        join_width=_join_parts(sf_dir, "orders", "customer"))
        .select_columns(["o_orderkey", "c_nationkey"]))

    def sup_nat(t: pa.Table) -> pa.Table:
        return pa.table({
            "s_suppkey": t.column("s_suppkey"),
            "supp_nation": t.column("s_nationkey").cast(pa.int64())})

    def li_map(b: pa.Table) -> pa.Table:
        ep = np.rint(b.column("l_extendedprice").to_numpy()
                     * 100.0).astype(np.int64)
        dc = np.rint(b.column("l_discount").to_numpy()
                     * 100.0).astype(np.int64)
        yr = (b.column("l_shipdate").to_numpy()
              .astype("datetime64[Y]").astype(np.int64) + 1970)
        return pa.table({
            "l_orderkey": b.column("l_orderkey"),
            "supp_nation": b.column("supp_nation"),
            "ship_year": pa.array(yr, pa.int64()),
            "rev_c": pa.array(ep * (100 - dc), pa.int64())})

    li = (_attach_dim(
        _read(sf_dir, "lineitem",
              ["l_orderkey", "l_suppkey", "l_shipdate",
               "l_extendedprice", "l_discount"]),
        sf_dir, "supplier", fact_key="l_suppkey", dim_key="s_suppkey",
        columns=["s_suppkey", "s_nationkey"],
        row_filter=pc.field("s_nationkey").isin([NA, NB]),
        transform=sup_nat, join_width=_join_parts(sf_dir, "lineitem"))
        .map_batches(li_map, batch_format="pyarrow"))
    j = li.join(oc, "inner",
                num_partitions=_join_parts(sf_dir, "lineitem", "orders"),
                on=("l_orderkey",), right_on=("o_orderkey",))

    def cross(b: pa.Table) -> pa.Table:
        sn = b.column("supp_nation").to_numpy()
        cn = b.column("c_nationkey").to_numpy().astype(np.int64)
        m = sn != cn
        return pa.table({"supp_nation": pa.array(sn[m]),
                         "cust_nation": pa.array(cn[m]),
                         "ship_year": pa.array(
                             b.column("ship_year").to_numpy()[m]),
                         "rev_c": pa.array(
                             b.column("rev_c").to_numpy()[m])})

    return _partial_count_sums(
        j.map_batches(cross, batch_format="pyarrow"),
        ["supp_nation", "cust_nation", "ship_year"],
        {"rev_c": "rev_c"}, count_alias="n_lines")


SQL_NATION_PAIR_VOLUME = """
select s_nationkey as supp_nation,
       cast(c_nationkey as bigint) as cust_nation,
       cast(year(l_shipdate) as bigint) as ship_year,
       cast(count(*) as bigint) as n_lines,
       cast(sum(cast(round(l_extendedprice * 100) as bigint)
                * (100 - cast(round(l_discount * 100) as bigint)))
            as bigint) as rev_c
from lineitem
join orders on l_orderkey = o_orderkey
join customer on o_custkey = c_custkey
join supplier on l_suppkey = s_suppkey
where s_nationkey in (3, 8) and c_nationkey in (3, 8)
  and s_nationkey != c_nationkey
group by 1, 2, 3
"""


def q_returned_revenue_topk(sf_dir: str):
    """TPC-H Q10 shape: top-20 customers by revenue of RETURNED
    lineitems in a date window -- lineitem filter + ONE join exchange
    to orders, per-customer partial fold, then a total-order top-k
    (revenue desc, custkey asc) whose per-block partials keep only 20
    candidate rows each before the final cut."""
    from datetime import datetime

    lo = pa.scalar(datetime(1996, 1, 1), pa.timestamp("us"))
    hi = pa.scalar(datetime(1997, 1, 1), pa.timestamp("us"))

    def li_map(b: pa.Table) -> pa.Table:
        m = (np.asarray(b.column("l_returnflag").to_pylist()) == "R")
        ep = np.rint(b.column("l_extendedprice").to_numpy()[m]
                     * 100.0).astype(np.int64)
        dc = np.rint(b.column("l_discount").to_numpy()[m]
                     * 100.0).astype(np.int64)
        return pa.table({
            "l_orderkey": pa.array(b.column("l_orderkey").to_numpy()[m]),
            "rev_c": pa.array(ep * (100 - dc), pa.int64())})

    li = (_read(sf_dir, "lineitem",
                ["l_orderkey", "l_returnflag", "l_extendedprice",
                 "l_discount"])
          .map_batches(li_map, batch_format="pyarrow"))
    # orders-side custkey attaches through the footer-gated dim path
    # (broadcast under 2M orders, sidecar join past it)
    j = _attach_dim(
        li, sf_dir, "orders", fact_key="l_orderkey",
        dim_key="o_orderkey", columns=["o_orderkey", "o_custkey"],
        row_filter=((pc.field("o_orderdate") >= lo)
                    & (pc.field("o_orderdate") < hi)),
        join_width=_join_parts(sf_dir, "lineitem", "orders"))
    per_cust = _partial_count_sums(j, "o_custkey",
                                   {"rev_c": "rev_c"})
    return (per_cust
            .rename_columns({"o_custkey": "c_custkey"})
            .sort(["rev_c", "c_custkey"], descending=[True, False])
            .limit(20))


SQL_RETURNED_REVENUE_TOPK = """
select o_custkey as c_custkey,
       cast(sum(cast(round(l_extendedprice * 100) as bigint)
                * (100 - cast(round(l_discount * 100) as bigint)))
            as bigint) as rev_c
from lineitem join orders on l_orderkey = o_orderkey
where l_returnflag = 'R'
  and o_orderdate >= date '1996-01-01'
  and o_orderdate < date '1997-01-01'
group by 1
order by rev_c desc, c_custkey
limit 20
"""


def q_promo_revenue_share(sf_dir: str):
    """TPC-H Q14 shape: promo-type revenue vs total revenue in a
    shipdate month.  Both sides stay exact integer cents (the oracle's
    100*promo/total float is replaced by the integer numerator and
    denominator, which determine it).  The partkey -> is-promo flag is
    a FULL-coverage dim column (every l_partkey exists in part), so the
    size-gated INNER attach keeps every window row and the total stays
    exact."""
    lo = np.datetime64("1996-03-01")
    hi = np.datetime64("1996-04-01")

    def window(b: pa.Table) -> pa.Table:
        d = b.column("l_shipdate").to_numpy()
        m = pa.array((d >= lo) & (d < hi))
        return b.filter(m).drop_columns(["l_shipdate"])

    def part_promo(t: pa.Table) -> pa.Table:
        isp = (np.asarray(t.column("p_type").to_pylist()) == "PROMO")
        return pa.table({"p_partkey": t.column("p_partkey"),
                         "is_promo": pa.array(isp)})

    def li_map(b: pa.Table) -> pa.Table:
        ep = np.rint(b.column("l_extendedprice").to_numpy()
                     * 100.0).astype(np.int64)
        dc = np.rint(b.column("l_discount").to_numpy()
                     * 100.0).astype(np.int64)
        rev = ep * (100 - dc)
        isp = b.column("is_promo").to_numpy(zero_copy_only=False)
        return pa.table({
            "promo_rev_c": pa.array([int(rev[isp].sum())], pa.int64()),
            "total_rev_c": pa.array([int(rev.sum())], pa.int64())})

    li = _attach_dim(
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_shipdate", "l_extendedprice",
               "l_discount"])
        .map_batches(window, batch_format="pyarrow"),
        sf_dir, "part", fact_key="l_partkey", dim_key="p_partkey",
        columns=["p_partkey", "p_type"], transform=part_promo,
        join_width=_join_parts(sf_dir, "lineitem"))
    a = _agg()
    row = (li.map_batches(li_map, batch_format="pyarrow")
           .aggregate(a.Sum("promo_rev_c", alias_name="promo_rev_c"),
                      a.Sum("total_rev_c", alias_name="total_rev_c")))
    if row is None or row["promo_rev_c"] is None:  # empty window
        row = {"promo_rev_c": 0, "total_rev_c": 0}
    return pa.table({
        "promo_rev_c": pa.array([row["promo_rev_c"]], pa.int64()),
        "total_rev_c": pa.array([row["total_rev_c"]], pa.int64())})


SQL_PROMO_REVENUE_SHARE = """
select cast(sum(case when p_type = 'PROMO'
                then cast(round(l_extendedprice * 100) as bigint)
                     * (100 - cast(round(l_discount * 100) as bigint))
                else 0 end) as bigint) as promo_rev_c,
       cast(sum(cast(round(l_extendedprice * 100) as bigint)
                * (100 - cast(round(l_discount * 100) as bigint)))
            as bigint) as total_rev_c
from lineitem join part on l_partkey = p_partkey
where l_shipdate >= date '1996-03-01'
  and l_shipdate < date '1996-04-01'
"""


def q_supplier_variety(sf_dir: str):
    """TPC-H Q16 shape: distinct suppliers per brand for small parts,
    EXCLUDING blocklisted suppliers (negative account balance, the
    complaints stand-in).  Both dims attach through the size-gated
    broadcast/hash path -- the small-part filter as an inner brand
    attach, the blocklist as an inner semi against the GOOD suppliers
    (unique keys + FK coverage make not-in-blocklist == in-goodlist);
    the scan emits deduped (brand, suppkey) partials so the exchange
    moves pairs, not lineitems; final distinct-count per brand."""
    width = _join_parts(sf_dir, "lineitem")

    def pairs(b: pa.Table) -> pa.Table:
        t = pa.table({"p_brand": b.column("p_brand"),
                      "s_suppkey": b.column("l_suppkey").cast(pa.int64())})
        return t.group_by(["p_brand", "s_suppkey"]).aggregate([])

    def count_distinct(g: pa.Table) -> pa.Table:
        n = len(np.unique(g.column("s_suppkey").to_numpy()))
        return pa.table({"p_brand": g.column("p_brand")[:1],
                         "supplier_cnt": pa.array([n], pa.int64())})

    li = _attach_dim(
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]),
        sf_dir, "part", fact_key="l_partkey", dim_key="p_partkey",
        columns=["p_partkey", "p_brand", "p_size"],
        row_filter=pc.field("p_size") <= 25,
        transform=lambda t: t.select(["p_partkey", "p_brand"]),
        join_width=width)
    li = _attach_dim(
        li, sf_dir, "supplier", fact_key="l_suppkey",
        dim_key="s_suppkey", columns=["s_suppkey", "s_acctbal"],
        row_filter=pc.field("s_acctbal") >= 0,
        transform=lambda t: t.select(["s_suppkey"]),
        join_width=width)
    return (li.map_batches(pairs, batch_format="pyarrow")
            .groupby("p_brand")
            .map_groups(count_distinct, batch_format="pyarrow"))


SQL_SUPPLIER_VARIETY = """
select p_brand,
       cast(count(distinct l_suppkey) as bigint) as supplier_cnt
from lineitem join part on l_partkey = p_partkey
where p_size <= 25
  and l_suppkey not in
      (select s_suppkey from supplier where s_acctbal < 0)
group by p_brand
"""


def q_bulk_promo_suppliers(sf_dir: str):
    """TPC-H Q20 shape: suppliers who shipped more than 500 units of
    PROMO-type parts during 1996 -- nested semi-join collapsed to a
    size-gated promo-part semi attach + per-supplier integer fold +
    having + size-gated name attach."""
    lo = np.datetime64("1996-01-01")
    hi = np.datetime64("1997-01-01")
    width = _join_parts(sf_dir, "lineitem")

    def li_map(b: pa.Table) -> pa.Table:
        d = b.column("l_shipdate").to_numpy()
        m = (d >= lo) & (d < hi)
        q = np.rint(b.column("l_quantity").to_numpy()[m]).astype(np.int64)
        return pa.table({
            "s_suppkey": pa.array(b.column("l_suppkey").to_numpy()[m]),
            "qty": pa.array(q, pa.int64())})

    li = _attach_dim(
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_suppkey", "l_shipdate", "l_quantity"]),
        sf_dir, "part", fact_key="l_partkey", dim_key="p_partkey",
        columns=["p_partkey", "p_type"],
        row_filter=pc.field("p_type") == "PROMO",
        transform=lambda t: t.select(["p_partkey"]), join_width=width)
    per_sup = _partial_count_sums(
        li.map_batches(li_map, batch_format="pyarrow"),
        "s_suppkey", {"qty": "promo_qty"}).filter(expr="promo_qty > 500")

    return (_attach_dim(per_sup, sf_dir, "supplier",
                        fact_key="s_suppkey", dim_key="s_suppkey",
                        columns=["s_suppkey", "s_name"],
                        join_width=width)
            .select_columns(["s_suppkey", "s_name", "promo_qty"]))


SQL_BULK_PROMO_SUPPLIERS = """
with q as (
  select l_suppkey as s_suppkey,
         cast(sum(cast(round(l_quantity) as bigint)) as bigint)
             as promo_qty
  from lineitem join part on l_partkey = p_partkey
  where p_type = 'PROMO'
    and l_shipdate >= date '1996-01-01'
    and l_shipdate < date '1997-01-01'
  group by 1)
select supplier.s_suppkey, s_name, promo_qty
from supplier join q on supplier.s_suppkey = q.s_suppkey
where promo_qty > 500
"""


# --------------------------------------------------------------------------
# CCNet-style segment-level dedup with document reconstruction: split
# each document into consecutive 8-token segments, keep each distinct
# segment's FIRST occurrence corpus-wide (ordered by doc, then position),
# and report per surviving document how much text remains.  The classic
# line-level dedup of CCNet (arXiv:1911.00359) on a corpus without
# newlines.  ONE exchange keyed by segment text: the per-segment winner
# is decided inside groupby(seg) -- no join back -- then a per-doc fold.

_SEG_TOKENS = 8
_SEG_KEYMUL = 1 << 20          # doc_id * MUL + seg_idx is injective while
                               # docs stay under 2^20 segments (128-token
                               # docs have <= 16)


def q_segment_dedup_docs(sf_dir: str):
    def segments(b: pa.Table) -> pa.Table:
        doc_ids, segs, idxs = [], [], []
        for did, text in zip(b.column("doc_id").to_pylist(),
                             b.column("text").to_pylist()):
            toks = text.split(" ")
            for i in range(0, len(toks), _SEG_TOKENS):
                segs.append(" ".join(toks[i:i + _SEG_TOKENS]))
                doc_ids.append(did)
                idxs.append(i // _SEG_TOKENS)
        first_key = (np.asarray(doc_ids, np.int64) * _SEG_KEYMUL
                     + np.asarray(idxs, np.int64))
        t = pa.table({"seg": pa.array(segs, pa.string()),
                      "first_key": pa.array(first_key, pa.int64())})
        # in-batch partial: one candidate (min first_key) per segment
        g = t.group_by(["seg"]).aggregate([("first_key", "min")])
        return pa.table({"seg": g.column("seg"),
                         "first_key": g.column("first_key_min")})

    def winner(b: pa.Table) -> pa.Table:
        # whole hash partition per call: complete segment groups -- one
        # Arrow group_by min, vectorized key decode, then an in-block
        # per-doc partial so the second exchange moves <= #docs rows
        g = b.group_by(["seg"]).aggregate([("first_key", "min")])
        fk = g.column("first_key_min").to_numpy()
        ln = pc.utf8_length(g.column("seg")).to_numpy(
            zero_copy_only=False).astype(np.int64)
        t = pa.table({"doc_id": pa.array(fk // _SEG_KEYMUL, pa.int64()),
                      "seg_chars": pa.array(ln, pa.int64())})
        g2 = t.group_by(["doc_id"]).aggregate([("seg_chars", "sum"),
                                               ([], "count_all")])
        return pa.table({"doc_id": g2.column("doc_id"),
                         "kept_segs": g2.column("count_all"),
                         "kept_chars": g2.column("seg_chars_sum")})

    def docfold(b: pa.Table) -> pa.Table:
        g = b.group_by(["doc_id"]).aggregate([("kept_segs", "sum"),
                                              ("kept_chars", "sum")])
        return pa.table({"doc_id": g.column("doc_id"),
                         "kept_segs": g.column("kept_segs_sum"),
                         "kept_chars": g.column("kept_chars_sum")})

    from ..partitions import keyed_fold

    # both exchanges ride the plan's hash strategy (keyed_fold flips it
    # plan-wide; sort-based aggregates must not be chained after it)
    width = _join_parts(sf_dir, "documents")
    kept = keyed_fold(
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(segments, batch_format="pyarrow"),
        ["seg"], winner, num_partitions=width)
    return keyed_fold(kept, ["doc_id"], docfold, num_partitions=width)


SQL_SEGMENT_DEDUP_DOCS = f"""
with toks as (
  select doc_id,
         unnest(string_split(text, ' ')) as tok,
         generate_subscripts(string_split(text, ' '), 1) as pos
  from documents),
seg as (
  select doc_id, (pos - 1) // {_SEG_TOKENS} as seg_idx,
         string_agg(tok, ' ' order by pos) as seg_text
  from toks group by 1, 2),
keep as (
  select seg_text,
         min(doc_id * {_SEG_KEYMUL} + seg_idx) as first_key
  from seg group by seg_text)
select s.doc_id,
       cast(count(*) as bigint) as kept_segs,
       cast(sum(length(s.seg_text)) as bigint) as kept_chars
from seg s
join keep k
  on s.seg_text = k.seg_text
 and s.doc_id * {_SEG_KEYMUL} + s.seg_idx = k.first_key
group by s.doc_id
"""


# --------------------------------------------------------------------------
# positional-window collocations (PMI numerators): token pairs
# co-occurring within 3 positions, with exact pair and unigram counts --
# the collocation-mining / phrase-detection role (word2vec-style window
# statistics).  Distinct from token_lift (document-level token x lang):
# this is POSITION-level, the oracle's self-join on a position band.
# Pair generation is a zero-shuffle vectorized shift (offsets 1..3 of
# the token array); in-batch Arrow partials collapse before the ONE
# keyed fold; unigram counts ride a second tiny fold and broadcast
# (vocab-bounded here; the token-keyed join alternative for open-web
# vocabularies is demonstrated in token_lift).

_COLL_WINDOW = 3
_COLL_MIN = 20


def q_collocation_pairs(sf_dir: str):
    import ray

    def pair_partial(b: pa.Table) -> pa.Table:
        la, lb = [], []
        for text in b.column("text").to_pylist():
            toks = np.asarray(text.split(" "))
            for off in range(1, _COLL_WINDOW + 1):
                if len(toks) > off:
                    la.append(toks[:-off])
                    lb.append(toks[off:])
        if not la:
            return pa.table({"tok_a": pa.array([], pa.string()),
                             "tok_b": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        t = pa.table({"tok_a": pa.array(np.concatenate(la)),
                      "tok_b": pa.array(np.concatenate(lb))})
        g = t.group_by(["tok_a", "tok_b"]).aggregate([([], "count_all")])
        return pa.table({"tok_a": g.column("tok_a"),
                         "tok_b": g.column("tok_b"),
                         "n": g.column("count_all")})

    def pair_fold(b: pa.Table) -> pa.Table:
        g = b.group_by(["tok_a", "tok_b"]).aggregate([("n", "sum")])
        t = pa.table({"tok_a": g.column("tok_a"),
                      "tok_b": g.column("tok_b"),
                      "n_pair": g.column("n_sum")})
        return t.filter(pc.greater_equal(t.column("n_pair"), _COLL_MIN))

    def uni_partial(b: pa.Table) -> pa.Table:
        toks = [t for text in b.column("text").to_pylist()
                for t in text.split(" ")]
        g = (pa.table({"tok": pa.array(toks, pa.string())})
             .group_by(["tok"]).aggregate([([], "count_all")]))
        return pa.table({"tok": g.column("tok"),
                         "n": g.column("count_all")})

    def uni_fold(b: pa.Table) -> pa.Table:
        g = b.group_by(["tok"]).aggregate([("n", "sum")])
        return pa.table({"tok": g.column("tok"),
                         "n": g.column("n_sum")})

    from ..partitions import keyed_fold

    width = _join_parts(sf_dir, "documents")
    docs = _read(sf_dir, "documents", ["text"])
    pairs = keyed_fold(
        docs.map_batches(pair_partial, batch_format="pyarrow",
                         batch_size=4_096),
        ["tok_a", "tok_b"], pair_fold, num_partitions=width)
    uni = _collect(keyed_fold(
        docs.map_batches(uni_partial, batch_format="pyarrow",
                         batch_size=4_096),
        ["tok"], uni_fold, num_partitions=width))
    tk = np.asarray(uni.column("tok").to_pylist())
    srt = np.argsort(tk)
    tk = tk[srt]
    tn = uni.column("n").to_numpy()[srt]
    uni_ref = ray.put((tk, tn))

    def attach(b: pa.Table) -> pa.Table:
        k, n = ray.get(uni_ref)
        a = np.asarray(b.column("tok_a").to_pylist())
        bb = np.asarray(b.column("tok_b").to_pylist())
        if len(a) == 0:
            return pa.table({"tok_a": b.column("tok_a"),
                             "tok_b": b.column("tok_b"),
                             "n_pair": b.column("n_pair"),
                             "n_a": pa.array([], pa.int64()),
                             "n_b": pa.array([], pa.int64())})
        return pa.table({
            "tok_a": b.column("tok_a"),
            "tok_b": b.column("tok_b"),
            "n_pair": b.column("n_pair"),
            "n_a": pa.array(n[np.searchsorted(k, a)], pa.int64()),
            "n_b": pa.array(n[np.searchsorted(k, bb)], pa.int64())})

    return pairs.map_batches(attach, batch_format="pyarrow")


SQL_COLLOCATION_PAIRS = f"""
with toks as (
  select doc_id,
         unnest(string_split(text, ' ')) as tok,
         generate_subscripts(string_split(text, ' '), 1) as pos
  from documents),
pairs as (
  select a.tok as tok_a, b.tok as tok_b,
         cast(count(*) as bigint) as n_pair
  from toks a join toks b
    on a.doc_id = b.doc_id
   and b.pos - a.pos between 1 and {_COLL_WINDOW}
  group by 1, 2
  having count(*) >= {_COLL_MIN}),
uni as (select tok, cast(count(*) as bigint) as n from toks group by tok)
select tok_a, tok_b, n_pair, ua.n as n_a, ub.n as n_b
from pairs
join uni ua on tok_a = ua.tok
join uni ub on tok_b = ub.tok
"""


# --------------------------------------------------------------------------
# nearest-neighbor temporal join + its anti-join complement, and a
# percent-of-parent hierarchy share.  The nearest join is the ASOF
# NEAREST variant (asof_join covers backward-only): each purchase pairs
# with its closest click by |dt| within a +/-24 h band, tie-broken
# (earlier click, then event id).  Day-bucket replication (x3) makes the
# band a hash-joinable key, exactly like range_join_clicks; the argmin
# collapses in ONE keyed fold.

_NEAR_BAND_US = 86_400_000_000


def _purchase_click_cands(sf_dir: str):
    """(pid, cid, adt, cts) candidate rows: purchases x clicks of the
    same user within +/-24 h, via day-bucket x3 click replication."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts",
                                  "event_type"])

    def purchases(b: pa.Table) -> pa.Table:
        m = pc.equal(b.column("event_type"), "purchase")
        t = b.filter(m)
        us = t.column("ts").to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        return pa.table({
            "pid": t.column("event_id"),
            "p_user": t.column("user_id"),
            "p_us": pa.array(us, pa.int64()),
            "bucket": pa.array(us // _NEAR_BAND_US, pa.int64())})

    def clicks(b: pa.Table) -> pa.Table:
        m = pc.equal(b.column("event_type"), "click")
        t = b.filter(m)
        us = t.column("ts").to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        base = us // _NEAR_BAND_US
        n = len(us)
        rep = np.repeat(np.arange(n), 3)
        off = np.tile(np.array([-1, 0, 1], np.int64), n)
        return pa.table({
            "cid": pa.array(t.column("event_id").to_numpy()[rep]),
            "c_user": pa.array(t.column("user_id").to_numpy()[rep]),
            "c_us": pa.array(us[rep], pa.int64()),
            "cbucket": pa.array(base[rep] + off, pa.int64())})

    p = ev.map_batches(purchases, batch_format="pyarrow")
    c = ev.map_batches(clicks, batch_format="pyarrow")
    j = p.join(c, "inner",
               num_partitions=_join_parts(sf_dir, "events"),
               on=("p_user", "bucket"), right_on=("c_user", "cbucket"))

    def band(b: pa.Table) -> pa.Table:
        dt = b.column("c_us").to_numpy() - b.column("p_us").to_numpy()
        m = np.abs(dt) <= _NEAR_BAND_US
        return pa.table({
            "pid": pa.array(b.column("pid").to_numpy()[m]),
            "cid": pa.array(b.column("cid").to_numpy()[m]),
            "adt": pa.array(np.abs(dt)[m], pa.int64()),
            "cts": pa.array(b.column("c_us").to_numpy()[m], pa.int64())})

    return j.map_batches(band, batch_format="pyarrow")


def q_nearest_click(sf_dir: str):
    def argmin_fold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"purchase_id": pa.array([], pa.int64()),
                             "click_id": pa.array([], pa.int64()),
                             "adt_us": pa.array([], pa.int64())})
        pid = b.column("pid").to_numpy()
        cid = b.column("cid").to_numpy()
        adt = b.column("adt").to_numpy()
        cts = b.column("cts").to_numpy()
        order = np.lexsort((cid, cts, adt, pid))
        first = np.ones(len(pid), bool)
        first[1:] = pid[order][1:] != pid[order][:-1]
        w = order[first]
        return pa.table({"purchase_id": pa.array(pid[w], pa.int64()),
                         "click_id": pa.array(cid[w], pa.int64()),
                         "adt_us": pa.array(adt[w], pa.int64())})

    from ..partitions import keyed_fold

    return keyed_fold(_purchase_click_cands(sf_dir), ["pid"],
                      argmin_fold,
                      num_partitions=_join_parts(sf_dir, "events"))


SQL_NEAREST_CLICK = f"""
with cand as (
  select p.event_id as pid, c.event_id as cid,
         abs(epoch_us(c.ts) - epoch_us(p.ts)) as adt,
         epoch_us(c.ts) as cts
  from events p join events c
    on p.event_type = 'purchase' and c.event_type = 'click'
   and c.user_id = p.user_id
   and abs(epoch_us(c.ts) - epoch_us(p.ts)) <= {_NEAR_BAND_US})
select pid as purchase_id, cid as click_id, adt as adt_us
from (select pid, cid, adt,
             row_number() over (partition by pid
                                order by adt, cts, cid) as rn
      from cand) t
where rn = 1
"""


def q_no_recent_click(sf_dir: str):
    """Anti-band complement: purchases with NO click by the same user
    within +/-24 h -- matched purchase ids dedup to a distinct table
    (in-batch partial + one groupby; sort strategy on purpose, because
    the left_anti join below executes under the LEFT side's captured
    context, and a keyed_fold here would flip only this side), then the
    purchases stream through a left_anti join."""
    def matched(b: pa.Table) -> pa.Table:
        return pa.table({"pid": b.column("pid")}) \
            .group_by(["pid"]).aggregate([])

    a = _agg()
    hit_partial = (_purchase_click_cands(sf_dir)
                   .map_batches(matched, batch_format="pyarrow"))

    def purchases(b: pa.Table) -> pa.Table:
        m = pc.equal(b.column("event_type"), "purchase")
        t = b.filter(m)
        return pa.table({"purchase_id": t.column("event_id"),
                         "user_id": t.column("user_id")})

    p = (_read(sf_dir, "events", ["event_id", "user_id", "event_type"])
         .map_batches(purchases, batch_format="pyarrow"))

    # the matched-id set is purchase-bounded; under the dim gate
    # (events footer) its per-block deduped partials collect straight
    # to a sorted array riding ray.put into a searchsorted anti-filter
    # -- no distinct groupby, no left_anti hash exchange; past the
    # gate the distributed dedup + join own it
    if (pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
            <= _DIM_BROADCAST_MAX_ROWS and not _FORCE_DIM_JOIN):
        import ray as _ray

        tabs = [t for t in _ray.get(
            hit_partial.materialize().to_arrow_refs()) if t.num_rows]
        pids = (np.unique(np.concatenate(
            [t.column("pid").to_numpy() for t in tabs]))
            if tabs else np.empty(0, np.int64))
        ref = _ray.put(pids)

        def anti(b: pa.Table) -> pa.Table:
            import ray as _r

            k = _r.get(ref)
            ids = b.column("purchase_id").to_numpy()
            if len(k) == 0:
                return b
            pos = np.clip(np.searchsorted(k, ids), 0, len(k) - 1)
            return b.filter(pa.array(k[pos] != ids))

        return p.map_batches(anti, batch_format="pyarrow")
    hit = (hit_partial.groupby("pid")
           .aggregate(a.Count(alias_name="_c")).drop_columns(["_c"]))
    return p.join(hit, "left_anti",
                  num_partitions=_join_parts(sf_dir, "events"),
                  on=("purchase_id",), right_on=("pid",))


SQL_NO_RECENT_CLICK = f"""
select p.event_id as purchase_id, p.user_id
from events p
where p.event_type = 'purchase'
  and not exists (
    select 1 from events c
    where c.event_type = 'click' and c.user_id = p.user_id
      and abs(epoch_us(c.ts) - epoch_us(p.ts)) <= {_NEAR_BAND_US})
"""


def q_nation_revenue_share(sf_dir: str):
    """Percent-of-parent hierarchy share: each nation's order revenue
    (exact cents) alongside its REGION's total -- the two-level rollup
    ratio, emitted as integer numerator/denominator.  One orders |x|
    customer exchange; nation->region is the broadcast dim; region
    totals derive from the 25-row nation table driver-side."""
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_regionkey"])
    nk = nation.column("n_nationkey").to_numpy()
    rk = nation.column("n_regionkey").to_numpy()
    srt = np.argsort(nk)
    nk, rk = nk[srt], rk[srt]

    def ord_map(b: pa.Table) -> pa.Table:
        p = np.rint(b.column("o_totalprice").to_numpy()
                    * 100.0).astype(np.int64)
        return pa.table({"o_custkey": b.column("o_custkey"),
                         "cents": pa.array(p, pa.int64())})

    orders = (_read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
              .map_batches(ord_map, batch_format="pyarrow"))
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    j = orders.join(cust, "inner",
                    num_partitions=_join_parts(sf_dir, "orders",
                                               "customer"),
                    on=("o_custkey",), right_on=("c_custkey",))
    per_nation = _collect(_partial_count_sums(
        j, "c_nationkey", {"cents": "nation_rev_c"}))
    nat = per_nation.column("c_nationkey").to_numpy()
    rev = per_nation.column("nation_rev_c").to_numpy()
    reg = rk[np.searchsorted(nk, nat)]
    reg_tot = {}
    for r, v in zip(reg.tolist(), rev.tolist()):
        reg_tot[r] = reg_tot.get(r, 0) + v
    return pa.table({
        "c_nationkey": pa.array(nat, pa.int64()),
        "n_regionkey": pa.array(reg.astype(np.int64), pa.int64()),
        "nation_rev_c": pa.array(rev, pa.int64()),
        "region_rev_c": pa.array([reg_tot[r] for r in reg.tolist()],
                                 pa.int64())})


SQL_NATION_REVENUE_SHARE = """
with nat as (
  select cast(c_nationkey as bigint) as c_nationkey,
         cast(n_regionkey as bigint) as n_regionkey,
         cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint)
             as nation_rev_c
  from orders
  join customer on o_custkey = c_custkey
  join nation on c_nationkey = n_nationkey
  group by 1, 2)
select c_nationkey, n_regionkey, nation_rev_c,
       cast(sum(nation_rev_c) over (partition by n_regionkey) as bigint)
           as region_rev_c
from nat
"""


SQL_CHECKED = {
    "pricing_summary": (q_pricing_summary, SQL_PRICING_SUMMARY),
    "reclassify_bins": (q_reclassify_bins, SQL_RECLASSIFY),
    "region_customers": (q_region_customers, SQL_REGION_CUSTOMERS),
    "zonal_group_stats": (q_zonal_group_stats, SQL_ZONAL_GROUP_STATS),
    "cell_assignment": (q_cell_assignment, SQL_CELL_ASSIGNMENT),
    "knn_min_dist": (q_knn_min_dist, SQL_KNN_MIN_DIST),
    "exact_dedup_docs": (q_exact_dedup_docs, SQL_EXACT_DEDUP_DOCS),
    "ngram_jaccard_docs": (q_ngram_jaccard_docs, SQL_NGRAM_JACCARD_DOCS),
    "distinct_customers": (q_distinct_customers, SQL_DISTINCT_CUSTOMERS),
    "explode_tokens": (q_explode_tokens, SQL_EXPLODE_TOKENS),
    "sessionize": (q_sessionize, SQL_SESSIONIZE),
    "tumbling_window": (q_tumbling_window, SQL_TUMBLING_WINDOW),
    "watermark_window": (q_watermark_window, SQL_WATERMARK_WINDOW),
    "watermark_hopping": (q_watermark_hopping, SQL_WATERMARK_HOPPING),
    "watermark_sessions": (q_watermark_sessions, SQL_WATERMARK_SESSIONS),
    "watermark_join": (q_watermark_join, SQL_WATERMARK_JOIN),
    "topk_orders": (q_topk_orders, SQL_TOPK_ORDERS),
    "filter_project": (q_filter_project, SQL_FILTER_PROJECT),
    "buffer_bbox_area": (q_buffer_bbox_area, SQL_BUFFER_BBOX_AREA),
    "join_orders_lineitem": (q_join_orders_lineitem,
                             SQL_JOIN_ORDERS_LINEITEM),
    "customers_without_orders": (q_customers_without_orders,
                                 SQL_CUSTOMERS_WITHOUT_ORDERS),
    "global_minmax": (q_global_minmax, SQL_GLOBAL_MINMAX),
    "token_stats_by_lang": (q_token_stats_by_lang, SQL_TOKEN_STATS_BY_LANG),
    "boilerplate_ngrams": (q_boilerplate_ngrams, SQL_BOILERPLATE_NGRAMS),
    "contamination_check": (q_contamination_check, SQL_CONTAMINATION_CHECK),
    "long_docs_by_source": (q_long_docs_by_source, SQL_LONG_DOCS_BY_SOURCE),
    "ann_topk": (q_ann_topk, SQL_ANN_TOPK),
    "cosine_pairs": (q_cosine_pairs, SQL_COSINE_PAIRS),
    "hopping_window": (q_hopping_window, SQL_HOPPING_WINDOW),
    "asof_join": (q_asof_join, SQL_ASOF_JOIN),
    "range_join_clicks": (q_range_join_clicks, SQL_RANGE_JOIN_CLICKS),
    "cell_cover": (q_cell_cover, SQL_CELL_COVER),
    "hash_sample": (q_hash_sample, SQL_HASH_SAMPLE),
    "stratified_sample": (q_stratified_sample, SQL_STRATIFIED_SAMPLE),
    "rank_orders": (q_rank_orders, SQL_RANK_ORDERS),
    "moving_max": (q_moving_max, SQL_MOVING_MAX),
    "cumsum_orders": (q_cumsum_orders, SQL_CUMSUM_ORDERS),
    "lag_events": (q_lag_events, SQL_LAG_EVENTS),
    "quantiles_by_flag": (q_quantiles_by_flag, SQL_QUANTILES_BY_FLAG),
    "rollup_counts": (q_rollup_counts, SQL_ROLLUP_COUNTS),
    "status_intersect": (q_status_intersect, SQL_STATUS_INTERSECT),
    "props_extract": (q_props_extract, SQL_PROPS_EXTRACT),
    "pivot_priority": (q_pivot_priority, SQL_PIVOT_PRIORITY),
    "tfidf_terms": (q_tfidf_terms, SQL_TFIDF_TERMS),
    "latest_event": (q_latest_event, SQL_LATEST_EVENT),
    "mode_per_flag": (q_mode_per_flag, SQL_MODE_PER_FLAG),
    "status_except": (q_status_except, SQL_STATUS_EXCEPT),
    "nation_orders": (q_nation_orders, SQL_NATION_ORDERS),
    "corr_qty_price": (q_corr_qty_price, SQL_CORR_QTY_PRICE),
    "monthly_orders": (q_monthly_orders, SQL_MONTHLY_ORDERS),
    "norm_text_dedup": (q_norm_text_dedup, SQL_NORM_TEXT_DEDUP),
    "dedup_components": (q_dedup_components, SQL_DEDUP_COMPONENTS),
    "langid_docs": (q_langid_docs, SQL_LANGID_DOCS),
    "quality_filter": (q_quality_filter, SQL_QUALITY_FILTER),
    "ntile_price": (q_ntile_price, SQL_NTILE_PRICE),
    "chunk_docs": (q_chunk_docs, SQL_CHUNK_DOCS),
    "bloom_semi_join": (q_bloom_semi_join, SQL_BLOOM_SEMI_JOIN),
    "monthly_revenue": (q_monthly_revenue, SQL_MONTHLY_REVENUE),
    "price_histogram": (q_price_histogram, SQL_PRICE_HISTOGRAM),
    "mad_quantity": (q_mad_quantity, SQL_MAD_QUANTITY),
    "region_nations_agg": (q_region_nations_agg, SQL_REGION_NATIONS_AGG),
    "quad_rollup": (q_quad_rollup, SQL_QUAD_ROLLUP),
    "quad_compact": (q_quad_compact, SQL_QUAD_COMPACT),
    "heavy_hitters": (q_heavy_hitters, SQL_HEAVY_HITTERS),
    "substring_dedup": (q_substring_dedup, SQL_SUBSTRING_DEDUP),
    "funnel_steps": (q_funnel_steps, SQL_FUNNEL_STEPS),
    "repetition_docs": (q_repetition_docs, SQL_REPETITION_DOCS),
    "top_bigram_docs": (q_top_bigram_docs, SQL_TOP_BIGRAM_DOCS),
    "seasonal_decompose": (q_seasonal_decompose, SQL_SEASONAL_DECOMPOSE),
    "ewma_user_value": (q_ewma_user_value, SQL_EWMA_USER_VALUE),
    "session_paths": (q_session_paths, SQL_SESSION_PATHS),
    "mutual_info_type_hour": (q_mutual_info, SQL_MUTUAL_INFO),
    "customer_order_counts": (q_customer_order_counts,
                              SQL_CUSTOMER_ORDER_COUNTS),
    "cube_counts": (q_cube_counts, SQL_CUBE_COUNTS),
    "typo_pairs": (q_typo_pairs, SQL_TYPO_PAIRS),
    "unpivot_metrics": (q_unpivot_metrics, SQL_UNPIVOT_METRICS),
    "order_status_outer": (q_order_status_outer, SQL_ORDER_STATUS_OUTER),
    "quantile_cont_flag": (q_quantile_cont_flag, SQL_QUANTILE_CONT_FLAG),
    "semi_join_native": (q_semi_join_native, SQL_SEMI_JOIN_NATIVE),
    "cell_neighbors": (q_cell_neighbors, SQL_CELL_NEIGHBORS),
    "pagerank_suppliers": (q_pagerank_suppliers, SQL_PAGERANK_SUPPLIERS),
    "resample_events": (q_resample_events, SQL_RESAMPLE_EVENTS),
    "winsorize_prices": (q_winsorize_prices, SQL_WINSORIZE_PRICES),
    "temperature_sample_docs": (q_temperature_sample_docs,
                                SQL_TEMPERATURE_SAMPLE_DOCS),
    "bfs_hops": (q_bfs_hops, SQL_BFS_HOPS),
    "graph_sssp": (q_graph_sssp, SQL_GRAPH_SSSP),
    "triangle_count": (q_triangle_count, SQL_TRIANGLE_COUNT),
    "interval_coverage": (q_interval_coverage, SQL_INTERVAL_COVERAGE),
    "basket_brand_pairs": (q_basket_brand_pairs, SQL_BASKET_BRAND_PAIRS),
    "status_string_agg": (q_status_string_agg, SQL_STATUS_STRING_AGG),
    "token_lift": (q_token_lift, SQL_TOKEN_LIFT),
    "topk_per_group": (q_topk_per_group, SQL_TOPK_PER_GROUP),
    "merge_changelog": (q_merge_changelog, SQL_MERGE_CHANGELOG),
    "scd2_intervals": (q_scd2_intervals, SQL_SCD2_INTERVALS),
    "event_transitions": (q_event_transitions, SQL_EVENT_TRANSITIONS),
    "regr_by_flag": (q_regr_by_flag, SQL_REGR_BY_FLAG),
    "pct_rank_events": (q_pct_rank_events, SQL_PCT_RANK_EVENTS),
    "epoch_shuffle": (q_epoch_shuffle, SQL_EPOCH_SHUFFLE),
    "mix_sources": (q_mix_sources, SQL_MIX_SOURCES),
    "share_of_month": (q_share_of_month, SQL_SHARE_OF_MONTH),
    "bm25_docs": (q_bm25_docs, SQL_BM25_DOCS),
    "gaps_islands": (q_gaps_islands, SQL_GAPS_ISLANDS),
    "zscore_anomalies": (q_zscore_anomalies, SQL_ZSCORE_ANOMALIES),
    "spearman_qty_discount": (q_spearman_qty_discount,
                              SQL_SPEARMAN_QTY_DISCOUNT),
    "skyline_orders": (q_skyline_orders, SQL_SKYLINE_ORDERS),
    "pii_redact": (q_pii_redact, SQL_PII_REDACT),
    "hexbin_customers": (q_hexbin_customers, SQL_HEXBIN_CUSTOMERS),
    "kernel_density": (q_kernel_density, SQL_KERNEL_DENSITY),
    "range_frame_sum": (q_range_frame_sum, SQL_RANGE_FRAME_SUM),
    "late_events": (q_late_events, SQL_LATE_EVENTS),
    "embedding_gram": (q_embedding_gram, SQL_EMBEDDING_GRAM),
    "kcore_customers": (q_kcore_customers, SQL_KCORE_CUSTOMERS),
    "retention_cohorts": (q_retention_cohorts, SQL_RETENTION_COHORTS),
    "local_supplier_volume": (q_local_supplier_volume,
                              SQL_LOCAL_SUPPLIER_VOLUME),
    "priority_sla": (q_priority_sla, SQL_PRIORITY_SLA),
    "division_customers": (q_division_customers, SQL_DIVISION_CUSTOMERS),
    "gini_revenue": (q_gini_revenue, SQL_GINI_REVENUE),
    "bit_flags_events": (q_bit_flags_events, SQL_BIT_FLAGS_EVENTS),
    "benford_prices": (q_benford_prices, SQL_BENFORD_PRICES),
    "top_revenue_supplier": (q_top_revenue_supplier,
                             SQL_TOP_REVENUE_SUPPLIER),
    "small_qty_revenue": (q_small_qty_revenue, SQL_SMALL_QTY_REVENUE),
    "large_orders": (q_large_orders, SQL_LARGE_ORDERS),
    "disjunctive_revenue": (q_disjunctive_revenue,
                            SQL_DISJUNCTIVE_REVENUE),
    "late_sole_supplier": (q_late_sole_supplier,
                           SQL_LATE_SOLE_SUPPLIER),
    "idle_rich_customers": (q_idle_rich_customers,
                            SQL_IDLE_RICH_CUSTOMERS),
    "cheapest_supplier_per_part": (q_cheapest_supplier_per_part,
                                   SQL_CHEAPEST_SUPPLIER_PER_PART),
    "nation_pair_volume": (q_nation_pair_volume,
                           SQL_NATION_PAIR_VOLUME),
    "returned_revenue_topk": (q_returned_revenue_topk,
                              SQL_RETURNED_REVENUE_TOPK),
    "promo_revenue_share": (q_promo_revenue_share,
                            SQL_PROMO_REVENUE_SHARE),
    "supplier_variety": (q_supplier_variety, SQL_SUPPLIER_VARIETY),
    "bulk_promo_suppliers": (q_bulk_promo_suppliers,
                             SQL_BULK_PROMO_SUPPLIERS),
    "segment_dedup_docs": (q_segment_dedup_docs, SQL_SEGMENT_DEDUP_DOCS),
    "collocation_pairs": (q_collocation_pairs, SQL_COLLOCATION_PAIRS),
    "nearest_click": (q_nearest_click, SQL_NEAREST_CLICK),
    "no_recent_click": (q_no_recent_click, SQL_NO_RECENT_CLICK),
    "nation_revenue_share": (q_nation_revenue_share,
                             SQL_NATION_REVENUE_SHARE),
}
