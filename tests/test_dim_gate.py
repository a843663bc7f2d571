"""The size-gated dimension attach (queries._attach_dim/_attach_small)
must produce identical results on BOTH paths: the broadcast searchsorted
lookup (dim under the gate) and the distributed hash Dataset.join (dim
past the gate).  These tests force the join path via the module's
_FORCE_DIM_JOIN hook and re-run the oracle compare -- the same gate the
driver runs -- so a future SF bump that flips the gate cannot change
semantics (VERDICT r3 item 1)."""

import duckdb
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("orders", "lineitem", "customer", "nation", "region",
          "events", "documents", "supplier", "part", "embeddings")

# every round-4 _attach_dim consumer with a SQL oracle
GATED = ["top_revenue_supplier", "small_qty_revenue",
         "basket_brand_pairs", "disjunctive_revenue",
         "late_sole_supplier", "nation_pair_volume",
         "promo_revenue_share", "supplier_variety",
         "bulk_promo_suppliers", "local_supplier_volume",
         "zscore_anomalies", "bloom_semi_join", "gini_revenue",
         "returned_revenue_topk", "token_lift"]


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _canonical(tab: pa.Table):
    cols = sorted(tab.column_names)
    rows = []
    for i in range(tab.num_rows):
        row = []
        for c in cols:
            v = tab.column(c)[i].as_py()
            if isinstance(v, float):
                v = round(v, 9)
            row.append(str(v))
        rows.append(tuple(row))
    return cols, sorted(rows)


@pytest.mark.parametrize("name", GATED)
def test_forced_join_path_matches_oracle(ray_session, oracle_con,
                                         monkeypatch, name):
    from balrog_ray.relational import queries

    monkeypatch.setattr(queries, "_FORCE_DIM_JOIN", True)
    fn, sql = queries.SQL_CHECKED[name]
    result = fn(SF_DIR)
    import ray
    import ray.data

    if isinstance(result, ray.data.Dataset):
        tabs = [t for t in ray.get(result.to_arrow_refs()) if t.num_rows]
        got = pa.concat_tables(tabs) if tabs else pa.table({})
    else:
        got = result
    want = oracle_con.execute(sql).arrow()
    g_cols, g_rows = _canonical(got)
    w_cols, w_rows = _canonical(want)
    assert g_cols == w_cols
    assert g_rows == w_rows
    assert got.num_rows == want.num_rows and got.num_rows > 0


def test_no_unconditional_sf_dim_reads():
    """No query may read an SF-growing table (part/supplier/customer/
    orders/lineitem/documents/events/embeddings) wholly onto the driver
    with pq.read_table -- only the constant-size nation/region dims are
    exempt (bounded seed reads go through rows_only._head_rows, which
    reads one row group)."""
    import inspect

    from balrog_ray.relational import queries, rows_only

    for mod in (queries, rows_only):
        src = inspect.getsource(mod)
        for line in src.splitlines():
            if ("pq.read_table" not in line
                    or line.lstrip().startswith("#")):
                continue
            assert not any(f"{t}.parquet" in line
                           for t in ("part", "supplier", "customer",
                                     "orders", "lineitem", "documents",
                                     "events", "embeddings")), (
                f"unconditional driver read of an SF-growing table "
                f"in {mod.__name__}: {line}")
