"""Oracle parity for the round-2 relational operator batch: each new
query family (CDC latest-per-key, mode, EXCEPT, star join, distributed
exact correlation, calendar distinct-count, text-normalization dedup) is
compared row-for-row against its DuckDB oracle at sf0.001 — the same
compare the driver's correctness gate runs."""

import duckdb
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("orders", "lineitem", "customer", "nation", "events",
          "documents", "supplier", "part", "embeddings")

NEW_QUERIES = ["latest_event", "mode_per_flag", "status_except",
               "nation_orders", "corr_qty_price", "monthly_orders",
               "norm_text_dedup", "dedup_components", "langid_docs",
               "quality_filter", "ntile_price", "chunk_docs",
               "bloom_semi_join", "boilerplate_ngrams", "contamination_check",
               "cumsum_orders", "lag_events", "quad_rollup", "quad_compact",
               "heavy_hitters", "substring_dedup", "funnel_steps",
               "repetition_docs", "customer_order_counts", "cube_counts",
               "typo_pairs", "unpivot_metrics", "order_status_outer",
               "quantile_cont_flag", "semi_join_native", "cell_neighbors",
               "pagerank_suppliers", "resample_events", "winsorize_prices",
               "temperature_sample_docs", "bfs_hops", "triangle_count",
               "interval_coverage", "basket_brand_pairs",
               "status_string_agg", "token_lift", "topk_per_group",
               "merge_changelog", "scd2_intervals", "event_transitions",
               "range_frame_sum", "late_events", "embedding_gram",
               "kcore_customers", "division_customers", "gini_revenue",
               "bit_flags_events", "benford_prices", "top_bigram_docs",
               "seasonal_decompose", "ewma_user_value", "session_paths",
               "mutual_info_type_hour", "top_revenue_supplier",
               "small_qty_revenue", "large_orders", "disjunctive_revenue",
               "late_sole_supplier", "idle_rich_customers",
               "cheapest_supplier_per_part", "nation_pair_volume",
               "returned_revenue_topk", "promo_revenue_share",
               "supplier_variety", "bulk_promo_suppliers",
               "segment_dedup_docs", "collocation_pairs",
               "nearest_click", "no_recent_click",
               "nation_revenue_share"]


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


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_query_matches_oracle(ray_session, oracle_con, name):
    from balrog_ray.relational.queries import SQL_CHECKED

    fn, sql = SQL_CHECKED[name]
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


def test_customer_order_counts_both_paths(ray_session):
    """The broadcast sorted-lookup path and the distributed left_outer
    hash-join fallback produce identical results (the size gate must not
    change semantics)."""
    from balrog_ray.relational.queries import q_customer_order_counts

    import duckdb

    sf = "/root/testdata/sf0.01"
    fast = (q_customer_order_counts(sf).to_pandas()
            .sort_values("c_custkey").reset_index(drop=True))
    slow = (q_customer_order_counts(sf, broadcast_limit=0).to_pandas()
            .sort_values("c_custkey").reset_index(drop=True))
    assert fast.equals(slow)
    n_cust, n_f = duckdb.sql(
        f"select (select count(*) from '{sf}/customer.parquet'),"
        f" (select count(*) from '{sf}/orders.parquet'"
        f"  where o_orderstatus = 'F')").fetchone()
    assert len(fast) == n_cust                  # every customer, outer side
    assert int(fast["n_orders"].sum()) == n_f   # counts conserve
    assert (fast["n_orders"] == 0).any()        # unmatched keys exercised
