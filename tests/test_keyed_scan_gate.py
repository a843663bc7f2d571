"""The key-cardinality-gated per-key scan (queries._keyed_scan) must
produce identical results on BOTH plans: sort-based
groupby().map_groups (keys under the gate -- what every sandbox SF
exercises) and the keyed_fold hash exchange (past the gate).  These
tests force the fold plan by patching _SCAN_KEYS_GATE to -1 and re-run
the DuckDB oracle compare, so an SF bump that flips the gate cannot
change semantics (the _FORCE_DIM_JOIN pattern applied to the scan
family)."""

import duckdb
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("orders", "lineitem", "customer", "nation", "region",
          "events", "documents", "supplier", "part", "embeddings")

# a representative slice of the 22 _keyed_scan consumers: user- and
# customer-keyed, plain scans, partial-emitting folds, union inputs
SCANNED = ["sessionize", "rank_orders", "cumsum_orders", "lag_events",
           "latest_event", "funnel_steps", "ewma_user_value",
           "session_paths", "resample_events", "status_string_agg",
           "topk_per_group", "merge_changelog", "scd2_intervals",
           "event_transitions", "pct_rank_events", "gaps_islands",
           "range_frame_sum", "late_events", "division_customers",
           "retention_cohorts", "interval_coverage", "moving_max"]


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


@pytest.mark.parametrize("name", SCANNED)
def test_forced_fold_path_matches_oracle(ray_session, oracle_con,
                                         monkeypatch, name):
    from balrog_ray.relational import queries

    monkeypatch.setattr(queries, "_SCAN_KEYS_GATE", -1)
    fn, sql = queries.SQL_CHECKED[name]
    result = fn(SF_DIR)
    import ray
    import ray.data

    if isinstance(result, ray.data.Dataset):
        tabs = [t for t in ray.get(result.to_arrow_refs())
                if t.num_rows]
        got = pa.concat_tables(tabs, promote_options="permissive") \
            if tabs else pa.table({})
    else:
        got = result
    want = oracle_con.execute(sql).fetch_arrow_table()
    assert got.num_rows == want.num_rows, name
    gc, gr = _canonical(got)
    wc, wr = _canonical(want)
    assert gc == wc, name
    assert gr == wr, name
