"""Local emulation of the driver's correctness gate: run every queries()
entry and compare against oracle_sql() via DuckDB (row count + schema +
order-insensitive values).  Usage: python tools/check_oracle.py [sf_dir]
"""

import os

# single-threaded BLAS before numpy loads (see bench.py rationale)
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")

import sys
import time

sys.path.insert(0, ".")


def to_arrow(result):
    import pandas as pd
    import pyarrow as pa

    import ray.data

    if isinstance(result, ray.data.Dataset):
        tables = result.to_arrow_refs()
        import ray as _r
        tabs = [t for t in _r.get(tables)]
        return pa.concat_tables(tabs, promote_options="permissive") \
            if tabs else pa.table({})
    if isinstance(result, pd.DataFrame):
        return pa.Table.from_pandas(result)
    return result


def canonical(tab):
    """Sort columns by name, rows by all values, as strings (rounded)."""
    import pyarrow as pa

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


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] if len(sys.argv) > 2 else None
    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"create view {t} as select * from "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_arrow(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: ray error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"rows-only {name}: {got.num_rows} rows in {dt:.1f}s")
            continue
        exp = con.execute(sqls[name]).arrow()
        gc, gr = canonical(got)
        ec, er = canonical(exp)
        ok = (gc == ec) and (gr == er)
        status = "ok" if ok else "MISMATCH"
        print(f"{status} {name}: {got.num_rows} vs {exp.num_rows} rows, "
              f"{dt:.1f}s")
        if ok:
            n_pass += 1
        else:
            n_fail += 1
            if gc != ec:
                print(f"   cols: ray={gc} sql={ec}")
            else:
                diff = [x for x in gr if x not in set(er)][:3]
                diff2 = [x for x in er if x not in set(gr)][:3]
                print(f"   ray-only rows: {diff}")
                print(f"   sql-only rows: {diff2}")
    print(f"\n{n_pass} ok, {n_fail} failed")
    ray.shutdown()


if __name__ == "__main__":
    main()
