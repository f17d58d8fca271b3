#!/usr/bin/env python3
"""Local differential harness mirroring the driver's correctness gate:
run Verify's parquet dumps against the DuckDB oracle SQL and compare.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]
"""
import sys, os, json, math
import duckdb

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        pq = os.path.join(out_dir, name)
        if not os.path.isdir(pq):
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM '{pq}/*.parquet'").fetch_arrow_table()
            duck_df = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: exec error: {str(e)[:200]}")
            n_fail += 1
            continue
        ok, msg = compare(spark_df, duck_df)
        if ok:
            print(f"PASS {name} ({spark_df.num_rows} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: {msg}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)

def compare(a, b):
    acols, bcols = sorted(a.column_names), sorted(b.column_names)
    if acols != bcols:
        return False, f"columns differ: spark={acols} duck={bcols}"
    at = {f.name: str(f.type) for f in a.schema}
    bt = {f.name: str(f.type) for f in b.schema}
    dtypes = [(c, at[c], bt[c]) for c in acols if at[c] != bt[c]]
    if dtypes:
        return False, f"dtypes differ (driver hash may be strict): {dtypes}"
    if a.num_rows != b.num_rows:
        return False, f"row count: spark={a.num_rows} duck={b.num_rows}"
    for cname in acols:
        av = a.column(cname).to_pylist()
        bv = b.column(cname).to_pylist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if not eq(x, y):
                return False, (f"col {cname} row {i}: spark={x!r} duck={y!r}"
                               + diffstat(av, bv))
    return True, ""

def eq(x, y):
    if x is None or y is None:
        return x is None and y is None
    if isinstance(x, float) and isinstance(y, float):
        if math.isnan(x) and math.isnan(y):
            return True
        return x == y
    if isinstance(x, (int, float)) and isinstance(y, (int, float)):
        return float(x) == float(y)
    return x == y

def diffstat(av, bv):
    try:
        diffs = [abs(float(x) - float(y)) for x, y in zip(av, bv)
                 if x is not None and y is not None]
        n = sum(1 for x, y in zip(av, bv) if not eq(x, y))
        return f" (maxdiff={max(diffs):.3g}, ndiff={n}/{len(av)})"
    except (TypeError, ValueError):
        n = sum(1 for x, y in zip(av, bv) if not eq(x, y))
        return f" (ndiff={n}/{len(av)})"

if __name__ == "__main__":
    main()
