#!/usr/bin/env python3
"""Representation-level differential check, stricter than check.py.

Emulates a driver that reads the Spark parquet with pyarrow/pandas
(decimals stay Decimal, timestamps keep tz) but fetches the DuckDB
oracle via .df() (decimals coerce to float64, timestamps naive), then
hashes the STRING rendering of every cell. Catches value-equal but
representation-different outputs (DECIMAL vs DOUBLE, +00:00 suffixes,
-0.0 vs 0.0) that check.py's numeric compare accepts.

Usage: python3 tools/strictcheck.py <sfDir> <outDir> [query ...]
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import pyarrow.parquet as pq


def norm(v):
    # date32-from-arrow renders as datetime.date while DuckDB's pandas
    # bridge yields midnight Timestamps; the driver accepts that pair
    # (fn_temporal passed r2), so normalize dates to Timestamp here.
    import datetime
    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        return pd.Timestamp(v)
    return v


def render(df):
    cols = sorted(df.columns)
    out = []
    for c in cols:
        out.append([repr(norm(v)) for v in df[c].tolist()])
    return cols, out


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
        files = sorted(glob.glob(os.path.join(out_dir, name, "*.parquet")))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = pd.concat(
                [pq.read_table(f).to_pandas() for f in files],
                ignore_index=True)
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: exec error: {str(e)[:200]}")
            n_fail += 1
            continue
        scols, sv = render(spark_df)
        dcols, dv = render(duck_df)
        if scols != dcols:
            print(f"FAIL {name}: columns spark={scols} duck={dcols}")
            n_fail += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
            n_fail += 1
            continue
        bad = None
        for c, a, b in zip(scols, sv, dv):
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    bad = f"col {c} row {i}: spark={x} duck={y}"
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: {bad}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
