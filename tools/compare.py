#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [onlyKeys]

onlyKeys (optional): comma-separated key names — restricts the compare
to a subset so slow oracles (quadratic brute-force pair CTEs at bench
scale) can run sharded across processes.

For each key in <verifyOutDir>/oracle_sql.json:
  - read the Spark result parquet from <verifyOutDir>/<key>/
  - run the oracle SQL in DuckDB against views over <sfDir>/*.parquet
  - sort columns by name, compare row counts, column names, and values
    (exact; report near-miss stats when values differ)
"""
import sys, json, glob, math
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df):
    # Sort columns by name AND rows by all columns (as the driver gate
    # does) — positional compare must not depend on parquet glob order.
    df = df[sorted(df.columns)]
    if len(df.columns):
        key = [df[c].astype(str) for c in df.columns]
        import pandas as pd
        order = pd.DataFrame({i: k for i, k in enumerate(key)}).sort_values(
            list(range(len(key)))).index
        df = df.loc[order].reset_index(drop=True)
    return df

def main():
    sf, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    if len(sys.argv) > 3:
        keep = set(sys.argv[3].split(","))
        oracle = {k: v for k, v in oracle.items() if k in keep}
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            files = glob.glob(f"{out}/{name}/*.parquet")
            if not files:
                print(f"FAIL {name}: no spark output"); n_fail += 1; continue
            sdf = con.execute(f"SELECT * FROM '{out}/{name}/*.parquet'").fetchdf()
            ddf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}"); n_fail += 1; continue
        sdf, ddf = norm(sdf), norm(ddf)
        if list(sdf.columns) != list(ddf.columns):
            print(f"FAIL {name}: columns spark={list(sdf.columns)} duck={list(ddf.columns)}")
            n_fail += 1; continue
        if len(sdf) != len(ddf):
            print(f"FAIL {name}: rows spark={len(sdf)} duck={len(ddf)}"); n_fail += 1; continue
        bad = []
        for c in sdf.columns:
            a, b = sdf[c], ddf[c]
            try:
                if str(a.dtype) != str(b.dtype):
                    bad.append(f"{c}: dtype {a.dtype} vs {b.dtype}")
                eq = (a == b) | (a.isna() & b.isna())
                if not eq.all():
                    i = (~eq).idxmax()
                    bad.append(f"{c}: {int((~eq).sum())} diffs, first row {i}: {a[i]!r} vs {b[i]!r}")
            except Exception as e:
                bad.append(f"{c}: compare error {e}")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad[:4])); n_fail += 1
        else:
            print(f"PASS {name} ({len(sdf)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(oracle)} oracled")

if __name__ == "__main__":
    main()
