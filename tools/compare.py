#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [onlyKeys] [jsonOut]

onlyKeys (optional): comma-separated key names — restricts the compare
to a subset so slow oracles (quadratic brute-force pair CTEs at bench
scale) can run sharded across processes. Pass "-" for the full surface.

jsonOut (optional): path to write a driver-shaped correctness JSON
({key: {rows_match, schema_match, hash_match, spark_rows, oracle_rows,
err}}) — used to assemble CORRECTNESS_x10_r11.json from sharded runs.

For each key in <verifyOutDir>/oracle_sql.json:
  - read the Spark result parquet from <verifyOutDir>/<key>/
  - run the oracle SQL in DuckDB against views over <sfDir>/*.parquet
  - sort columns by name, compare row counts, column names, and values
    (exact; report near-miss stats when values differ)
"""
import sys, json, glob, math, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# Above this row count the pandas string-sort compare is too heavy (at the
# x97 mirror some keys emit ~10M rows); switch to an in-DuckDB multiset
# compare (EXCEPT ALL both ways on native values) — same strictness, bounded
# memory. Tunable for experiments via COMPARE_BIG_ROWS.
BIG_ROWS = int(os.environ.get("COMPARE_BIG_ROWS", "2000000"))


def big_compare(con, name, sql, spark_glob, rec):
    """Multiset-exact compare entirely inside DuckDB for big outputs.

    Column names are checked first, then both sides are projected in
    sorted-column-name order and diffed with EXCEPT ALL in both
    directions — NULLs compare equal under set-op semantics, values
    compare exactly (no string formatting involved). EXCEPT coerces
    dtype widths (int32/int64), so the DuckDB-reported column types of
    both projections are compared separately and recorded as a
    type_match flag (type_diff lists the offenders)."""
    sdesc = con.execute(f"SELECT * FROM '{spark_glob}' LIMIT 0").description
    odesc = con.execute(f"SELECT * FROM ({sql}) LIMIT 0").description
    scols, ocols = [d[0] for d in sdesc], [d[0] for d in odesc]
    if sorted(scols) != sorted(ocols):
        rec["err"] = f"columns spark={sorted(scols)} duck={sorted(ocols)}"
        return False
    # EXCEPT ALL coerces integer widths, so an int32-vs-int64 schema
    # regression would pass silently on exactly the large keys; surface
    # the dtype comparison the pandas path does as an explicit flag.
    stypes = {d[0]: str(d[1]) for d in sdesc}
    otypes = {d[0]: str(d[1]) for d in odesc}
    rec["type_match"] = stypes == otypes
    if not rec["type_match"]:
        diff = {c: (stypes[c], otypes[c]) for c in stypes
                if stypes.get(c) != otypes.get(c)}
        rec["type_diff"] = {c: f"spark={a} duck={b}" for c, (a, b) in diff.items()}
    rec["schema_match"] = True
    cols = ", ".join(f'"{c}"' for c in sorted(scols))
    con.execute(f"CREATE OR REPLACE TEMP VIEW _sp AS SELECT {cols} FROM '{spark_glob}'")
    con.execute(f"CREATE OR REPLACE TEMP VIEW _or AS SELECT {cols} FROM ({sql})")
    n_s = con.execute("SELECT count(*) FROM _sp").fetchone()[0]
    n_o = con.execute("SELECT count(*) FROM _or").fetchone()[0]
    rec["spark_rows"], rec["oracle_rows"] = n_s, n_o
    if n_s != n_o:
        rec["err"] = f"rows spark={n_s} duck={n_o}"
        return False
    rec["rows_match"] = True
    d1 = con.execute(
        "SELECT count(*) FROM (SELECT * FROM _sp EXCEPT ALL SELECT * FROM _or)").fetchone()[0]
    d2 = con.execute(
        "SELECT count(*) FROM (SELECT * FROM _or EXCEPT ALL SELECT * FROM _sp)").fetchone()[0]
    if d1 or d2:
        rec["err"] = f"multiset diff: spark-only={d1} oracle-only={d2}"
        return False
    rec["hash_match"] = True
    return True

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

def connect(sf):
    """Fresh DuckDB connection with env-tuned settings and fixture views.

    Extracted so a key whose oracle dies on an allocator/IO failure
    (OOM past COMPARE_MEM, temp disk exhausted) doesn't poison the
    shard: DuckDB leaves such a connection permanently failing every
    later allocation ("bad allocation" on 8 KB blocks with 100 GB
    free), so the loop reconnects and the remaining keys grade
    normally.
    """
    con = duckdb.connect()
    # Sharded big-mirror runs put 4-6 compare processes on one box; cap
    # each one's DuckDB parallelism so shards share instead of thrash.
    if os.environ.get("COMPARE_THREADS"):
        con.execute(f"SET threads={int(os.environ['COMPARE_THREADS'])}")
    # Mirror-scale fan-out joins (q5/cbo at x97: ~1e11 probe rows) need a
    # real memory budget or DuckDB spills its build sides to temp and can
    # exhaust the disk; optionally pin the textual left-deep join order
    # when the optimizer's fan-out misestimate picks a materializing plan.
    # Spill location must be PER PROCESS unconditionally: concurrent
    # shards sharing the default cwd/.tmp corrupt each other (one shard's
    # cleanup deletes another's live blocks -> "Cannot open file
    # ...block") even when no explicit memory_limit is set, since any
    # shard can spill under its default budget.
    con.execute(f"SET temp_directory='.tmp-compare-{os.getpid()}'")
    if os.environ.get("COMPARE_MEM"):
        con.execute(f"SET memory_limit='{os.environ['COMPARE_MEM']}'")
    if os.environ.get("COMPARE_DISABLED_OPT"):
        con.execute(f"SET disabled_optimizers='{os.environ['COMPARE_DISABLED_OPT']}'")
    for t in TABLES:
        # Fixture tables are single files; Spark-written mirrors (MakeMirror)
        # are directories of part files — glob those. Table-subset mirrors
        # (the ×970 relational fifth-decade one) carry only the tables
        # their keys read — skip the rest, so any key that DOES reference
        # a missing table fails its own row instead of the whole run.
        path = f"{sf}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        elif not os.path.exists(path):
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def main():
    sf, out = sys.argv[1], sys.argv[2]
    con = connect(sf)
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    if len(sys.argv) > 3 and sys.argv[3] != "-":
        keep = set(sys.argv[3].split(","))
        oracle = {k: v for k, v in oracle.items() if k in keep}
    json_out = sys.argv[4] if len(sys.argv) > 4 else None
    report = {}
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        rec = {"rows_match": False, "schema_match": False, "hash_match": False,
               "spark_rows": None, "oracle_rows": None, "err": None}
        report[name] = rec
        try:
            files = glob.glob(f"{out}/{name}/*.parquet")
            if not files:
                rec["err"] = "no spark output"
                print(f"FAIL {name}: no spark output"); n_fail += 1; continue
            spark_glob = f"{out}/{name}/*.parquet"
            n_quick = con.execute(
                f"SELECT count(*) FROM '{spark_glob}'").fetchone()[0]
            if n_quick > BIG_ROWS:
                ok = big_compare(con, name, sql, spark_glob, rec)
                if ok:
                    print(f"PASS {name} ({rec['spark_rows']} rows, duckdb multiset path)")
                    n_pass += 1
                else:
                    print(f"FAIL {name}: {rec['err']}"); n_fail += 1
                continue
            sdf = con.execute(f"SELECT * FROM '{spark_glob}'").fetchdf()
            ddf = con.execute(sql).fetchdf()
        except Exception as e:
            rec["err"] = f"{type(e).__name__}: {e}"
            print(f"FAIL {name}: {type(e).__name__}: {e}"); n_fail += 1
            if type(e).__name__ in ("OutOfMemoryException", "IOException",
                                    "InternalException", "FatalException"):
                try: con.close()
                except Exception: pass
                # poisoned allocator — see connect(); the reconnect itself
                # can fail while the dying process-level allocator is still
                # holding pages, so retry with a short backoff instead of
                # crashing the shard (the x970 run lost 13 keys to that).
                for backoff in (1, 5, 15):
                    try:
                        con = connect(sf)
                        break
                    except Exception:
                        import time
                        time.sleep(backoff)
                else:
                    con = connect(sf)  # final attempt; raising here is fatal anyway
            continue
        sdf, ddf = norm(sdf), norm(ddf)
        rec["spark_rows"], rec["oracle_rows"] = len(sdf), len(ddf)
        if list(sdf.columns) != list(ddf.columns):
            rec["err"] = f"columns spark={list(sdf.columns)} duck={list(ddf.columns)}"
            print(f"FAIL {name}: {rec['err']}")
            n_fail += 1; continue
        rec["schema_match"] = True
        if len(sdf) != len(ddf):
            rec["err"] = f"rows spark={len(sdf)} duck={len(ddf)}"
            print(f"FAIL {name}: {rec['err']}"); n_fail += 1; continue
        rec["rows_match"] = True
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
            rec["err"] = "; ".join(bad[:4])
            print(f"FAIL {name}: " + "; ".join(bad[:4])); n_fail += 1
        else:
            rec["hash_match"] = True
            print(f"PASS {name} ({len(sdf)} rows)"); n_pass += 1
    if json_out:
        json.dump(report, open(json_out, "w"), indent=1)
    print(f"\n{n_pass} pass, {n_fail} fail, {len(oracle)} oracled")

if __name__ == "__main__":
    main()
