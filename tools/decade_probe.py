#!/usr/bin/env python3
"""Oracle for the sixth-decade probe (tools/DecadeProbe.scala).

Usage: python3 tools/decade_probe.py <engine_jsonl> <sfDir> <factor> [out]

The engine streams N value-identical lineitem copies through the full
q1 partial/merge pipeline (5.8B rows at N=9700). Because every quantity
the probe sums is EXACT INTEGER arithmetic (cents / 4dp / 6dp integer
partials; quantities are integral doubles), the N-copy oracle has a
closed form: Sigma_N = N * Sigma_1 as exact integers, then the identical
integer-space rounding. DuckDB computes Sigma_1 in HUGEINT and this
script scales + rounds in Python int (arbitrary precision), so the
expected values are exact at ANY factor — no 5.8B-row oracle scan
needed, and no approximation is involved anywhere. The engine result
must match to the last bit of the emitted doubles.
"""
import sys, json
import duckdb

engine_jsonl, sf, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
out_path = sys.argv[4] if len(sys.argv) > 4 else "/tmp/decade_probe.json"

con = duckdb.connect()
con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'")
one = con.execute("""
  SELECT l_returnflag, l_linestatus,
    CAST(sum(CAST(l_quantity AS BIGINT)) AS HUGEINT) AS qty,
    sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS pc,
    sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev4,
    sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      * (100 - CAST(round(l_discount * 100) AS BIGINT))
      * (100 + CAST(round(l_tax * 100) AS BIGINT))) AS rev6,
    count(*) AS n
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'
  GROUP BY 1, 2 ORDER BY 1, 2""").fetchall()

expected = {}
for rf, ls, qty, pc, rev4, rev6, n in one:
    qN, pcN = int(qty) * factor, int(pc) * factor
    r4N, r6N, nN = int(rev4) * factor, int(rev6) * factor, int(n) * factor
    expected[(rf, ls)] = {
        "sum_qty": float(qN),                      # integral, exact in double
        "sum_base_price": pcN / 100.0,             # exact cents / 100
        "sum_disc_price": ((r4N + 50) // 100) / 100.0,
        "sum_charge": ((r6N + 5000) // 10000) / 100.0,
        "count_order": nN,
    }

got, meta = {}, None
for line in open(engine_jsonl):
    line = line.strip()
    if not line or not line.startswith("{"):
        continue
    d = json.loads(line)
    if "decade_probe" in d:
        meta = d["decade_probe"]
    elif "probe" in d:
        got[(d["l_returnflag"], d["l_linestatus"])] = d

report, n_pass, n_fail = {}, 0, 0
for k, exp in sorted(expected.items()):
    g = got.get(k)
    rec = {"expected": exp, "got": {c: g and g.get(c) for c in exp}, "match": False}
    if g and all(g.get(c) == exp[c] for c in exp):
        rec["match"] = True
        n_pass += 1
    else:
        n_fail += 1
    report[f"{k[0]}/{k[1]}"] = rec
missing = set(got) - set(expected)
report["_meta"] = {"factor": factor, "groups": len(expected),
                   "pass": n_pass, "fail": n_fail + len(missing),
                   "engine": meta,
                   "what": ("sixth-decade probe: q1 partial/merge arithmetic over "
                            f"{factor} lazily-inflated lineitem copies vs the exact "
                            "closed-form integer oracle")}
json.dump(report, open(out_path, "w"), indent=1, sort_keys=True)
print(f"{out_path}: {n_pass} pass, {n_fail + len(missing)} fail / {len(expected)} groups")
sys.exit(1 if n_fail or missing else 0)
