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

# q3: top-10 revenue groups of the inflated 3-way join — each group's 4dp
# integer revenue is exactly N x the 1x group's, rounded once at the end
# (same rounding the engine applies AFTER the DECIMAL merge).
q3 = con.execute("""
  WITH j AS (
    SELECT l_orderkey, o_orderdate, o_orderpriority,
      sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev4
    FROM 'SF/lineitem.parquet' l
    JOIN 'SF/orders.parquet' o ON l_orderkey = o_orderkey
    JOIN 'SF/customer.parquet' c ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3)
  SELECT l_orderkey, o_orderdate, o_orderpriority, CAST(rev4 AS HUGEINT) FROM j
""".replace("SF", sf)).fetchall()
q3rows = [{"l_orderkey": int(ok), "o_orderdate": str(od), "o_orderpriority": pr,
           "revenue": (((int(r4) * factor) + 50) // 100) / 100.0}
          for ok, od, pr, r4 in q3]
q3exp = sorted(q3rows, key=lambda r: (-r["revenue"], r["l_orderkey"]))[:10]

# q5: 25 nation groups, widePartials closed form.
q5 = con.execute("""
  SELECT r_name, n_name,
    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS HUGEINT) AS rev4,
    count(*) AS n
  FROM 'SF/lineitem.parquet' l
  JOIN 'SF/orders.parquet' o ON l_orderkey = o_orderkey
  JOIN 'SF/customer.parquet' c ON o_custkey = c_custkey
  JOIN 'SF/supplier.parquet' s ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  JOIN 'SF/nation.parquet' n ON s_nationkey = n_nationkey
  JOIN 'SF/region.parquet' r ON n_regionkey = r_regionkey
  GROUP BY 1, 2 ORDER BY 1, 2
""".replace("SF", sf)).fetchall()
q5exp = {(rn, nn): {"revenue": (((int(r4) * factor) + 50) // 100) / 100.0,
                    "n_lines": int(n) * factor}
         for rn, nn, r4, n in q5}

got, got3, got5, checks, meta = {}, [], {}, [], []
for line in open(engine_jsonl):
    line = line.strip()
    if not line or not line.startswith("{"):
        continue
    d = json.loads(line)
    if "decade_probe" in d:
        meta.append(d["decade_probe"])
    elif d.get("probe", "").startswith("q1"):
        got[(d["l_returnflag"], d["l_linestatus"])] = d
    elif d.get("probe", "").startswith("q3"):
        got3.append(d)
    elif d.get("probe", "").startswith("q5"):
        got5[(d["r_name"], d["n_name"])] = d
    elif "check" in d:
        checks.append(d)  # the window probes' self-verified rows

report, n_pass, n_fail = {}, 0, 0
if got:
    for k, exp in sorted(expected.items()):
        g = got.get(k)
        rec = {"expected": exp, "got": {c: g and g.get(c) for c in exp}, "match": False}
        if g and all(g.get(c) == exp[c] for c in exp):
            rec["match"] = True
            n_pass += 1
        else:
            n_fail += 1
        report[f"q1 {k[0]}/{k[1]}"] = rec
    missing = set(got) - set(expected)
    n_fail += len(missing)

if got3:
    for i, exp in enumerate(q3exp):
        g = got3[i] if i < len(got3) else None
        # timestamps render ISO "1997-12-31T00:00" (JVM LocalDateTime) vs
        # "1997-12-31 00:00:00" (DuckDB); o_orderdate is day-resolution,
        # so compare the date prefix
        rec = {"expected": exp, "got": g, "match": g is not None and all(
            (str(g.get(c))[:10] == str(exp[c])[:10] if c == "o_orderdate"
             else g.get(c) == exp[c])
            for c in exp)}
        n_pass += rec["match"]; n_fail += not rec["match"]
        report[f"q3 rank{i+1}"] = rec

if got5:
    for k, exp in sorted(q5exp.items()):
        g = got5.get(k)
        rec = {"expected": exp, "got": g and {c: g.get(c) for c in exp},
               "match": g is not None and all(g.get(c) == exp[c] for c in exp)}
        n_pass += rec["match"]; n_fail += not rec["match"]
        report[f"q5 {k[0]}/{k[1]}"] = rec
    n_fail += len(set(got5) - set(q5exp))

for c in checks:  # first_wins / sessionize self-checks, folded for the record
    n_pass += bool(c.get("ok")); n_fail += not c.get("ok")
    report[c["probe"]] = c

report["_meta"] = {"factor": factor, "pass": n_pass, "fail": n_fail,
                   "engine": meta,
                   "what": ("sixth-decade probes: q1/q3/q5 exact-integer closed forms "
                            f"(x{factor} lazily-inflated copies, Python-int scaled 1x "
                            "HUGEINT sums) + the window probes' self-verified rows")}
json.dump(report, open(out_path, "w"), indent=1, sort_keys=True)
print(f"{out_path}: {n_pass} pass, {n_fail} fail")
sys.exit(1 if n_fail else 0)
