#!/usr/bin/env python3
"""Per-key bench drift attribution (r13 verdict item #6).

Usage: python3 tools/bench_drift.py <new_bench.json> <old_bench.json> [out]

Compares two Bench JSON lines key-by-key, buckets the drift, and writes a
drift artifact: total delta, the worst regressions/improvements, and a
class attribution (keys whose engine/oracle rendering changed this round
vs untouched keys — untouched-key drift is box noise by construction,
since the bytecode is identical).
"""
import sys, json

new_p, old_p = sys.argv[1], sys.argv[2]
out_p = sys.argv[3] if len(sys.argv) > 3 else "/tmp/bench_drift.json"
changed_keys = set((sys.argv[4] if len(sys.argv) > 4 else
                    "q_skew_join,q_skew_join_aqe,q_join_range,"
                    "q_join_range_bucketed,q_profile").split(","))


def load(p):
    # Either a raw Bench stdout log (one line carrying "queries") or a
    # driver BENCH_rN.json artifact whose "tail" string EMBEDS that line.
    for line in open(p):
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            return json.loads(line)
    d = json.load(open(p))
    if "tail" in d:
        # The tail may truncate the bench line at either end. raw_decode
        # parses the first balanced JSON object and ignores trailing data
        # (r14 ADVICE: a naive json.loads raises on anything after the
        # object, and the not-found path returned None, crashing later).
        t = d["tail"]
        i = t.find('{"metric"')
        if i < 0:  # front-truncated: rebuild from the queries object on
            j = t.find('"queries"')
            if j < 0:
                raise SystemExit(f"no bench line found in {p} (tail has no "
                                 '"metric"/"queries" marker)')
            t, i = "{" + t[j:], 0
        try:
            obj, _ = json.JSONDecoder().raw_decode(t[i:])
        except json.JSONDecodeError as e:
            raise SystemExit(f"bench line in {p} is not parseable JSON: {e}")
        if "queries" not in obj:
            raise SystemExit(f"bench object in {p} carries no per-key "
                             f"queries map (keys: {sorted(obj)})")
        return obj
    raise SystemExit(f"no bench line in {p}")


new, old = load(new_p), load(old_p)
qn, qo = new["queries"], old["queries"]
common = sorted(set(qn) & set(qo))
rows = {k: {"old": qo[k], "new": qn[k],
            "ratio": round(qn[k] / qo[k], 3) if qo[k] else None,
            "changed_this_round": k in changed_keys}
        for k in common}
tot_new = sum(qn[k] for k in common)
tot_old = sum(qo[k] for k in common)
reg = sorted(((v["ratio"], k) for k, v in rows.items()
              if v["ratio"] and v["old"] >= 0.2), reverse=True)
imp = sorted((v["ratio"], k) for k, v in rows.items()
             if v["ratio"] and v["old"] >= 0.2)
chg = [k for k in common if k in changed_keys]
unchanged_drift = (sum(qn[k] for k in common if k not in changed_keys) /
                   max(1e-9, sum(qo[k] for k in common if k not in changed_keys)))
changed_drift = (sum(qn[k] for k in chg) / max(1e-9, sum(qo[k] for k in chg))) if chg else None
report = {
    "_meta": {
        "round": 15,
        "total_new_sec": round(tot_new, 1), "total_old_sec": round(tot_old, 1),
        "total_ratio": round(tot_new / tot_old, 4),
        "keys": len(common),
        "changed_keys_ratio": changed_drift and round(changed_drift, 4),
        "unchanged_keys_ratio": round(unchanged_drift, 4),
        "attribution": ("unchanged keys run identical bytecode, so their aggregate "
                        "ratio is the box-noise floor for this run; anything the "
                        "changed-keys ratio shows beyond it is the real cost of the "
                        "round's code changes"),
        "worst_regressions": [{"key": k, "ratio": r} for r, k in reg[:8]],
        "best_improvements": [{"key": k, "ratio": r} for r, k in imp[:8]],
    },
    "per_key": rows,
}
json.dump(report, open(out_p, "w"), indent=1, sort_keys=True)
m = report["_meta"]
print(f"total {m['total_old_sec']}s -> {m['total_new_sec']}s (x{m['total_ratio']}); "
      f"changed-keys x{m['changed_keys_ratio']}, unchanged x{m['unchanged_keys_ratio']}")
