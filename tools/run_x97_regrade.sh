#!/usr/bin/env bash
# Re-grade the r13 cents-hardened money keys at the FOURTH decade (the
# ×97 mirror): their engine AND oracle renderings changed, so the r12
# x97 rows for them describe the old raw-double code. One Verify dump of
# just these keys + one DuckDB compare; fold the overrides over
# CORRECTNESS_x97_r12.json into CORRECTNESS_x97_r13-shaped output.
#
# Usage: tools/run_x97_regrade.sh [outJson]  (default /tmp/x97_regrade.json)
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/x97_regrade.json}
ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
CP="${GATE_CLASSES:-target/scala-2.13/classes}:/opt/spark/jars/*"

KEYS=q3_join_topk,q_sessionize,q_tumbling_window,q_sliding_window,q_resample,q_skew_join,q_skew_join_aqe,q_incremental_agg,q_source_csv,q_source_json,q_source_orc,q_source_dirty_csv,q_source_dirty_json,q_compact_roundtrip,q_vacuum_orphans,q_snapshot_diff,q_delete_where,q_retention_sweep,q_bucketed_join,q_zorder_scan

[ -f target/mirror_x97/_GRAFT_MIRROR.json ] || \
  MIRROR_SRC=/root/testdata/sf0.1 MIRROR_FACTOR=97 MIRROR_OUT=target/mirror_x97 \
  java $ADD_OPENS -Xmx32g -cp "$CP" graft.tools.MakeMirror

SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$KEYS" SPARK_GRAFT_NO_COALESCE=1 \
  java $ADD_OPENS -Xmx64g -cp "$CP" graft.Verify target/mirror_x97 target/verify_x97r13

COMPARE_THREADS=16 COMPARE_MEM=40GB python3 -u tools/compare.py \
  target/mirror_x97 target/verify_x97r13 "$KEYS" /tmp/x97rg_cmp.json

python3 tools/fold_x97.py "$OUT" \
  "fourth-decade regrade of the r13 cents-hardened keys (engine+oracle both moved to exact integer cents); all other rows inherited from CORRECTNESS_x97_r12; tools/run_x97_regrade.sh" \
  CORRECTNESS_x97_r12.json /tmp/x97rg_cmp.json
