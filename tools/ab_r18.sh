#!/bin/bash
# Round-18 A/B attribution (r17 verdict Next #1): q_heavy_hitters
# (0.74 -> 1.36 s) and q_embedding_neardup (0.55 -> 1.19 s) — the two
# touched-code deltas the r17 driver bench flagged. Same protocol that
# caught the real q_semantic_dedup_incr regression in r17: two PINNED
# worktrees (de5c294 = r16 tree, dabf473 = r17/HEAD tree), alternating
# focused bench runs so machine phase hits both trees symmetrically,
# REPS=6 min-per-query, then JobCountProbe job/task/task-time parity
# (mechanism-level metrics that don't jitter with phase).
# usage: ab_r18.sh OUT_JSONL PROBE_OUT  (worktrees pre-compiled)
set -e
OUT="$1"; PROBE_OUT="$2"
R16=/tmp/wt_r16; R17=/tmp/wt_r17
export SPARK_GRAFT_ONLY=q_heavy_hitters,q_embedding_neardup
export SPARK_GRAFT_REPS=6
for i in 1 2 3 4; do
  bash /root/repo/tools/ab_bench.sh "$R16" "$OUT"
  bash /root/repo/tools/ab_bench.sh "$R17" "$OUT"
done
ADDOPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
         java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens $p=ALL-UNNAMED"
done
# /tmp/probe_cls holds ONLY the r18 polling-drain JobCountProbe classes:
# layered FIRST so both trees run the identical (race-free) probe; every
# other class resolves from the pinned tree.
for rep in 1 2; do
  for TREE in "$R16" "$R17"; do
    (cd "$TREE" && java $ADDOPENS -Xmx8g \
      -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      -cp "/tmp/probe_cls:$TREE/target/scala-2.13/classes:/opt/spark/jars/*" \
      graft.JobCountProbe q_heavy_hitters q_embedding_neardup 2>/dev/null \
      | sed "s#^#$TREE #") >> "$PROBE_OUT"
  done
done
echo AB_R18_DONE
