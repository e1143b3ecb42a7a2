#!/bin/bash
# Round-19 A/B attribution: q_bm25_batch 4.66 -> 5.44 s in BENCH_r18 — the
# one query whose operator round 18 touched (max-df scoring-salt width).
# The r18 diff's extra aggregate runs ONLY in the fallback regime and the
# bench shape takes the broadcast regime, so the prediction is "plan no-op
# == phase"; the protocol measures instead of arguing. q_semantic_dedup_incr
# (+0.81 s, UNTOUCHED in r18) rides along as the phase control.
# Trees: /tmp/wt_r17f = dabf473 (r17 final), /tmp/wt_r18f = fe5c7f6 (r18
# final). Alternating focused runs so machine phase hits both trees
# symmetrically, REPS=6 min-per-query, then JobCountProbe
# job/task/task-time parity (the current 5-poll-stability drain, layered
# first so both trees run the identical probe).
# usage: ab_r19.sh OUT_JSONL PROBE_OUT  (worktrees pre-compiled)
set -e
OUT="$1"; PROBE_OUT="$2"
A=/tmp/wt_r17f; B=/tmp/wt_r18f
export SPARK_GRAFT_ONLY=q_bm25_batch,q_semantic_dedup_incr
export SPARK_GRAFT_REPS=6
for i in 1 2 3 4; do
  bash /root/repo/tools/ab_bench.sh "$A" "$OUT"
  bash /root/repo/tools/ab_bench.sh "$B" "$OUT"
done
ADDOPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
         java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens $p=ALL-UNNAMED"
done
for rep in 1 2; do
  for TREE in "$A" "$B"; do
    (cd "$TREE" && java $ADDOPENS -Xmx8g \
      -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      -cp "/tmp/probe_cls_r19:$TREE/target/scala-2.13/classes:/opt/spark/jars/*" \
      graft.JobCountProbe q_bm25_batch q_semantic_dedup_incr 2>/dev/null \
      | sed "s#^#$TREE #") >> "$PROBE_OUT"
  done
done
echo AB_R19_DONE
