#!/bin/bash
# Round-20 pinned alternating A/B (VERDICT r19 item 1): the six rebalanced
# paths the driver's r19 run regressed (q_bm25_topk 0.76x, q_percentile
# 0.82x, q_text_redact 0.72x, q_text_tokens 0.73x, q_text_quality 0.64x,
# q_decontaminate_fuzzy 0.74x) get their rebalance dropped in tree B; the
# shingle/aggregate winners ride along as controls (q_dedup_ngram,
# q_dedup_clean, q1_agg must stay flat — they share shingleFrame /
# Rebalance.smallInput with the reverted sites).
# Trees: A=/tmp/wt_r19f (1a2d91b, r19 final), B=/tmp/wt_r20a (5885e75).
# Alternating focused runs, REPS=6 min-per-query, 4 rounds each.
# usage: ab_r20.sh OUT_JSONL   (worktrees pre-compiled)
set -e
OUT="$1"
A=/tmp/wt_r19f; B=/tmp/wt_r20a
export SPARK_GRAFT_ONLY=q_bm25_topk,q_percentile,q_text_redact,q_text_tokens,q_text_quality,q_decontaminate_fuzzy,q_dedup_ngram,q_dedup_clean,q1_agg
export SPARK_GRAFT_REPS=6
for i in 1 2 3 4; do
  bash /root/repo/tools/ab_bench.sh "$A" "$OUT"
  bash /root/repo/tools/ab_bench.sh "$B" "$OUT"
done
echo AB_R20_DONE
