#!/usr/bin/env python3
"""Compare alternating pinned-commit A/B bench runs (round 16 drift
attribution). Reads the jsonl ab_bench.sh appends (one line per run:
{"tree": ..., "line": {"metric":"total_full","queries":{...}}}) and prints:
  - per-tree per-run totals (raw and like-for-like over the shared queries),
  - the per-query min-of-runs delta table, worst drifters first,
  - the run-to-run band per tree (how much same-code noise the machine has).
Usage: ab_compare.py /tmp/ab_results.jsonl
"""
import json
import sys
from collections import defaultdict


def main(path):
    runs = defaultdict(list)  # tree -> [ {query: sec} ]
    for line in open(path):
        line = line.strip()
        if not line:
            continue
        rec = json.loads(line)
        runs[rec["tree"]].append(rec["line"]["queries"])
    trees = sorted(runs)
    if len(trees) != 2:
        sys.exit(f"expected 2 trees, got {trees}")
    a, b = trees
    shared = set.intersection(*(set(q) for t in trees for q in runs[t]))
    print(f"trees: A={a} ({len(runs[a])} runs), B={b} ({len(runs[b])} runs)")
    print(f"shared queries: {len(shared)}")
    for t in trees:
        for i, q in enumerate(runs[t]):
            raw = sum(q.values())
            lfl = sum(v for k, v in q.items() if k in shared)
            print(f"  {t} run{i + 1}: total={raw:7.2f}s like-for-like={lfl:7.2f}s")
    # min over runs per query (the bench's own estimator)
    mins = {}
    for t in trees:
        mins[t] = {q: min(r[q] for r in runs[t]) for q in shared}
    sa = sum(mins[a].values())
    sb = sum(mins[b].values())
    print(f"\nmin-of-runs like-for-like: A={sa:.2f}s  B={sb:.2f}s  "
          f"B/A={sb / sa:.3f}")
    # run-to-run band per tree: spread of like-for-like totals
    for t in trees:
        tot = [sum(v for k, v in r.items() if k in shared) for r in runs[t]]
        print(f"  {t} like-for-like run spread: min={min(tot):.2f} "
              f"max={max(tot):.2f} (band {max(tot) - min(tot):.2f}s)")
    deltas = sorted(((mins[b][q] - mins[a][q], q) for q in shared), reverse=True)
    print("\nper-query min-of-runs delta (B - A), worst 15:")
    for d, q in deltas[:15]:
        print(f"  {q:28s} A={mins[a][q]:6.3f}  B={mins[b][q]:6.3f}  d={d:+.3f}")
    print("best 5 (B faster):")
    for d, q in deltas[-5:]:
        print(f"  {q:28s} A={mins[a][q]:6.3f}  B={mins[b][q]:6.3f}  d={d:+.3f}")


if __name__ == "__main__":
    main(sys.argv[1])
