#!/usr/bin/env python3
"""Compare two Bench JSON lines (e.g. x1 vs x5 scale runs).

Usage: compare_bench.py A.json B.json [ratio_threshold]
Prints total ratio, median/p90 per-query ratio, and every query whose
B/A ratio exceeds the threshold (default 3.0), sorted by ratio.
"""
import json, sys, statistics

def norm(queries):
    """Key-normalize a per-query map: old stdout lines used short keys
    ("104", "29b"), BENCH_FULL.json uses full names ("q104_pagerank").
    Reduce both to the bare query number so cross-round compares work
    (review round-12: a full-vs-short compare had zero common keys and
    crashed on median([])). Colliding short keys keep their FULL names
    (mirroring Bench's own ambiguous-set logic) instead of silently
    overwriting each other — a collision compared to the wrong twin
    would report a bogus ratio (advice round-12)."""
    shorts = {}
    for k in queries:
        shorts.setdefault(k.split("_")[0].lstrip("q"), []).append(k)
    out = {}
    for short, names in shorts.items():
        if len(names) == 1:
            out[short] = queries[names[0]]
        else:
            for k in names:
                out[k] = queries[k]
    return out

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 3.0
qa, qb = norm(a["queries"]), norm(b["queries"])
common = [k for k in qa if k in qb and qa[k] > 0]
if not common:
    sys.exit("no common query keys between the two inputs")
ratios = {k: qb[k] / qa[k] for k in common}
rs = sorted(ratios.values())
print(f"total: {a['value']} -> {b['value']} ({b['value']/a['value']:.2f}x)  "
      f"queries: {len(common)}  errors A={a['errors']} B={b['errors']}")
print(f"per-query ratio: median {statistics.median(rs):.2f}x  "
      f"p90 {rs[int(len(rs)*0.9)]:.2f}x  max {rs[-1]:.2f}x")
over = sorted(((v, k) for k, v in ratios.items() if v > thr), reverse=True)
for v, k in over:
    print(f"  {k}: {qa[k]:.3f} -> {qb[k]:.3f}  ({v:.1f}x)")
if not over:
    print(f"  (no query above {thr}x)")
