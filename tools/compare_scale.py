#!/usr/bin/env python3
"""Compare a scaled-board bench JSON line against a x1 baseline line.

Usage: compare_scale.py <x1_log_or_json> <xN_log_or_json> <N> [slow_threshold]
Accepts raw Bench logs (finds the {"metric":...} line) or plain JSON.
Prints total ratio, median per-query ratio, and the worst offenders
relative to the scale factor N.
"""
import json, re, sys, statistics

def load(path):
    txt = open(path, errors="replace").read()
    m = None
    for mm in re.finditer(r'\{"metric".*\}', txt):
        m = mm
    if not m:
        raise SystemExit(f"no bench JSON line in {path}")
    return json.loads(m.group(0))

a = load(sys.argv[1]); b = load(sys.argv[2]); n = float(sys.argv[3])
thr = float(sys.argv[4]) if len(sys.argv) > 4 else n
qa, qb = a["queries"], b["queries"]
common = sorted(set(qa) & set(qb))
ratios = {k: qb[k] / qa[k] if qa[k] > 0 else float("inf") for k in common}
ta, tb = sum(qa[k] for k in common), sum(qb[k] for k in common)
print(f"queries compared: {len(common)}  x1 total {ta:.1f}s  xN total {tb:.1f}s  "
      f"ratio {tb/ta:.2f}x  median {statistics.median(ratios.values()):.2f}x")
over = {k: r for k, r in ratios.items() if r > thr}
print(f"over {thr:.0f}x ({len(over)}):")
for k, r in sorted(over.items(), key=lambda kv: -kv[1]):
    print(f"  q{k}: {qa[k]:.2f}s -> {qb[k]:.2f}s = {r:.1f}x")
top = sorted(common, key=lambda k: -qb[k])[:15]
print("slowest xN rows:")
for k in top:
    print(f"  q{k}: {qb[k]:.2f}s ({ratios[k]:.1f}x)")
print("errors x1:", a.get("errors"), " xN:", b.get("errors"))
