#!/usr/bin/env python3
"""Compare two Bench JSON outputs: per-query ratios over the shared query
set, median/p90, and every query slower than a threshold in the new run.

Usage: compare_bench.py <old.json> <new.json> [ratio_threshold=2.0]
"""
import sys, json

old = json.load(open(sys.argv[1]))["queries"]
new = json.load(open(sys.argv[2]))["queries"]
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0

shared = sorted(set(old) & set(new))
ratios = []
for q in shared:
    a, b = old[q], new[q]
    if a is None or b is None or a <= 0 or b <= 0:
        continue
    ratios.append((b / a, q, a, b))
ratios.sort()
n = len(ratios)
if n == 0:
    print("no shared queries with valid timings — nothing to compare")
    print(f"new-only queries: {sorted(set(new) - set(old))}")
    sys.exit(0)
med = ratios[n // 2][0]
p90 = ratios[int(n * 0.9)][0]
print(f"shared={n} median={med:.2f}x p90={p90:.2f}x")
print(f"new-only queries: {sorted(set(new) - set(old))}")
slow = [r for r in ratios if r[0] >= thr]
for r, q, a, b in slow:
    print(f"SLOW {q}: {a:.2f}s -> {b:.2f}s ({r:.1f}x)")
fast = [r for r in ratios if r[0] <= 1 / thr]
for r, q, a, b in fast[:10]:
    print(f"FAST {q}: {a:.2f}s -> {b:.2f}s ({r:.2f}x)")
