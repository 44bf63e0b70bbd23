#!/usr/bin/env python3
"""Reconcile the sf1 full-board run against the ScaleProbe predictions:
for every query with a measured 10x-replication probe ratio in SCALING.md,
compare the observed sf1/sf0.1 ratio (sf0.1 = min of the r8a/r8b boards)
and flag any family whose observed ratio exceeds probe_ratio * 1.5.

Usage: reconcile_sf1.py <BENCH_full_sf1.json> <r8a.json> <r8b.json> <SCALING.md>
"""
import sys, json, re

sf1 = json.load(open(sys.argv[1]))["queries"]
a = json.load(open(sys.argv[2]))["queries"]
b = json.load(open(sys.argv[3]))["queries"]
scaling = open(sys.argv[4]).read()

# probe rows appear as markdown tables: | q_name | base | scaled | ratio |
probe = {}
for m in re.finditer(r"\|\s*(q_\w+)\s*\|\s*[\d.]+\s*\|\s*[\d.]+\s*\|\s*([\d.]+)\s*\|", scaling):
    probe[m.group(1)] = float(m.group(2))  # later tables override earlier

if not probe:
    print("no probe rows parsed from SCALING.md — nothing to reconcile")
    sys.exit(0)

# NOTE on rep asymmetry: the sf0.1 baseline is a MIN over two boards,
# while the sf1 side is often a single rep (SPARK_GRAFT_BENCH_REPS=1
# for wall-clock). min-of-2 vs 1-rep biases observed ratios UPWARD by
# roughly the run-to-run noise (~10-20% on sub-second queries), so a
# marginal flag near the 1.5x slack should be re-measured warm (two
# sf1 reps of just that query via QueryTime) before adjudication.
flagged, checked = [], 0
for q, pr in sorted(probe.items()):
    if q not in sf1 or q not in a:
        continue
    base = min(a[q], b.get(q, a[q]))
    if base <= 0 or sf1[q] is None or sf1[q] <= 0:
        continue
    obs = sf1[q] / base
    checked += 1
    status = "FLAG" if obs > pr * 1.5 else "ok"
    if status == "FLAG":
        flagged.append((q, base, sf1[q], obs, pr))
print(f"probed families checked: {checked}; flagged (obs > probe*1.5): {len(flagged)}")
if checked == 0:
    print("no probed family present in all boards — nothing to reconcile")
    sys.exit(0)
print("(sf0.1 base is min-of-2; a 1-rep sf1 board biases ratios up by "
      "run noise — re-measure marginal flags warm before adjudicating)")
for q, base, s1, obs, pr in sorted(flagged, key=lambda x: -x[3] / x[4]):
    print(f"FLAG {q}: sf0.1={base:.2f}s sf1={s1:.2f}s obs={obs:.1f}x probe={pr:.1f}x")

# also: overall board stats + slowest sf1 queries
vals = [(v, k) for k, v in sf1.items() if v and v > 0]
vals.sort(reverse=True)
tot = sum(v for v, _ in vals)
print(f"\nsf1 board: {len(vals)} queries, total {tot:.0f}s; slowest:")
for v, k in vals[:15]:
    base = min(a.get(k, 9e9), b.get(k, 9e9))
    r = v / base if base < 9e9 and base > 0 else float("nan")
    print(f"  {k}: {v:.1f}s ({r:.1f}x of sf0.1)")
