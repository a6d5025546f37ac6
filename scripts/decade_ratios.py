#!/usr/bin/env python3
"""Per-query decade-ratio report between two Bench records.

Usage:
    python3 scripts/decade_ratios.py BENCH_LOCAL_sf1_r15.json BENCH_LOCAL_sf10_full_r15.json [threshold]

Prints every query's (lo, hi, ratio) sorted by ratio descending and
flags ratios above the threshold (default 15 — the "needs a fix or a
documented envelope" line for a 10x data step). Queries missing on
either side are listed separately so a silent drop can't read as a
pass.
"""
import sys, json

lo_path, hi_path = sys.argv[1], sys.argv[2]
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 15.0
lo = json.load(open(lo_path))["queries"]
hi = json.load(open(hi_path))["queries"]

shared = sorted(set(lo) & set(hi))
only_lo = sorted(set(lo) - set(hi))
only_hi = sorted(set(hi) - set(lo))

rows = []
for q in shared:
    a, b = lo[q], hi[q]
    if a < 0 or b < 0:
        rows.append((float("inf"), q, a, b))
    else:
        rows.append((b / max(a, 1e-9), q, a, b))
rows.sort(reverse=True)

flagged = 0
print(f"{'query':32s} {'lo(s)':>8s} {'hi(s)':>8s} {'ratio':>7s}")
for r, q, a, b in rows:
    mark = " <-- OVER" if r > thr else ""
    if mark:
        flagged += 1
    print(f"{q:32s} {a:8.2f} {b:8.2f} {r:7.2f}{mark}")
if only_lo:
    print(f"\nmissing from {hi_path}: {', '.join(only_lo)}")
if only_hi:
    print(f"missing from {lo_path}: {', '.join(only_hi)}")
tot_lo = sum(v for v in lo.values() if v >= 0)
tot_hi = sum(v for v in hi.values() if v >= 0)
print(f"\ntotals: lo {tot_lo:.1f} s, hi {tot_hi:.1f} s; {len(shared)} shared; {flagged} over {thr}x")
