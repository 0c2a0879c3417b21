#!/usr/bin/env python3
"""Summarize the full-registry two-decade sweep: per-query sf10/sf1 ratios,
totals, medians, and the >3x tail, from target/bench_fullreg_{sf1,sf10}.json
(written by tools/sf_fullreg_sweep.sh). Dev-only reporting tool."""
import json
import sys

base = sys.argv[1] if len(sys.argv) > 1 else "target"
a = json.load(open(f"{base}/bench_fullreg_sf1.json"))
b = json.load(open(f"{base}/bench_fullreg_sf10.json"))
qa, qb = a["queries"], b["queries"]
shared = sorted(set(qa) & set(qb))
only_a = sorted(set(qa) - set(qb))
only_b = sorted(set(qb) - set(qa))
rows = [(n, qa[n], qb[n], qb[n] / qa[n] if qa[n] > 0 else float("inf"))
        for n in shared]
rows.sort(key=lambda r: -r[3])
tot1 = sum(qa[n] for n in shared)
tot10 = sum(qb[n] for n in shared)
rats = sorted(r[3] for r in rows)
med = rats[len(rats) // 2]
print(f"shared queries: {len(shared)}  sf1 total {tot1:.1f}s  "
      f"sf10 total {tot10:.1f}s  ratio {tot10/tot1:.2f}x  median {med:.2f}x")
print(f"failed sf1: {a.get('failed')}  failed sf10: {b.get('failed')}  "
      f"load sf1 {a.get('load_avg'):.1f} sf10 {b.get('load_avg'):.1f}")
over3 = [r for r in rows if r[3] > 3]
print(f">3x: {len(over3)}   >10x: {len([r for r in rows if r[3] > 10])}")
print(f"{'query':34s} {'sf1':>8s} {'sf10':>9s} {'ratio':>7s}")
for n, t1, t10, r in rows[:30]:
    print(f"{n:34s} {t1:8.2f} {t10:9.2f} {r:6.1f}x")
if only_a or only_b:
    print("only-sf1:", only_a, " only-sf10:", only_b)
