#!/usr/bin/env python3
"""Second-decade scaling report: merge the sf1 vs sf10 sweep outputs
(tools/sf10_sweep.sh -> target/bench_{sub,lev}_{sf1,sf10}.json) into the
per-query ratio table for BENCH_SF10.md. Pure-python, no Spark."""
import json, sys

def load(tag):
    with open(f"target/bench_{tag}.json") as f:
        d = json.load(f)
    return d

def main():
    sf1 = load("sub_sf1"); sf10 = load("sub_sf10")
    q1 = dict(sf1["queries"]); q10 = dict(sf10["queries"])
    try:
        q1.update(load("lev_sf1")["queries"])
        q10.update(load("lev_sf10")["queries"])
    except FileNotFoundError:
        pass
    rows = []
    for name in sorted(q1):
        if name not in q10:
            continue
        a, b = q1[name], q10[name]
        rows.append((b / a if a > 0 else float("inf"), name, a, b))
    rows.sort(reverse=True)
    t1 = sum(r[2] for r in rows); t10 = sum(r[3] for r in rows)
    ratios = sorted(r[0] for r in rows)
    med = ratios[len(ratios) // 2]
    print(f"subset total: sf1 {t1:.1f} s -> sf10 {t10:.1f} s = "
          f"{t10 / t1:.2f}x for 10x data ({len(rows)} queries)")
    print(f"median per-query ratio: {med:.2f}x ; <=3x: "
          f"{sum(1 for r in ratios if r <= 3)}/{len(ratios)} ; >10x: "
          f"{sum(1 for r in ratios if r > 10)}")
    print()
    print("| query | sf1 (s) | sf10 (s) | ratio |")
    print("|---|---|---|---|")
    for ratio, name, a, b in rows:
        r = f"**{ratio:.1f}x**" if ratio > 10 else f"{ratio:.1f}x"
        print(f"| {name} | {a:.2f} | {b:.2f} | {r} |")
    ok1 = [n for n, v in sf1.get("ok", {}).items() if not v]
    ok10 = [n for n, v in sf10.get("ok", {}).items() if not v]
    if ok1 or ok10:
        print(f"\nFAILURES: sf1={ok1} sf10={ok10}")

if __name__ == "__main__":
    main()
