#!/usr/bin/env python3
"""Byte-level differential compare of two Verify dump dirs (A/B builds).

Usage: tools/cmp_dumps.py <dirA> <dirB> [query...]
Compares each query subdir present in BOTH dirs (or the listed subset):
schema, row count, and an order-insensitive content hash over every cell
rendered to text (the tools/check.py convention). Exit 1 on any mismatch.
"""
import sys, os
import duckdb

def content_hash(con, path):
    rel = con.sql(f"SELECT * FROM read_parquet('{path}/*.parquet')")
    cols = rel.columns
    types = [str(t) for t in rel.types]
    sel = ", ".join(f'"{c}"' for c in cols)
    # stable textual rendering, order-insensitive aggregate hash
    h = con.sql(
        f"SELECT count(*), sum(hash(concat_ws('|', {sel})))::HUGEINT "
        f"FROM read_parquet('{path}/*.parquet')").fetchone()
    return cols, types, h[0], h[1]

def main():
    a, b = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    if not names:
        names = sorted(set(os.listdir(a)) & set(os.listdir(b)))
        names = [n for n in names
                 if os.path.isdir(os.path.join(a, n))
                 and os.path.isdir(os.path.join(b, n))]
    con = duckdb.connect()
    bad = 0
    for n in names:
        pa, pb = os.path.join(a, n), os.path.join(b, n)
        if not (os.path.isdir(pa) and os.path.isdir(pb)):
            print(f"{n}: MISSING ({'A' if not os.path.isdir(pa) else 'B'})")
            bad += 1
            continue
        ca, ta, na, ha = content_hash(con, pa)
        cb, tb, nb, hb = content_hash(con, pb)
        ok = (ca == cb and ta == tb and na == nb and ha == hb)
        print(f"{n}: {'OK' if ok else 'MISMATCH'} rows={na}/{nb} "
              f"schema={'=' if (ca == cb and ta == tb) else '!'} "
              f"hash={'=' if ha == hb else '!'}")
        if not ok:
            bad += 1
    sys.exit(1 if bad else 0)

main()
