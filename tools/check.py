#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py [verify_out_dir] [sf_dir]
Reads Spark outputs written by `graft.Verify` plus oracle_sql.json, runs each
oracle in DuckDB over the same parquet tables, and compares (columns sorted by
name, rows sorted by all columns, exact value + dtype equality).

Dev-only tool: not part of the engine; the engine itself is pure Scala/Spark.
"""
import sys, json, math
import duckdb
import pandas as pd

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout"
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok, fails = [], []
for name, sql in sorted(oracle.items()):
    try:
        sdf = pd.read_parquet(f"{outdir}/{name}")
    except Exception as e:
        fails.append((name, f"spark output missing: {e}"))
        continue
    try:
        ddf = con.execute(sql).df()
    except Exception as e:
        fails.append((name, f"duckdb error: {str(e)[:300]}"))
        continue
    sdf = sdf[sorted(sdf.columns)]
    ddf = ddf[sorted(ddf.columns)]
    if list(sdf.columns) != list(ddf.columns):
        fails.append((name, f"columns: spark={list(sdf.columns)} duck={list(ddf.columns)}"))
        continue
    if len(sdf) != len(ddf):
        fails.append((name, f"rowcount: spark={len(sdf)} duck={len(ddf)}"))
        continue
    cols = list(sdf.columns)
    try:
        sdf2 = sdf.sort_values(by=cols).reset_index(drop=True)
        ddf2 = ddf.sort_values(by=cols).reset_index(drop=True)
    except Exception:
        sdf2, ddf2 = sdf.reset_index(drop=True), ddf.reset_index(drop=True)
    mismatch = None
    for c in cols:
        a, b = sdf2[c], ddf2[c]
        if str(a.dtype) != str(b.dtype):
            mismatch = f"col {c} dtype: spark={a.dtype} duck={b.dtype}"
            break
        both_na = a.isna() & b.isna()
        eq = both_na | (a == b)
        if not eq.all():
            i = int((~eq).idxmax())
            mismatch = (f"col {c} row {i}: spark={a[i]!r} duck={b[i]!r}")
            break
    if mismatch:
        fails.append((name, mismatch))
    else:
        ok.append(name)
        print(f"OK   {name} ({len(sdf)} rows)")
for name, msg in fails:
    print(f"FAIL {name}: {msg}")
print(f"\n{len(ok)}/{len(oracle)} matched")
sys.exit(1 if fails else 0)
