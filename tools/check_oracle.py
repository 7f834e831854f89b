#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare.

Usage: check_oracle.py [sfDir] [verifyOutDir]
Reads oracle_sql.json + per-query parquet dumps produced by graft.Verify,
runs each oracle SQL in DuckDB over views named after the sfDir tables,
sorts columns by name / rows by value, and compares cell-exactly.
"""
import duckdb, sys, json, glob, os
import pandas as pd
import numpy as np

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails, passes = [], []

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

for name in sorted(oracle):
    sql = oracle[name]
    try:
        a = con.sql(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").df()
    except Exception as e:
        print(f"FAIL {name}: spark output unreadable: {e}")
        fails.append(name); continue
    try:
        b = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fails.append(name); continue
    a, b = norm(a), norm(b)
    if list(a.columns) != list(b.columns):
        print(f"FAIL {name}: cols spark={list(a.columns)} duck={list(b.columns)}")
        fails.append(name); continue
    if len(a) != len(b):
        print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}")
        fails.append(name); continue
    bad = []
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype != bv.dtype:
            try:
                bv = bv.astype(av.dtype)
            except Exception:
                bad.append((c, "dtype", av.dtype, bv.dtype)); continue
        if av.dtype.kind == "f":
            eq = (av.isna() & bv.isna()) | (av == bv)
        else:
            eq = (av.isna() & bv.isna()) | (av.astype(object) == bv.astype(object))
        if not eq.all():
            i = int(np.argmax(~eq.values))
            bad.append((c, "val", av.iloc[i], bv.iloc[i]))
    if bad:
        print(f"FAIL {name}: {bad[:3]}")
        fails.append(name)
    else:
        passes.append(name)

print(f"\n== {len(passes)} PASS, {len(fails)} FAIL ==")
if fails:
    print("failing:", fails)
    sys.exit(1)
