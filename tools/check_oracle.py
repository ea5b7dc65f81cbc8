#!/usr/bin/env python3
"""Local pre-flight mirror of the driver's correctness gate: load each
Verify output parquet, run the matching oracle SQL in DuckDB over the same
testdata tables, sort columns by name + rows, and compare."""
import json
import sys
import glob
import os

import duckdb
import pandas as pd

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
con = duckdb.connect()
for p in glob.glob(f"{SF}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.astype(str))
    return df.reset_index(drop=True)

ok, bad = [], []
for qdir in sorted(glob.glob(f"{OUT}/q*")):
    qname = os.path.basename(qdir)
    spark_df = pd.concat([pd.read_parquet(f) for f in glob.glob(f"{qdir}/*.parquet")],
                         ignore_index=True) if glob.glob(f"{qdir}/*.parquet") else None
    if spark_df is None:
        bad.append((qname, "no spark output"))
        continue
    if qname not in oracle:
        ok.append((qname, f"rows-only: {len(spark_df)} rows"))
        continue
    try:
        duck_df = con.execute(oracle[qname]).df()
    except Exception as e:
        bad.append((qname, f"oracle sql error: {e}"))
        continue
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        bad.append((qname, f"schema: spark={list(a.columns)} duck={list(b.columns)}"))
        continue
    if len(a) != len(b):
        bad.append((qname, f"rows: spark={len(a)} duck={len(b)}"))
        continue
    # value compare with float tolerance-free exactness first, report diffs
    diffs = []
    for c in a.columns:
        av, bv = a[c], b[c]
        if not av.astype(str).equals(bv.astype(str)):
            n = (av.astype(str) != bv.astype(str)).sum()
            idx = (av.astype(str) != bv.astype(str)).idxmax()
            diffs.append(f"{c}: {n} diffs, first at row {idx}: spark={av[idx]!r} duck={bv[idx]!r}")
    if diffs:
        bad.append((qname, "; ".join(diffs[:3])))
    else:
        ok.append((qname, f"EXACT match, {len(a)} rows"))

for q, msg in ok:
    print(f"  OK  {q}: {msg}")
for q, msg in bad:
    print(f" FAIL {q}: {msg}")
print(f"\n{len(ok)} ok, {len(bad)} failed")
sys.exit(1 if bad else 0)
