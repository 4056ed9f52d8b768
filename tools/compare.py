#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: compare.py <verify_out_dir> <sf_dir> [name_prefix ...]

For each query dumped by graft.Verify, runs the registered DuckDB oracle SQL
over the same parquet tables and compares (a) column names (sorted), (b) row
count, (c) values positionally with columns sorted by name (stringified).

Reader asymmetry is deliberate and load-bearing: the spark dump is read with
pandas/pyarrow (DECIMAL -> decimal.Decimal, str keeps scale: '73.00') while
the oracle goes through duckdb .df() (DECIMAL -> float64, str drops trailing
zeros: '73.0'). That reproduces the driver's hash gate, which round 2 showed
fails any query emitting a DecimalType column whose values have trailing
zeros. Rule: oracled queries must final-cast decimals to DOUBLE/BIGINT, and
this script errors loudly if a spark dump contains Decimal objects.
"""
import json, sys, glob, os
from decimal import Decimal
import duckdb
import pandas as pd

out_dir, sf_dir = sys.argv[1], sys.argv[2]
prefixes = sys.argv[3:]

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def norm(df):
    df = df[sorted(df.columns)]
    return df

fails, passes, skips = [], 0, 0
for name in sorted(oracle):
    if prefixes and not any(name.startswith(p) for p in prefixes):
        continue
    files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
    if not files:
        print(f"MISSING  {name}: no spark result parquet")
        fails.append(name)
        continue
    try:
        got = pd.read_parquet(files[0])
        want = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"ERROR    {name}: {e}")
        fails.append(name)
        continue
    g, w = norm(got), norm(want)
    dec_cols = [c for c in g.columns
                if g[c].dtype == object and g[c].map(lambda v: isinstance(v, Decimal)).any()]
    if dec_cols:
        print(f"DECIMAL  {name}: spark output has DecimalType cols {dec_cols} "
              f"(driver hash would diverge on trailing zeros) — cast to DOUBLE/BIGINT")
        fails.append(name)
        continue
    if list(g.columns) != list(w.columns):
        print(f"SCHEMA   {name}: spark={list(g.columns)} oracle={list(w.columns)}")
        fails.append(name)
        continue
    if len(g) != len(w):
        print(f"ROWS     {name}: spark={len(g)} oracle={len(w)}")
        fails.append(name)
        continue
    gs = g.astype(str)
    ws = w.astype(str)
    neq = (gs != ws)
    if neq.any().any():
        bad_cols = [c for c in gs.columns if neq[c].any()]
        idx = neq.any(axis=1)
        i = idx[idx].index[0]
        print(f"VALUES   {name}: cols {bad_cols}; first diff row {i}:")
        print("  spark :", dict(g.iloc[i]))
        print("  oracle:", dict(w.iloc[i]))
        fails.append(name)
        continue
    # dtype advisory (driver may compare schemas more strictly)
    dt_g = {c: str(g[c].dtype) for c in g.columns}
    dt_w = {c: str(w[c].dtype) for c in w.columns}
    note = ""
    if dt_g != dt_w:
        diff = {c: (dt_g[c], dt_w[c]) for c in dt_g if dt_g[c] != dt_w[c]}
        note = f"  [dtype diff: {diff}]"
    print(f"OK       {name}: {len(g)} rows{note}")
    passes += 1

print(f"\n== {passes} pass, {len(fails)} fail: {fails}")
sys.exit(1 if fails else 0)
