#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracles.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sfDir parquet
tables, and compares: column names (sorted), row count, and canonicalized
row-value hashes (rows sorted by all columns, exact value equality).
"""
import json, sys, os, math
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

with open(f"{out_dir}/oracle_sql.json") as f:
    oracles = json.load(f)

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize value repr: floats rounded to 9 sig figs for compare display;
    # exactness checked separately
    return df.sort_values(by=list(df.columns), ignore_index=True)

fails, passes, skips = [], [], []
names = sorted(os.listdir(out_dir))
for name in names:
    path = os.path.join(out_dir, name)
    if not os.path.isdir(path):
        continue
    eng = duckdb.sql(f"SELECT * FROM '{path}/*.parquet'").df()
    if name not in oracles:
        skips.append((name, len(eng)))
        continue
    try:
        ora = con.execute(oracles[name]).df()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    e_c, o_c = canon(eng), canon(ora)
    if list(e_c.columns) != list(o_c.columns):
        fails.append((name, f"columns differ: eng={list(e_c.columns)} ora={list(o_c.columns)}"))
        continue
    if len(e_c) != len(o_c):
        fails.append((name, f"rowcount differ: eng={len(e_c)} ora={len(o_c)}"))
        continue
    bad = None
    for c in e_c.columns:
        a, b = e_c[c], o_c[c]
        try:
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                eq = ((a == b) | (a.isna() & b.isna()))
            else:
                eq = (a.astype(str) == b.astype(str))
            if not eq.all():
                i = (~eq).idxmax()
                bad = f"col {c} row {i}: eng={a[i]!r} ora={b[i]!r} (n_bad={int((~eq).sum())})"
                break
        except Exception as ex:
            bad = f"col {c}: compare error {ex}"
            break
    if bad:
        fails.append((name, bad))
    else:
        passes.append((name, len(e_c)))

for n, r in passes:
    print(f"PASS {n} ({r} rows)")
for n, r in skips:
    print(f"SKIP {n} (no oracle; {r} rows)")
for n, msg in fails:
    print(f"FAIL {n}: {msg}")
print(f"\n{len(passes)} pass, {len(skips)} skip, {len(fails)} fail")
sys.exit(1 if fails else 0)
