#!/usr/bin/env python3
"""Time each DuckDB oracle the same way Bench times the engine: min of 2
fully-materializing runs (fetchall) on a warm connection.

Usage: python3 tools/time_oracles.py <sfDir> <verifyOutDir> [skip1,skip2,...]

Prints one `name seconds` line per oracle plus a total; pass a skip list for
oracles that are not data-proportional comparisons (e.g. d09/d10, whose
recursive-CTE transitive closure is the oracle's own scaling problem).
"""
import json, sys, time
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
skip = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else set()

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
con.execute("SELECT count(*) FROM lineitem").fetchall()  # warm-up

total = 0.0
out = {}
for name in sorted(oracles):
    if name in skip:
        print(f"{name} SKIPPED")
        continue
    ts = []
    for _ in range(2):
        t0 = time.time()
        con.execute(oracles[name]).fetchall()
        ts.append(time.time() - t0)
    out[name] = min(ts)
    total += out[name]
    print(f"{name} {out[name]:.3f}")
print(f"TOTAL {total:.2f} over {len(out)} oracles")
json.dump(out, open("/tmp/oracle_times.json", "w"))
