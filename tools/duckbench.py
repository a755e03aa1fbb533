#!/usr/bin/env python3
"""Same-workload DuckDB timing (dev tool): runs every oracle SQL from a
Verify dump against the same parquet tables, warm, and prints per-query
and total wall seconds — the single-node reference comparison for
SURVEY §6.

Usage: python3 tools/duckbench.py <sfDir> <verifyOutDir> [threads]
"""
import json, sys, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    threads = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    con = duckdb.connect()
    con.execute(f"PRAGMA threads={threads}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    for _, sql in sorted(oracle.items()):  # warm pass
        con.execute(sql).fetchall()
    total = 0.0
    times = {}
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        con.execute(sql).fetchall()
        dt = time.time() - t0
        times[name] = dt
        total += dt
    for name, dt in sorted(times.items(), key=lambda x: -x[1]):
        print(f"{name:24s} {dt:8.2f}")
    print(f"{'TOTAL':24s} {total:8.2f}  ({len(times)} queries, {threads} threads)")

if __name__ == "__main__":
    main()
