#!/usr/bin/env python3
"""Bit-identical double-run determinism gate.

Compares two independent `graft.Verify` output dirs value-for-value
(every column, every row, doubles included — no rounding, no
tolerance): the round-exit requirement that a rerun of the whole
query surface reproduces byte-equal results.

    python3 tools/determinism.py /tmp/gate_run1 /tmp/gate_run2

Exit 0 iff every query directory present in either dump exists in
both and compares equal. Each pair is compared as a MULTISET via
DuckDB EXCEPT ALL run both ways (rows surviving either direction =
differing rows, duplicates counted) — order-insensitive because each
query ends in a total-order ORDER BY but parquet part order is not
load order, and exact because EXCEPT ALL matches on raw column
values with no rounding or tolerance.
"""
import sys
import os
import duckdb


def query_dirs(root):
    return sorted(
        d for d in os.listdir(root)
        if os.path.isdir(os.path.join(root, d)) and not d.startswith("_"))


def main(a, b):
    qa, qb = set(query_dirs(a)), set(query_dirs(b))
    failures = []
    for missing in sorted(qa ^ qb):
        failures.append(f"{missing}: present in only one dump")
    ok = 0
    for q in sorted(qa & qb):
        pa = os.path.join(a, q, "*.parquet")
        pb = os.path.join(b, q, "*.parquet")
        try:
            # EXCEPT ALL both ways == multiset equality, exact values
            diff1 = duckdb.sql(
                f"SELECT count(*) FROM (SELECT * FROM parquet_scan('{pa}') "
                f"EXCEPT ALL SELECT * FROM parquet_scan('{pb}'))").fetchone()[0]
            diff2 = duckdb.sql(
                f"SELECT count(*) FROM (SELECT * FROM parquet_scan('{pb}') "
                f"EXCEPT ALL SELECT * FROM parquet_scan('{pa}'))").fetchone()[0]
            na = duckdb.sql(
                f"SELECT count(*) FROM parquet_scan('{pa}')").fetchone()[0]
            if diff1 or diff2:
                failures.append(f"{q}: {diff1}+{diff2} differing rows of {na}")
            else:
                ok += 1
                print(f"SAME {q} ({na} rows)")
        except Exception as e:  # schema mismatch, unreadable, ...
            failures.append(f"{q}: compare error: {e}")
    for f in failures:
        print(f"DIFF {f}")
    print(f"== {ok} identical, {len(failures)} different ==")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
