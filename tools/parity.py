#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (NOT part of the library).

Usage: python3 tools/parity.py <sfDir> <verifyOutDir>

For every query dumped by graft.Verify, runs the oracle SQL from
oracle_sql.json in DuckDB over the same parquet tables and compares the
result (schema column set, row count, and exact values after sorting
columns by name and rows by value) against the Spark parquet dump.
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)  # absorb printing noise only; values should be exact
            rr.append(repr(v))
        out.append(tuple(rr))
    return sorted(out)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            o = con.execute(sql)
            o_cols = [d[0] for d in o.description]
            o_rows = o.fetchall()
            s = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            s_cols = [d[0] for d in s.description]
            s_rows = s.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        if sorted(o_cols) != sorted(s_cols):
            print(f"FAIL {name}: columns oracle={sorted(o_cols)} spark={sorted(s_cols)}")
            n_fail += 1
            continue
        co, cs = canon(o_rows, o_cols), canon(s_rows, s_cols)
        if len(co) != len(cs):
            print(f"FAIL {name}: rows oracle={len(co)} spark={len(cs)}")
            n_fail += 1
        elif co != cs:
            diffs = [(a, b) for a, b in zip(co, cs) if a != b]
            print(f"FAIL {name}: {len(diffs)} differing rows; first: oracle={diffs[0][0]} spark={diffs[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(co)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
