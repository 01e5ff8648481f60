#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_correctness.py <verify_out_dir> <sf_dir>

Reads each <verify_out_dir>/<name>/ parquet result (Spark side) and runs the
matching SQL from oracle_sql.json in DuckDB over <sf_dir>/*.parquet, then
compares: row count, column names, and values (columns sorted by name, rows
sorted by all columns). Prints one line per query + a summary.
"""
import json
import math
import sys

import duckdb


def canon(rows, cols):
    """Sort columns by name, rows by repr of all values."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = f"{v:.9g}"
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    tables = ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = n_rows_only = 0
    import os
    for name in sorted(os.listdir(out_dir)):
        if not os.path.isdir(f"{out_dir}/{name}"):
            continue
        sp = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        sp_cols = [d[0] for d in sp.description]
        sp_rows = sp.fetchall()
        if name not in oracle:
            n_rows_only += 1
            status = "ROWS_ONLY" if len(sp_rows) > 0 else "ROWS_ONLY_EMPTY!"
            print(f"{status:18s} {name} rows={len(sp_rows)}")
            continue
        try:
            du = con.execute(oracle[name])
            du_cols = [d[0] for d in du.description]
            du_rows = du.fetchall()
        except Exception as e:
            n_fail += 1
            print(f"FAIL(oracle-err)   {name}: {e}")
            continue
        sc, sr = canon(sp_rows, sp_cols)
        dc, dr = canon(du_rows, du_cols)
        if sc != dc:
            n_fail += 1
            print(f"FAIL(schema)       {name}: spark={sc} duck={dc}")
        elif len(sr) != len(dr):
            n_fail += 1
            print(f"FAIL(rows)         {name}: spark={len(sr)} duck={len(dr)}")
        elif sr != dr:
            n_fail += 1
            diff = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            print(f"FAIL(values)       {name}: first diffs {diff}")
        else:
            n_pass += 1
            print(f"PASS               {name} rows={len(sr)}")
    print(f"\nSUMMARY pass={n_pass} fail={n_fail} rows_only={n_rows_only}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
