#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_correctness.py <verify_out_dir> <sf_dir>
       python3 tools/check_correctness.py --selftest

Reads each <verify_out_dir>/<name>/ parquet result (Spark side) and runs the
matching SQL from oracle_sql.json in DuckDB over <sf_dir>/*.parquet, then
compares: row count, column names, pandas dtype KINDS, and rendered values
(columns sorted by name, rows sorted by all columns).

Dtype-faithful on purpose: both sides go through pandas exactly like the
driver's bridge, so DuckDB HUGEINT (untyped integer SUM / list_aggregate
'sum') surfaces as float64 and FAILS against Spark's int64 — fetchall()
would return Python ints and mask it (that false-green shipped two red
driver rows in round 3). Run --selftest to prove the gate catches it.
"""
import json
import math
import os
import sys

import duckdb
import pandas as pd


def render(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.9g}"
    if v is pd.NaT:
        return "NaT"
    return str(v)


def canon(df):
    """Sort columns by name, rows by rendered values. Returns
    (col_names, dtype_kinds, sorted_row_tuples)."""
    cols = sorted(df.columns)
    df = df[cols]
    kinds = [df[c].dtype.kind for c in cols]
    rows = sorted(tuple(render(v) for v in row)
                  for row in df.itertuples(index=False, name=None))
    return cols, kinds, rows


def compare(sp_df, du_df):
    """Returns (status, detail) — status PASS or FAIL(...)."""
    sc, sk, sr = canon(sp_df)
    dc, dk, dr = canon(du_df)
    if sc != dc:
        return "FAIL(schema)", f"spark={sc} duck={dc}"
    if sk != dk:
        diff = [(c, a, b) for c, a, b in zip(sc, sk, dk) if a != b]
        return "FAIL(dtype)", f"kind mismatch {diff} (HUGEINT->float64?)"
    if len(sr) != len(dr):
        return "FAIL(rows)", f"spark={len(sr)} duck={len(dr)}"
    if sr != dr:
        diff = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
        return "FAIL(values)", f"first diffs {diff}"
    return "PASS", f"rows={len(sr)}"


def selftest():
    """The gate must fail an untyped DuckDB integer aggregate vs int64."""
    con = duckdb.connect()
    # Spark-like side: genuine int64.
    sp = pd.DataFrame({"k": pd.array([1, 2], dtype="int64"),
                       "s": pd.array([10, 20], dtype="int64")})
    # Oracle with untyped SUM -> HUGEINT -> pandas float64.
    du = con.execute(
        "SELECT k, SUM(v) AS s FROM (VALUES (1, 10), (2, 20)) t(k, v) "
        "GROUP BY k").df()
    status, detail = compare(sp, du)
    assert status == "FAIL(dtype)", f"untyped SUM not caught: {status} {detail}"
    # And the CAST-typed oracle must pass.
    du2 = con.execute(
        "SELECT k, CAST(SUM(v) AS BIGINT) AS s "
        "FROM (VALUES (1, 10), (2, 20)) t(k, v) GROUP BY k").df()
    status2, detail2 = compare(sp, du2)
    assert status2 == "PASS", f"typed SUM should pass: {status2} {detail2}"
    print("selftest OK: untyped SUM -> FAIL(dtype); CAST AS BIGINT -> PASS")


def main():
    if sys.argv[1:] == ["--selftest"]:
        selftest()
        return
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    tables = ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = n_rows_only = 0
    # Queries that ERRORed in Verify leave no parquet dir — without this,
    # a 22-query regression reads as "everything passing" (round 7). The
    # dump records them in errors.json; surface each as an explicit FAIL.
    err_path = f"{out_dir}/errors.json"
    errored = {}
    if os.path.exists(err_path):
        errored = json.load(open(err_path))
        for name, msg in sorted(errored.items()):
            n_fail += 1
            print(f"FAIL(spark-err)    {name}: {msg[:200]}")
    for name in sorted(os.listdir(out_dir)):
        if not os.path.isdir(f"{out_dir}/{name}"):
            continue
        # an errored query can still leave a dir (stale prior dump, or a
        # failure after partial write) — it is already counted above;
        # re-judging the leftover would double-count or mask it (r8 ADVICE)
        if name in errored:
            continue
        sp_df = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        if name not in oracle:
            n_rows_only += 1
            status = "ROWS_ONLY" if len(sp_df) > 0 else "ROWS_ONLY_EMPTY!"
            print(f"{status:18s} {name} rows={len(sp_df)}")
            continue
        try:
            du_df = con.execute(oracle[name]).df()
        except Exception as e:
            n_fail += 1
            print(f"FAIL(oracle-err)   {name}: {e}")
            continue
        status, detail = compare(sp_df, du_df)
        if status == "PASS":
            n_pass += 1
        else:
            n_fail += 1
        print(f"{status:18s} {name}: {detail}")
    print(f"\nSUMMARY pass={n_pass} fail={n_fail} rows_only={n_rows_only}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
