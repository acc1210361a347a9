#!/usr/bin/env python3
"""Self-check harness mimicking the driver's correctness gate:
runs each oracle SQL in DuckDB over the same parquet tables and
compares against the Verify output parquet (columns sorted by name,
rows compared exactly, both sorted and as-emitted).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import glob
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [tuple(norm_cell(r[i]) for i in order) for r in rows]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = "MISSING_SPARK_OUTPUT"
            continue
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet({files!r})")
            got_cols = [c.lower() for c in got.columns]
            got_types = [str(t) for t in got.types]
            got_rows = got.fetchall()
            exp = con.sql(sql)
            exp_cols = [c.lower() for c in exp.columns]
            exp_types = [str(t) for t in exp.types]
            exp_rows = exp.fetchall()
        except Exception as e:
            results[name] = f"ERROR: {e}"
            continue
        # The driver's gate sorts/hashes result frames via pandas, where
        # list/struct/map cells are unhashable → the whole row errs.
        # Declared queries therefore carry a SCALAR-OUTPUT CONTRACT:
        # reject any nested-typed result column here so the self-check
        # can never pass a query the driver gate will err on (the
        # d40/d45 round-9 lesson).
        nested = [f"{c}:{t}" for c, t in
                  list(zip(got_cols, got_types)) + list(zip(exp_cols, exp_types))
                  if "[]" in t or t.startswith(("STRUCT", "MAP", "LIST"))]
        if nested:
            results[name] = (f"NESTED_TYPE: driver gate cannot sort/hash "
                             f"array/struct/map result columns: {nested}")
            continue
        if sorted(got_cols) != sorted(exp_cols):
            results[name] = f"SCHEMA: got {sorted(got_cols)} want {sorted(exp_cols)}"
            continue
        g = norm_rows(got_cols, got_rows)
        x = norm_rows(exp_cols, exp_rows)
        if len(g) != len(x):
            results[name] = f"ROWS: got {len(g)} want {len(x)}"
            continue
        if g == x:
            results[name] = "OK"
        elif sorted(g) == sorted(x):
            results[name] = "OK_UNORDERED"  # values match, emit order differs
        else:
            bad = next(i for i in range(len(g)) if g[i] != x[i])
            results[name] = (f"VALUES: first diff at row {bad}: "
                             f"got {g[bad]} want {x[bad]}")
        del g, x
    n_ok = sum(1 for v in results.values() if v.startswith("OK"))
    for k, v in results.items():
        flag = "  " if v.startswith("OK") else "XX"
        print(f"{flag} {k}: {v[:300]}")
    # queries with no oracle → rows-only
    spark_only = [d.split("/")[-1] for d in glob.glob(f"{out_dir}/*")
                  if "/" not in d.split(out_dir)[-1].strip("/")
                  and d.split("/")[-1] not in oracle
                  and d.split("/")[-1] != "oracle_sql.json"]
    print(f"\n{n_ok}/{len(oracle)} oracle-checked OK; "
          f"rows-only (no oracle): {sorted(spark_only)}")


if __name__ == "__main__":
    main()
