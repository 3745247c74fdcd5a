#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (NOT part of the sbt
build; uses driver-side-only python deps).

Runs each SparkEntry query output (already dumped by graft.Verify into
OUTDIR) against its DuckDB oracle SQL over the same parquet tables, then
compares: column names, row count, and exact values after sorting columns
by name and rows by all columns — the strictest reading of the driver's
hash-match.

Usage: python3 tools/check.py <sfDir> <outDir> [jsonOut]

With jsonOut, also writes the per-query result JSON in the driver's
CORRECTNESS_r{N}.json schema (rows/schema/hash match per query) so the
round's correctness evidence can be committed durably at round close.
"""
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    # normalize dtypes for compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str, json_out: str = None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    report = {}

    def record(name, rows_match, schema_match, hash_match, spark_rows,
               oracle_rows, err):
        report[name] = {"rows_match": rows_match,
                        "schema_match": schema_match,
                        "hash_match": hash_match,
                        "spark_rows": spark_rows,
                        "oracle_rows": oracle_rows, "err": err}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        got = canon(pd.read_parquet(d))
        if name not in oracle:
            print(f"  ~ {name}: no oracle (rows-only) rows={len(got)}")
            # rows_match=None (like schema/hash): absence-of-check must be
            # distinguishable from a failed check in the committed evidence
            # — a legitimately-empty no-oracle output is not a failure.
            record(name, None, None, None, len(got), None,
                   "no_oracle: rows-only check")
            continue
        try:
            want = canon(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"  ✗ {name}: ORACLE SQL ERROR {e}")
            record(name, False, False, False, len(got), None,
                   f"oracle sql error: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"  ✗ {name}: COLUMNS got={list(got.columns)} want={list(want.columns)}")
            record(name, len(got) == len(want), False, False, len(got),
                   len(want), "column mismatch")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"  ✗ {name}: ROWS got={len(got)} want={len(want)}")
            record(name, False, True, False, len(got), len(want),
                   "row count mismatch")
            n_fail += 1
            continue
        # kind-strict: the driver hashes raw values, so int64 vs float64
        # (e.g. DuckDB HUGEINT sums) is a real mismatch even when values
        # compare equal under pandas coercion.
        kinds_got = [got.dtypes[c].kind for c in got.columns]
        kinds_want = [want.dtypes[c].kind for c in want.columns]
        if kinds_got != kinds_want:
            print(f"  ✗ {name}: DTYPES got={dict(got.dtypes.astype(str))} "
                  f"want={dict(want.dtypes.astype(str))}")
            record(name, True, False, False, len(got), len(want),
                   "dtype kind mismatch")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                          check_exact=True)
            print(f"  ✓ {name} rows={len(got)}")
            record(name, True, True, True, len(got), len(want), None)
            n_pass += 1
        except AssertionError as e:
            print(f"  ✗ {name}: VALUES {str(e).splitlines()[-1][:200]}")
            record(name, True, True, False, len(got), len(want),
                   f"value mismatch: {str(e).splitlines()[-1][:200]}")
            n_fail += 1
    print(f"{n_pass} pass, {n_fail} fail")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=2, ensure_ascii=False)
        print(f"wrote {json_out} ({len(report)} queries)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
