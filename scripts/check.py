#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/check.py <outDir> <sfDir> [query ...]

Reads the parquet results that `graft.Verify` wrote to <outDir>, runs each
oracle SQL from <outDir>/oracle_sql.json in DuckDB with the <sfDir> tables
registered as views, and compares: columns sorted by name, rows sorted by all
columns, exact value equality (floats compared bit-exactly, which is the
standard this engine's queries are designed to meet).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    # Dtype-faithful: the driver's comparator hashes values together with
    # their type, so int64 5 != float64 5.0 (the r01 HUGEINT failures).
    # Tag every value with a type class so the local replay can't pass
    # what the driver fails.
    if v is None:
        return ("null", "∅")
    if hasattr(v, "item"):  # unwrap numpy scalars
        v = v.item()
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("null", "∅")
        return ("float", v)
    if isinstance(v, int):
        return ("int", v)
    return (type(v).__name__, str(v))


def skey(row):
    return [repr(x) for x in row]


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: result read error: {e}")
            n_fail += 1
            continue
        ec = sorted(exp.columns)
        gc = sorted(got.columns)
        if ec != gc:
            print(f"FAIL {name}: columns differ\n  oracle: {ec}\n  spark:  {gc}")
            n_fail += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: row count {len(got)} vs oracle {len(exp)}")
            n_fail += 1
            continue
        e_rows = sorted([tuple(canon(v) for v in r)
                         for r in exp[ec].itertuples(index=False)], key=skey)
        g_rows = sorted([tuple(canon(v) for v in r)
                         for r in got[gc].itertuples(index=False)], key=skey)
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(e_rows, g_rows))
               if a != b]
        if bad:
            i, a, b = bad[0]
            # report worst numeric deviation for diagnosis
            print(f"FAIL {name}: {len(bad)}/{len(e_rows)} rows differ; first @{i}")
            print(f"  cols:   {ec}")
            print(f"  oracle: {a}")
            print(f"  spark:  {b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(e_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
