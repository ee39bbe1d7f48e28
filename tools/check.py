#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Runs each SparkEntry.oracleSql query in DuckDB against the raw parquet
tables and compares with the engine's dumped parquet results (written by
graft.Verify). Mimics the driver: sort columns by name, canonicalize
values, compare row streams.

Usage: python3 tools/check.py OUT_DIR [SF_DIR]
"""
import glob
import json
import math
import sys
from datetime import datetime, date

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon_cell(x):
    if x is None:
        return r"\N"
    if isinstance(x, float) and math.isnan(x):
        return r"\N"
    if x is pd.NaT:
        return r"\N"
    if isinstance(x, bool):
        return "true" if x else "false"
    import numpy as np
    if isinstance(x, np.bool_):
        return "true" if x else "false"
    if isinstance(x, (pd.Timestamp, datetime)):
        ms = x.microsecond // 1000 if isinstance(x, datetime) else 0
        base = x.strftime("%Y-%m-%d %H:%M:%S")
        return f"{base}.{ms:03d}" if ms else base
    if isinstance(x, date):
        return str(x)
    import decimal
    if isinstance(x, decimal.Decimal):
        # native scale, no rewriting: a Spark DECIMAL(12,2) must differ
        # from a float64 oracle value so the gate predicts the driver
        return str(x)
    if isinstance(x, (np.floating, float)):
        # shortest round-trip repr, same as the driver's float64 path
        return repr(float(x))
    if isinstance(x, (np.integer, int)):
        return str(int(x))
    if isinstance(x, (list, tuple)) or type(x).__name__ == "ndarray":
        return "[" + ",".join(canon_cell(e) for e in x) + "]"
    return str(x)


def canon_df(df):
    df = df[sorted(df.columns)]
    # The driver sorts the RAW pandas frame before canonicalizing; keep the
    # same order of operations so cells pandas cannot lexsort (ndarray-valued
    # ARRAY columns — the ql40 failure class in round 8) fail here too
    # instead of slipping past the pre-flight.
    #
    # INTENTIONALLY STRICTER than the canonical-string equality below: any
    # frame the raw sort raises on (ndarray cells, an object column mixing
    # int and str, ...) is a frame the driver's own sort could raise on, so
    # it must FAIL here loudly even if canonicalized strings would compare
    # equal. Queries are expected to emit scalar, single-typed columns
    # (QueryOutputLintSpec enforces the scalar half at the registry level).
    df = df.sort_values(list(df.columns), kind="mergesort")
    rows = []
    for t in df.itertuples(index=False, name=None):
        rows.append(",".join(canon_cell(c) for c in t))
    # Still sort the canonical strings afterward: equality is order-insensitive
    # either way, and this keeps the compare stable where pandas ordering of
    # equal-value cells could differ between engines.
    return sorted(rows), list(df.columns)


def main():
    out = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    with open(f"{out}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    for name in sorted(oracle):
        if only and name not in only:
            continue
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no engine output")
            n_fail += 1
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        try:
            erows, ecols = canon_df(exp)
            grows, gcols = canon_df(got)
        except Exception as e:
            # A canonicalization crash (e.g. pandas refusing to sort an
            # ndarray-valued column) is a loud FAIL, never a skipped row.
            print(f"FAIL {name}: canonicalization error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if [c.lower() for c in ecols] != [c.lower() for c in gcols]:
            print(f"FAIL {name}: columns differ: oracle={ecols} engine={gcols}")
            n_fail += 1
            continue
        if erows != grows:
            n_fail += 1
            print(f"FAIL {name}: rows differ (oracle {len(erows)} vs engine {len(grows)})")
            diff = [
                (a, b)
                for a, b in zip(erows, grows)
                if a != b
            ][:3]
            for a, b in diff:
                print(f"   oracle: {a[:160]}\n   engine: {b[:160]}")
            if len(erows) != len(grows):
                eset, gset = set(erows), set(grows)
                for r in list(eset - gset)[:2]:
                    print(f"   only-oracle: {r[:160]}")
                for r in list(gset - eset)[:2]:
                    print(f"   only-engine: {r[:160]}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(erows)} rows)")
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
