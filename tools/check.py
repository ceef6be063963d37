#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Runs DuckDB on each oracle_sql.json entry (tables = sf parquet files),
loads the Spark result parquet, sorts columns by name and rows by all
columns, and compares exactly. Usage:

    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import glob
import json
import math
import os
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_tuple(v):
    """Array cells (Spark array<...> / DuckDB LIST) arrive as numpy arrays or
    lists; canonicalize to nested tuples so they sort and compare by value."""
    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, (list, tuple)):
        return tuple(to_tuple(x) for x in v)
    return v


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object and df[c].map(
                lambda v: isinstance(v, (list, tuple, np.ndarray))).any():
            df[c] = df[c].map(to_tuple)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def cell_eq(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    fails = 0
    for name in sorted(oracles):
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            fails += 1
            continue
        got = norm(con.execute(
            f"SELECT * FROM read_parquet('{os.path.join(out_dir, name)}/*.parquet')").fetchdf())
        try:
            rel = con.sql(oracles[name])
            # Type lint the ORACLE side before pandas normalization flattens
            # it: the driver hashes DECIMAL/HUGEINT differently than this
            # read-through-DuckDB compare (the r9 12-query incident), and
            # RegistrySchemaSpec can only see the Spark side. Fail loudly
            # here so the class can't ship through the local gate.
            banned = [(cn, str(ct)) for cn, ct in zip(rel.columns, rel.types)
                      if "DECIMAL" in str(ct).upper()
                      or "HUGEINT" in str(ct).upper()]
            if banned:
                print(f"FAIL {name}: oracle emits driver-unhashable types "
                      f"{banned} — CAST to VARCHAR/BIGINT/DOUBLE")
                fails += 1
                continue
            exp = norm(rel.fetchdf())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error {e}")
            fails += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            fails += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            fails += 1
            continue
        bad = None
        for c in got.columns:
            gv, ev = got[c].tolist(), exp[c].tolist()
            for i, (a, b) in enumerate(zip(gv, ev)):
                if not cell_eq(a, b):
                    bad = (c, i, a, b)
                    break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: col {c} row {i}: spark={a!r} oracle={b!r}")
            fails += 1
        else:
            print(f"OK   {name}: {len(got)} rows x {len(got.columns)} cols")
    missing = [n for n in os.listdir(out_dir)
               if os.path.isdir(os.path.join(out_dir, n)) and n not in oracles]
    for n in missing:
        print(f"NOTE {n}: no oracle (rows-only check by driver)")
    return fails


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
