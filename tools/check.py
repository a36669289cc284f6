#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare Verify parquet
outputs against the DuckDB oracle SQL, column-name-sorted, row-sorted.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        kind="mergesort", na_position="last")
    return df


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        # STRICT: the driver hash-compares, so floats must be bit-equal —
        # the engine is designed for cross-engine bit-exactness (decimal
        # accumulation, ordered folds, string-semantics rounding).
        return (math.isnan(a) and math.isnan(b)) or a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    import os
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table = a directory of parts
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            expected = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        try:
            actual = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        e_c, a_c = canon(expected), canon(actual)
        if list(e_c.columns) != list(a_c.columns):
            print(f"FAIL {name}: columns oracle={list(e_c.columns)} "
                  f"spark={list(a_c.columns)}")
            n_fail += 1
            continue
        if len(e_c) != len(a_c):
            print(f"FAIL {name}: rows oracle={len(e_c)} spark={len(a_c)}")
            n_fail += 1
            continue
        # The driver's hash is dtype-sensitive (int64 vs float64 on the
        # same values hash-mismatches) — surface dtype diffs loudly even
        # though the value compare below is dtype-blind.
        dt = [(c, str(e_c[c].dtype), str(a_c[c].dtype)) for c in e_c.columns
              if str(e_c[c].dtype) != str(a_c[c].dtype)]
        for c, ed, ad in dt:
            print(f"  DTYPE {name}.{c}: oracle={ed} spark={ad}")
        bad = None
        for col in e_c.columns:
            ev, av = e_c[col].tolist(), a_c[col].tolist()
            for i, (x, y) in enumerate(zip(ev, av)):
                if not values_equal(x, y):
                    bad = (col, i, x, y)
                    break
            if bad:
                break
        if bad:
            col, i, x, y = bad
            print(f"FAIL {name}: value mismatch col={col} row={i} "
                  f"oracle={x!r} spark={y!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(e_c)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
