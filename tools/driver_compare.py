#!/usr/bin/env python3
"""Faithful emulator of the driver's correctness gate (CORRECTNESS_r{N}.json):
loads the Spark parquet dump and the DuckDB oracle result as *pandas*
DataFrames, sorts columns by name, sorts rows by all columns, and compares a
per-cell stringified hash. This reproduces the pandas dtype coercions the
fetchall-based tools/compare_oracle.py hides (DuckDB HUGEINT -> float64,
arrays -> unhashable numpy.ndarray, etc.).

Usage: driver_compare.py <sfDir> <verifyOutDir> [query ...]
"""
import glob
import hashlib
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_hash(df: pd.DataFrame):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        for v in row:
            if isinstance(v, float):
                h.update(repr(round(v, 9)).encode())
            else:
                h.update(str(v).encode())
            h.update(b"|")
        h.update(b"\n")
    return h.hexdigest()


def main(sf_dir, out_dir, only):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d.split("/")[-1] for d in glob.glob(f"{out_dir}/*")
                   if not d.endswith(".json"))
    if only:
        names = [n for n in names if n in only]
    n_ok = n_bad = n_noora = 0
    for name in names:
        try:
            spark_df = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        except Exception as e:
            print(f"FAIL {name}: spark read error {e}")
            n_bad += 1
            continue
        if name not in oracle:
            # driver still sorts the spark side for the rows-only record
            try:
                canon_hash(spark_df)
                n_noora += 1
            except Exception as e:
                print(f"FAIL {name}: (no oracle) spark side unsortable: {e}")
                n_bad += 1
            continue
        try:
            want_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle exec error {e}")
            n_bad += 1
            continue
        try:
            gh = canon_hash(spark_df)
            wh = canon_hash(want_df)
        except Exception as e:
            print(f"FAIL {name}: canon error: {e}")
            n_bad += 1
            continue
        if sorted(spark_df.columns) != sorted(want_df.columns):
            print(f"FAIL {name}: cols {sorted(spark_df.columns)} vs {sorted(want_df.columns)}")
            n_bad += 1
        elif len(spark_df) != len(want_df):
            print(f"FAIL {name}: rows {len(spark_df)} vs {len(want_df)}")
            n_bad += 1
        elif gh != wh:
            n_bad += 1
            s = spark_df.reindex(sorted(spark_df.columns), axis=1).sort_values(
                by=sorted(spark_df.columns), kind="mergesort").reset_index(drop=True)
            w = want_df.reindex(sorted(want_df.columns), axis=1).sort_values(
                by=sorted(want_df.columns), kind="mergesort").reset_index(drop=True)
            print(f"FAIL {name}: hash mismatch; dtypes spark={dict(s.dtypes.astype(str))} "
                  f"oracle={dict(w.dtypes.astype(str))}")
            diff = 0
            for i in range(len(s)):
                if tuple(map(str, s.iloc[i])) != tuple(map(str, w.iloc[i])):
                    if diff < 3:
                        print(f"  row {i}: spark={list(s.iloc[i])} oracle={list(w.iloc[i])}")
                    diff += 1
            print(f"  {diff} differing rows")
        else:
            n_ok += 1
    print(f"OK={n_ok} NO_ORACLE={n_noora} BAD={n_bad}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
