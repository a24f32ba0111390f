#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle gate: compare each
Verify.scala parquet dump against the oracle SQL run by DuckDB on the same
tables. Usage: compare_oracle.py <sfDir> <verifyOutDir>"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = repr(v)
            else:
                v = str(v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_rows, got_cols = got.fetchall(), [d[0] for d in got.description]
            want = con.execute(sql)
            want_rows, want_cols = want.fetchall(), [d[0] for d in want.description]
        except Exception as e:
            print(f"FAIL {name}: exec error {e}")
            n_bad += 1
            continue
        gc, gr = canon(got_rows, got_cols)
        wc, wr = canon(want_rows, want_cols)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} vs oracle {wc}")
            n_bad += 1
        elif gr != wr:
            n_bad += 1
            diffs = [(a, b) for a, b in zip(gr, wr) if a != b]
            print(f"FAIL {name}: {len(gr)} vs {len(wr)} rows, "
                  f"{len(diffs)} differing; first: ")
            for a, b in diffs[:3]:
                print(f"   spark={a}\n   duck ={b}")
            if len(gr) != len(wr):
                only_g = set(gr) - set(wr)
                only_w = set(wr) - set(gr)
                for x in list(only_g)[:2]:
                    print(f"   only-spark={x}")
                for x in list(only_w)[:2]:
                    print(f"   only-duck ={x}")
        else:
            n_ok += 1
            print(f"ok   {name} ({len(gr)} rows)")
    print(f"\n{n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
