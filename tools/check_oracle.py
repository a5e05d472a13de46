#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs
the matching SQL from oracle_sql.json in DuckDB against the sfDir tables,
and compares row count, sorted-by-name column set, and a hash of all
values (columns sorted by name, rows sorted by all columns).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes to strings for hashing parity
    out = df.copy()
    for c in out.columns:
        col = out[c]
        if col.dtype == object:
            out[c] = col.map(lambda v: repr(v))
        elif str(col.dtype).startswith("float"):
            out[c] = col.map(lambda v: "%.9g" % v if pd.notna(v) else "NaN")
        else:
            out[c] = col.astype(str)
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        # dtype-family mismatch (int vs float) survives value-level canon
        # but fails the driver's hash (e.g. DuckDB HUGEINT -> float64)
        kinds_g = {c: got[c].dtype.kind for c in sorted(got.columns)}
        kinds_w = {c: want[c].dtype.kind for c in sorted(want.columns)}
        if set(kinds_g) == set(kinds_w):
            drift = {c: (kinds_g[c], kinds_w[c]) for c in kinds_g
                     if kinds_g[c] != kinds_w[c]}
            if drift:
                print(f"FAIL {name}: dtype drift {drift}")
                n_fail += 1
                continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            n_fail += 1
            continue
        if not g.equals(w):
            diff = (g != w).any(axis=1)
            print(f"FAIL {name}: value mismatch on {int(diff.sum())} rows")
            bad = diff[diff].index[:3]
            for i in bad:
                print(f"  spark: {g.loc[i].to_dict()}")
                print(f"  duck : {w.loc[i].to_dict()}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(g)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
