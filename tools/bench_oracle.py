#!/usr/bin/env python3
"""Time every oracle SQL from oracle_sql.json in DuckDB (threads=32)
over the given sf dir — the baseline side of the bench comparison,
measured on the SAME machine state as the Spark run.

Per-query timing is min-of-N (default 2, env ORACLE_BENCH_REPEAT) to
mirror the Spark side's SPARK_GRAFT_BENCH_REPEAT: DuckDB's vector/
list-heavy queries swing 3-5x between windows on one pass (r12
PLANS.md), so a single-pass oracle made per-query ratios noisy in the
oracle's disfavor. The first pass additionally pays page-cache
first-touch; min-of-2 removes both asymmetries.

usage: bench_oracle.py <sfDir> <oracle_sql.json> [out.json]
"""
import json
import os
import sys
import time
import glob

import duckdb


def main() -> None:
    sf_dir = sys.argv[1]
    oracle_path = sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else None
    repeat = max(1, int(os.environ.get("ORACLE_BENCH_REPEAT", "2")))
    with open(oracle_path) as fh:
        oracles = json.load(fh)
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}/*.parquet')"
            if os.path.isdir(p)
            else f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')"
        )
    # ORACLE_BENCH_ONLY=q_a,q_b times a subset (the scale-step paired
    # window needs only the heaviest queries at the synthetic SF)
    only = os.environ.get("ORACLE_BENCH_ONLY")
    if only:
        keep = set(only.split(","))
        oracles = {k: v for k, v in oracles.items() if k in keep}
    times = {}
    failed = []
    for name in sorted(oracles):
        best = None
        for _ in range(repeat):
            t0 = time.time()
            try:
                con.execute(oracles[name]).fetchall()
            except Exception as exc:  # noqa: BLE001
                failed.append(name)
                print(f"FAIL {name}: {exc}", file=sys.stderr)
                best = None
                break
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        if best is not None:
            times[name] = best
    doc = {
        "metric": "oracle_total",
        "value": sum(times.values()),
        "unit": "sec",
        "queries": times,
        "failed": failed,
        "repeat": repeat,
        "sf": sf_dir,
    }
    line = json.dumps(doc)
    print(line)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
