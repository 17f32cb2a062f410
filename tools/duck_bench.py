#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB (32 threads) over the sf dir — the
single-node comparison column for BENCH_NOTES.

Usage: duck_bench.py <sfDir> <verifyOutDir-with-oracle_sql.json> [query ...]

Each query is run twice; the SECOND (warm-cache) time is reported, matching
how the Spark side is measured (warm JVM, warmed page cache). Results are
fully materialized (fetchall) so lazy execution can't undercount.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    con.sql("SET threads TO 32")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    times = {}
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            con.sql(sql).fetchall()          # warm
            t0 = time.monotonic()
            rows = con.sql(sql).fetchall()   # measured
            times[name] = round(time.monotonic() - t0, 3)
            print(f"{name}: {times[name]:.3f}s  ({len(rows)} rows)",
                  file=sys.stderr)
        except Exception as e:
            print(f"{name}: ERROR {e}", file=sys.stderr)
            times[name] = None
    ok = {k: v for k, v in times.items() if v is not None}
    print(json.dumps({"total": round(sum(ok.values()), 3), "queries": times}))


if __name__ == "__main__":
    main()
