#!/usr/bin/env python3
"""Sweep every oracle SQL for output columns whose DuckDB type would not
round-trip through the driver's pandas-based hasher.

Why: DuckDB's sum(INTEGER/BIGINT) returns HUGEINT (int128). Local
check.py compares via fetchall() (HUGEINT -> Python int -> equal), but
the driver's checker pandas-loads both sides — pandas coerces HUGEINT to
float64/object, so an uncast sum-derived OUTPUT column hashes as `0.0`
against Spark's `0`: rows_match/schema_match stay true while hash_match
goes false with no visible error (q212_curriculum, round 9). Same
hazard for DECIMAL. This sweep runs each oracle against the given SF dir
and flags any output column typed HUGEINT/UHUGEINT/DECIMAL — the fix is
always `CAST(... AS BIGINT)` (or DOUBLE) on the oracle side.

Usage: oracle_types.py <sfDir> <verifyOutDir-with-oracle_sql.json>
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

BAD = ("HUGEINT", "UHUGEINT", "DECIMAL")


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            rel = con.sql(sql)
            types = [str(t) for t in rel.types]
        except Exception as e:
            print(f"ERR  {name}: {e}")
            n_bad += 1
            continue
        flagged = [(c, t) for c, t in zip(rel.columns, types)
                   if any(t.startswith(b) for b in BAD)]
        if flagged:
            n_bad += 1
            print(f"FLAG {name}: {flagged}")
    print(f"== {n_bad} flagged of {len(oracles)}")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
