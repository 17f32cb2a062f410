#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query output
written by graft.Verify, run the oracle SQL in DuckDB over the same sf dir
and compare (columns sorted by name, values compared row-by-row in order,
with exact match expected — floats were rounded engine-side).

Usage: check.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, dict):
        return {k: canon(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [canon(x) for x in v]
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # replica-scale runs fan out one checker process per query
    # (tools/check_budget.py): bound each worker so N parallel DuckDBs
    # don't each claim 80% of RAM / every core. Unset = old behavior.
    if os.environ.get("GRAFT_DUCK_THREADS"):
        con.sql(f"SET threads TO {int(os.environ['GRAFT_DUCK_THREADS'])}")
    if os.environ.get("GRAFT_DUCK_MEM"):
        con.sql(f"SET memory_limit = '{os.environ['GRAFT_DUCK_MEM']}'")
    if os.environ.get("GRAFT_DUCK_TMP"):
        # spill isolation: by default every in-memory DuckDB spills to
        # cwd-relative ".tmp" — N parallel workers then SHARE one dir
        # (remove races) and can fill the disk together (both observed
        # at the 1000x gate). Give each worker its own dir, capped, so
        # one runaway oracle aborts itself instead of the whole fleet.
        d = os.path.join(
            os.environ["GRAFT_DUCK_TMP"],
            sys.argv[3] if len(sys.argv) == 4 else f"pid{os.getpid()}")
        os.makedirs(d, exist_ok=True)
        con.sql(f"SET temp_directory = '{d}'")
        try:
            cap = os.environ.get("GRAFT_DUCK_TMP_MAX", "18GB")
            con.sql(f"SET max_temp_directory_size = '{cap}'")
        except Exception:
            pass  # setting absent in older DuckDB; dir isolation still holds
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = sorted(got.columns)
            got_rows = [
                canon([r[got.columns.index(c)] for c in got_cols])
                for r in got.fetchall()]
            exp = con.sql(sql)
            exp_cols = sorted(exp.columns)
            exp_rows = [
                canon([r[exp.columns.index(c)] for c in exp_cols])
                for r in exp.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: error: {e}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            n_fail += 1
        elif got_rows != exp_rows:
            n_fail += 1
            print(f"FAIL {name}: {len(got_rows)} rows vs {len(exp_rows)} rows")
            for i, (g, e) in enumerate(zip(got_rows, exp_rows)):
                if g != e:
                    print(f"  first diff at row {i}:\n   got {g}\n   exp {e}")
                    break
            else:
                if len(got_rows) != len(exp_rows):
                    print(f"  row-count diff; got head {got_rows[:2]} exp head {exp_rows[:2]}")
        else:
            print(f"PASS {name} ({len(got_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
