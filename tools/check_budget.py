#!/usr/bin/env python3
"""Per-query-budgeted oracle gate for replica-scale Verify dumps
(VERDICT r12 item 1: extend cross-engine hash-exactness to the 100x
replica, where a handful of oracle SQLs — exact LSH/PPJoin at 500k docs
— are genuinely quadratic-ish in DuckDB and must be capped, not waited
on).

Runs tools/check.py once per query in its own subprocess with a wall
budget and bounded DuckDB resources, a few workers at a time, and
prints a final PASS/FAIL/SKIP(timeout) table plus a summary line for
BENCH_NOTES. Skips are recorded with their reason (oracle budget), not
silently dropped — the r12 "no silent caps" rule.

Usage: check_budget.py <sfDir> <verifyOutDir> [--budget SEC] [--workers N]
       [--only q1,q2,...]
"""
import json
import os
import shutil
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    budget = 900.0
    workers = 4
    only = None
    args = sys.argv[3:]
    while args:
        a = args.pop(0)
        if a == "--budget":
            budget = float(args.pop(0))
        elif a == "--workers":
            workers = int(args.pop(0))
        elif a == "--only":
            only = set(args.pop(0).split(","))
        else:
            raise SystemExit(f"unknown arg {a}")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(n for n in oracles if only is None or n in only)
    env = dict(os.environ)
    # each worker gets a bounded slice of the box; the totals stay under
    # the 32-core / 125 GB envelope with headroom for the page cache
    env.setdefault("GRAFT_DUCK_THREADS", str(max(4, 32 // workers)))
    env.setdefault("GRAFT_DUCK_MEM", "24GB")
    # per-query spill dirs (see check.py): isolated and capped so one
    # runaway oracle can't fill the disk or race a sibling's temp files
    env.setdefault("GRAFT_DUCK_TMP", f"/tmp/duck_spill_{os.getpid()}")

    def one(name):
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, os.path.join(HERE, "check.py"),
                 sf_dir, out_dir, name],
                capture_output=True, text=True, timeout=budget, env=env)
            dt = time.time() - t0
            ok = r.returncode == 0
            detail = (r.stdout.strip().splitlines() or ["(no output)"])[0]
            if not ok and detail == "(no output)":
                # a crashing worker (e.g. parquet binder failure) writes
                # its traceback to stderr only — surface the last
                # non-empty stderr line instead of "(no output)"
                err_lines = [l for l in r.stderr.strip().splitlines() if l]
                if err_lines:
                    detail = err_lines[-1]
            return (name, "PASS" if ok else "FAIL", dt, detail)
        except subprocess.TimeoutExpired:
            return (name, "SKIP", budget,
                    f"oracle exceeded {budget:.0f}s budget")
        finally:
            shutil.rmtree(os.path.join(env["GRAFT_DUCK_TMP"], name),
                          ignore_errors=True)

    results = []
    with ThreadPoolExecutor(max_workers=workers) as ex:
        for res in ex.map(one, names):
            results.append(res)
            print(f"{res[1]} {res[0]} ({res[2]:.1f}s) {res[3]}",
                  flush=True)
    n = {"PASS": 0, "FAIL": 0, "SKIP": 0}
    for _, st, _, _ in results:
        n[st] += 1
    skips = [r[0] for r in results if r[1] == "SKIP"]
    fails = [r[0] for r in results if r[1] == "FAIL"]
    print(f"== {n['PASS']} pass, {n['FAIL']} fail, {n['SKIP']} skip "
          f"of {len(names)} (budget {budget:.0f}s/query)")
    if skips:
        print("skipped (oracle budget):", ",".join(skips))
    if fails:
        print("failed:", ",".join(fails))
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
