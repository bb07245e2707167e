#!/usr/bin/env python3
"""Parallel flavor of local_verify.py for the BIG rehearsal SFs: same
per-query compare (imported from local_verify — one implementation), but
queries fan out over a process pool, and --skip excludes oracles that are
structurally infeasible at the target SF (e.g. q117's DuckDB mirror is a
recursive-CTE TRANSITIVE CLOSURE — O(component²) reach rows — which at
sf1's giant merged component means ~4e8 rows; the ENGINE side completes
fine, and the oracle equality stands at sf0.01/sf0.1 where the closure is
tractable). Skips are reported loudly, never silently.

Usage: python3 tools/verify_parallel.py <sfDir> <verifyOutDir> \
          [--jobs N] [--skip q117_semantic_dedup,...]
"""
import sys, json, glob, os
from multiprocessing import Pool

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import local_verify  # noqa: E402  (compare() is the shared gate compare)


def run_one(args):
    sf_dir, out_dir, name, sql = args
    import duckdb
    import pandas as pd
    try:
        con = duckdb.connect()
        con.execute("SET threads=4")
        # workers run concurrently: without a per-worker cap each one
        # defaults to ~80% of RAM and a few heavy oracles together OOM
        con.execute("SET memory_limit='10GB'")
        for t in local_verify.TABLES:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        if not glob.glob(f"{out_dir}/{name}/*.parquet"):
            return (name, False, "no spark output", 0)
        got = pd.read_parquet(f"{out_dir}/{name}")
        exp = con.execute(sql).fetchdf()
        ok, msg = local_verify.compare(got, exp)
        return (name, ok, msg, len(got))
    except Exception as e:
        return (name, False, str(e)[:300], 0)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    jobs = 8
    skip = set()
    for i, a in enumerate(sys.argv):
        if a == "--jobs":
            jobs = int(sys.argv[i + 1])
        if a == "--skip":
            skip = set(sys.argv[i + 1].split(","))
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    tasks = [(sf_dir, out_dir, n, oracle[n])
             for n in sorted(oracle) if n not in skip]
    n_pass = n_fail = 0
    with Pool(jobs) as pool:
        for name, ok, msg, rows in pool.imap_unordered(run_one, tasks):
            if ok:
                n_pass += 1
                print(f"PASS {name} ({rows} rows)", flush=True)
            else:
                n_fail += 1
                print(f"FAIL {name}: {msg}", flush=True)
    for s in sorted(skip & set(oracle)):
        print(f"SKIP {s} (excluded by --skip; see header docstring)")
    print(f"== {n_pass} pass / {n_fail} fail / {len(skip & set(oracle))} skipped")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
