#!/usr/bin/env python3
"""Local dev harness that mimics the driver's correctness gate:
run `graft.Verify` output (parquet per query + oracle_sql.json) against
DuckDB over the same testdata tables, compare exactly.

Dev-side tooling only — the shipped Scala library never depends on this.

Usage: python3 tools/local_verify.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        ok, msg = compare(got, exp)
        if ok:
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows)")
        else:
            n_fail += 1
            print(f"FAIL {name}: {msg}")
    print(f"== {n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

def compare(got, exp):
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        return False, f"schema mismatch: spark={gc} duck={ec}"
    got, exp = got[gc], exp[gc]
    if len(got) != len(exp):
        return False, f"row count: spark={len(got)} duck={len(exp)}"
    def norm_cell(v):
        # list/array cells (quantilesExact, the array-math battery) compare
        # structurally — tuples are hashable and element-order-preserving
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return tuple(norm_cell(x) for x in v)
        return v
    for c in gc:
        g, e = got[c], exp[c]
        if g.dtype == object or e.dtype == object:
            g = g.map(norm_cell)
            e = e.map(norm_cell)
        # Driver-gate fidelity: the driver hashes FORMATTED values, so an
        # int64 506627 vs float64 506627.0 is a hash mismatch even when every
        # value is numerically equal (DuckDB SUM(BIGINT)→HUGEINT→float64 via
        # pandas). Casting the mismatch away (the pre-round-9 behavior) made
        # this class of oracle typing slip pass locally and fail the driver.
        g_kind, e_kind = g.dtype.kind, e.dtype.kind
        if {g_kind, e_kind} <= {"i", "u", "f"} and ("f" in (g_kind, e_kind)) \
                and g_kind != e_kind:
            return False, (f"col {c} int/float dtype mismatch "
                           f"(spark={g.dtype} duck={e.dtype}) — the driver's "
                           f"formatted-value hash WILL reject this; cast the "
                           f"oracle (e.g. CAST(SUM(x) AS BIGINT)) or the "
                           f"Spark column so kinds agree")
        try:
            g2 = g.astype(e.dtype) if g.dtype != e.dtype else g
        except Exception:
            g2 = g
        eq = (g2.values == e.values) | (pd.isna(g2).values & pd.isna(e).values)
        if not eq.all():
            i = int((~eq).argmax())
            return False, (f"col {c} (dtypes {g.dtype}/{e.dtype}) differs at row {i}: "
                           f"spark={g.iloc[i]!r} duck={e.iloc[i]!r}")
    return True, ""

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
