#!/usr/bin/env python3
"""Build the sf1 rehearsal dataset: the driver ships sf{0.001,0.01,0.1};
the round-13 verdict asked for ONE full-gate pass at sf1 to catch any
superlinear surprise the per-operator curves miss. sf1 = sf0.1 x 10 by
key-shifted replication (replica 0 keeps the original rows byte-for-byte,
so every query that filters literal ids still hits them):

 - lineitem/orders: orderkeys shift by replica * 150000 (the fact tables
   scale; o_custkey is left alone, so each customer simply carries 10x
   orders -- the dims-stay-small scaling a warehouse actually sees)
 - events: event_id shifts by replica * 100000 and user_id by
   replica * 1500 (disjoint users per replica: replicated SESSIONS must
   not interleave into one user's timeline)
 - documents/embeddings: doc_id/vec_id shift, payloads unchanged --
   replicas are EXACT duplicates, the hardest case for the dedup/ANN
   oracles (pair counts grow ~100x)
 - region/nation/customer/supplier/part: copied as-is (dimensions)

Both engines (Spark via graft.Verify, DuckDB via local_verify.py) read
the SAME files, so the correctness comparison is as honest as the
driver's own gate. Usage: python3 tools/make_sf1.py [outdir=/tmp/sf1]
"""
import sys
import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
REPLICAS = 10

SHIFTS = {  # table -> {column: stride}
    "lineitem": {"l_orderkey": 150000},
    "orders": {"o_orderkey": 150000},
    "events": {"event_id": 100000, "user_id": 1500},
    "documents": {"doc_id": 5000},
    "embeddings": {"vec_id": 2000},
}
COPY = ["region", "nation", "customer", "supplier", "part"]

def main():
    import os
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for t in COPY:
        con.sql(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                f"TO '{OUT}/{t}.parquet' (FORMAT parquet)")
        print(f"{t}: copied")
    for t, shifts in SHIFTS.items():
        cols = [c[0] for c in
                con.sql(f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
        sel = ", ".join(
            f"{c} + r.r * {shifts[c]} AS {c}" if c in shifts else c
            for c in cols)
        con.sql(f"COPY (SELECT {sel} FROM '{SRC}/{t}.parquet', "
                f"(SELECT unnest(generate_series(0, {REPLICAS - 1})) AS r) r "
                f"ORDER BY r.r) TO '{OUT}/{t}.parquet' (FORMAT parquet)")
        n = con.sql(f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")

if __name__ == "__main__":
    main()
