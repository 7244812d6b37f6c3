"""Synthesize an sf1-scale dataset (10x sf0.1) for the scaling probe.

The driver-provided fixtures stop at sf0.1 (TESTDATA.md) and are read-only.
For the r6 scaling probe (`bench.py --sf-dir .localdata/sf1`) this script
replicates sf0.1 ten times with per-replica key-domain offsets, keeping
every foreign key consistent (lineitem.l_orderkey of replica k joins
orders.o_orderkey of replica k, etc.). Dimension tables (region, nation)
are copied as-is: at real scale the dims stay small — that is exactly the
broadcast-join assumption the engine makes.

Value columns are byte-identical across replicas (dates, prices, text,
embeddings). That means: group-by-date cardinalities stay constant (the
realistic shape — 10x data is more rows per day, not more days), while
key cardinalities scale 10x; documents gain 10 exact copies each, which
stresses the dedup family with larger duplicate groups.

Usage: python scripts/make_sf1.py [src_dir] [dst_dir] [replicas]
Defaults: /root/testdata/sf0.1 → <repo>/.localdata/sf1, 10 replicas.
"""

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# key domains: column → the base-key-space stride multiplier source table
KEYED = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part", "l_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
COPY_ONLY = ["region", "nation"]


def main(src: str, dst: str, replicas: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    strides = {}
    probe = {
        "cust": ("customer", "c_custkey"),
        "supp": ("supplier", "s_suppkey"),
        "part": ("part", "p_partkey"),
        "order": ("orders", "o_orderkey"),
        "event": ("events", "event_id"),
        "user": ("events", "user_id"),
        "doc": ("documents", "doc_id"),
        "vec": ("embeddings", "vec_id"),
    }
    for dom, (tbl, col) in probe.items():
        strides[dom] = (
            con.sql(f"SELECT max({col}) + 1 FROM '{src}/{tbl}.parquet'").fetchone()[0]
        )
    for tbl in COPY_ONLY:
        con.sql(
            f"COPY (SELECT * FROM '{src}/{tbl}.parquet') TO "
            f"'{dst}/{tbl}.parquet' (FORMAT PARQUET)"
        )
    for tbl, keymap in KEYED.items():
        cols = [
            c[0]
            for c in con.sql(
                f"DESCRIBE SELECT * FROM '{src}/{tbl}.parquet'"
            ).fetchall()
        ]
        sel = ", ".join(
            f"{c} + r.k * {strides[keymap[c]]} AS {c}" if c in keymap else c
            for c in cols
        )
        con.sql(
            f"COPY (SELECT {sel} FROM '{src}/{tbl}.parquet', "
            f"range({replicas}) r(k)) TO '{dst}/{tbl}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT count(*) FROM '{dst}/{tbl}.parquet'").fetchone()[0]
        print(f"{tbl}: {n} rows")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, ".localdata", "sf1")
    replicas = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    main(src, dst, replicas)
