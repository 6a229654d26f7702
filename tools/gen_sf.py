"""Scale-stress data generator: replicate a testdata SF directory K times.

The driver's testdata tops out at sf0.1; the scale-stress evidence run
(VERDICT r3, next-round item 6) needs sf1. This produces it by
replicating every table K times with per-replica key offsets — each
entity/order/document key space grows K-fold (so group counts, join
cardinalities and shuffle widths scale like real data), while
non-key attributes are exact copies (deterministic, no RNG, no
distribution drift). Fixed dimension tables (region, nation) are copied
once. Output parquet is written by DuckDB with naive timestamps —
the same physical form the driver's generator emits, so the
inferTimestampNTZ guard path is exercised identically.

Usage: python tools/gen_sf.py [--src DIR] [--dst DIR] [--k 10]
"""

from __future__ import annotations

import argparse
import os

import duckdb

# table -> columns that get a per-replica offset of (max(col over ALL
# rows of its owning table) + 1) * replica. Foreign keys share the owning
# table's span so referential joins keep matching within a replica.
OFFSETS: dict[str, dict[str, tuple[str, str]]] = {
    "customer": {"c_custkey": ("customer", "c_custkey")},
    "supplier": {"s_suppkey": ("supplier", "s_suppkey")},
    "part": {"p_partkey": ("part", "p_partkey")},
    "orders": {"o_orderkey": ("orders", "o_orderkey"),
               "o_custkey": ("customer", "c_custkey")},
    "lineitem": {"l_orderkey": ("orders", "o_orderkey"),
                 "l_partkey": ("part", "p_partkey"),
                 "l_suppkey": ("supplier", "s_suppkey")},
    "events": {"event_id": ("events", "event_id"),
               "user_id": ("events", "user_id")},
    "documents": {"doc_id": ("documents", "doc_id")},
    "embeddings": {"vec_id": ("embeddings", "vec_id")},
}
COPY_ONLY = ["region", "nation"]


def generate(src: str, dst: str, k: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    spans: dict[tuple[str, str], int] = {}
    for table, cols in OFFSETS.items():
        for col, (owner, ocol) in cols.items():
            if (owner, ocol) not in spans:
                spans[(owner, ocol)] = con.sql(
                    f"SELECT max({ocol}) + 1 FROM "
                    f"'{src}/{owner}.parquet'").fetchone()[0]
    for table in COPY_ONLY:
        con.sql(f"COPY (SELECT * FROM '{src}/{table}.parquet') TO "
                f"'{dst}/{table}.parquet' (FORMAT PARQUET)")
        print(f"{table}: copied")
    for table, cols in OFFSETS.items():
        schema = [r[0] for r in con.sql(
            f"DESCRIBE SELECT * FROM '{src}/{table}.parquet'").fetchall()]
        select = ", ".join(
            f"t.{c} + r.i * {spans[cols[c]]} AS {c}" if c in cols else f"t.{c}"
            for c in schema)
        con.sql(f"COPY (SELECT {select} FROM '{src}/{table}.parquet' t "
                f"CROSS JOIN range({k}) r(i)) TO '{dst}/{table}.parquet' "
                f"(FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n:,} rows (x{k})")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/root/repo/testdata_sf1")
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()
    generate(args.src, args.dst, args.k)
