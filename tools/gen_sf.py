#!/usr/bin/env python
"""Generate a larger scale factor from the driver's sf0.1 tables by
key-consistent replication (for scaling measurements — NOT a driver
artifact; driver testdata stays read-only).

Each copy i offsets every surrogate key (custkey, orderkey, partkey,
suppkey, doc_id, vec_id, event_id, user_id) by i·span so foreign-key
relationships survive: replicated orders reference replicated customers,
lineitems their orders, events their users. Fixed-cardinality dimensions
(region, nation) are NOT replicated — exactly how TPC-H scales.

Usage: python tools/gen_sf.py [factor] [src_dir] [dst_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SRC = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
DST = (
    sys.argv[3]
    if len(sys.argv) > 3
    else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache", "sf1")
)

# table -> columns to offset by i*span (span = 1 + max over all copies' key space)
OFFSETS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "region": [],
    "nation": [],
}


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    for t, keys in OFFSETS.items():
        src = f"{SRC}/{t}.parquet"
        if not keys or FACTOR == 1:
            con.execute(f"COPY (SELECT * FROM '{src}') TO '{DST}/{t}.parquet' (FORMAT parquet)")
            continue
        spans = {
            k: con.execute(f"SELECT max({k}) + 1 FROM '{src}'").fetchone()[0] for k in keys
        }
        cols = [d[0] for d in con.execute(f"SELECT * FROM '{src}' LIMIT 0").description]
        parts = []
        for i in range(FACTOR):
            sel = ", ".join(
                f"{c} + {i * spans[c]} AS {c}" if c in spans else c for c in cols
            )
            parts.append(f"SELECT {sel} FROM '{src}'")
        union = " UNION ALL ".join(parts)
        con.execute(f"COPY ({union}) TO '{DST}/{t}.parquet' (FORMAT parquet)")
        print(f"{t}: x{FACTOR}")
    print("wrote", DST)


if __name__ == "__main__":
    main()
