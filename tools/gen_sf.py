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

# Key DOMAINS: one span per domain, computed from the OWNING dimension's
# key column — never from a referencing column. (A referencing column's
# own max underestimates the domain when the dimension has an
# unreferenced tail: in TPC-H ~1/3 of customers place no orders, so
# max(o_custkey) < max(c_custkey) and per-column spans would point
# copy-i orders at the wrong copy's customers.)
DOMAINS = {
    "custkey": ("customer", "c_custkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "partkey": ("part", "p_partkey"),
    "orderkey": ("orders", "o_orderkey"),
    "event_id": ("events", "event_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}

# table -> {column: key domain}; every referencing column reuses its
# owner's span so FK relationships survive replication exactly
OFFSETS = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey", "l_suppkey": "suppkey"},
    # events.user_id draws from the customer key domain (q_range_join
    # joins events.user_id to c_custkey)
    "events": {"event_id": "event_id", "user_id": "custkey"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
    "region": {},
    "nation": {},
}


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    spans = {
        d: con.execute(f"SELECT max({col}) + 1 FROM '{SRC}/{t}.parquet'").fetchone()[0]
        for d, (t, col) in DOMAINS.items()
    }
    for t, keys in OFFSETS.items():
        src = f"{SRC}/{t}.parquet"
        if not keys or FACTOR == 1:
            con.execute(f"COPY (SELECT * FROM '{src}') TO '{DST}/{t}.parquet' (FORMAT parquet)")
            continue
        cols = [d[0] for d in con.execute(f"SELECT * FROM '{src}' LIMIT 0").description]
        parts = []
        for i in range(FACTOR):
            sel = ", ".join(
                f"{c} + {i * spans[keys[c]]} AS {c}" if c in keys else c for c in cols
            )
            parts.append(f"SELECT {sel} FROM '{src}'")
        union = " UNION ALL ".join(parts)
        con.execute(f"COPY ({union}) TO '{DST}/{t}.parquet' (FORMAT parquet)")
        print(f"{t}: x{FACTOR}")
    print("wrote", DST)


if __name__ == "__main__":
    main()
