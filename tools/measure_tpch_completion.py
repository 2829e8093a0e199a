#!/usr/bin/env python
"""Registration-day measurement for the TPC-H completion batch
(Q2, Q7, Q8, Q9, Q11, Q16, Q20, Q21, Q22) at plain x100.

Standard discipline (SCALE.md): DuckDB floors FIRST in this JVM-free
process (min-of-3 after one warm run, 32 threads), then ONE Spark
session, every plan warmed at sf0.001, interleaved min-of-3, idle box.

Usage: python tools/measure_tpch_completion.py  — prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

X100 = os.path.join(REPO_ROOT, ".cache", "x100")

QUERIES = [
    "q_tpch_q2",
    "q_tpch_q7",
    "q_tpch_q8",
    "q_tpch_q9",
    "q_tpch_q11",
    "q_tpch_q16",
    "q_tpch_q20",
    "q_tpch_q21",
    "q_tpch_q22",
]

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()
REPS = 3


def duck_floors() -> dict[str, float]:
    import duckdb

    from duckdb_pst_spark.registry import load_all

    specs = load_all()
    out: dict[str, float] = {}
    for name in QUERIES:
        con = duckdb.connect()
        con.execute("SET threads TO 32")
        for t in TABLES:
            p = f"{X100}/{t}.parquet"
            if os.path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        sql = specs[name].oracle
        # Materialize the FULL oracle result (round-8 advisor fix): a
        # count(*) wrapper let DuckDB prune unused output projections
        # and subquery ORDER BYs (Q9's profit arithmetic, Q8's ppm
        # division), systematically under-pricing the floor while the
        # Spark arm executes the full query through the noop sink.
        con.execute(sql).fetch_arrow_table()
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            con.execute(sql).fetch_arrow_table()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 2)
        con.close()
        print(f"duck {name}: {out[name]}", file=sys.stderr)
    return out


def main() -> None:
    duck = duck_floors()

    from duckdb_pst_spark.registry import load_all
    from duckdb_pst_spark.session import free_checkpoints, get_spark

    spark = get_spark("measure-tpch-completion")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()

    def noop(name: str, d: str) -> None:
        specs[name].builder(spark, d).write.mode("overwrite").format("noop").save()

    for name in QUERIES:
        noop(name, "/root/testdata/sf0.001")

    best = {name: float("inf") for name in QUERIES}
    for rep in range(REPS):
        for name in QUERIES:
            free_checkpoints(spark)  # q_tpch_q11 localCheckpoints its view
            t0 = time.perf_counter()
            noop(name, X100)
            dt = time.perf_counter() - t0
            best[name] = min(best[name], dt)
            print(f"rep{rep} {name}: {dt:.2f}", file=sys.stderr)

    rows = {
        name: {
            "spark": round(best[name], 2),
            "duckdb": duck[name],
            "ratio": round(best[name] / duck[name], 2) if duck[name] else None,
        }
        for name in QUERIES
    }
    print(json.dumps(rows))
    spark.stop()


if __name__ == "__main__":
    main()
