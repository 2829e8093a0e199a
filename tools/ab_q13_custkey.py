#!/usr/bin/env python
"""Custkey-layout twin prototype for q_tpch_q13 (round 11).

Q13's plain plan has exactly one corpus-sized exchange: orders
shuffled by custkey into the LEFT OUTER join with customer (the
per-customer count rides the join partitioning, the histogram rollup
is ~a dozen rows). A custkey-bucketed (customer, orders) layout — the
THIRD layout family after orderkey and partkey — would delete it: the
SMJ reads co-bucketed per-bucket-sorted scans, the residual priority
predicate attaches to the join, and only the count-of-counts rollup
crosses a wire (the Q12 contract class).

Measure-before-ship (the Q16 discipline): this prototype times the
twin against the registered plain, same session, interleaved
min-of-3, results pinned equal first. Ship as a registered twin ONLY
if it cures; otherwise record the no-ship in SCALE.md.

OUTCOME (round 11): measured 0.32x at x10 (1.77 -> 0.57 s), 0.30x at
x100 (2.76 -> 0.82 s), layout once 13.6/17.9 s — SHIPPED as
`q_tpch_q13_bucketed` (operators/bucketed.py); the registered pair is
now also covered by tools/ab_bucketed_registered.py via TWIN_PAIRS.
This script remains as the measurement record.

Usage: python tools/ab_q13_custkey.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO_ROOT, ".cache", "x100")
REPS = 3


def main() -> None:
    from pyspark.sql import functions as F

    from duckdb_pst_spark.registry import load_all
    from duckdb_pst_spark.session import free_checkpoints, get_spark
    from duckdb_pst_spark.sinks import export_bucketed

    spark = get_spark("ab-q13-custkey")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()

    t0 = time.perf_counter()
    names = export_bucketed(
        spark, SF, key="custkey", tables=("customer", "orders"), n_buckets=32
    )
    t_layout = round(time.perf_counter() - t0, 2)
    print(f"one-time custkey layout: {t_layout}s", file=sys.stderr)

    def twin(spark, sf_dir):
        c_b = spark.table(names["customer"])
        o_b = spark.table(names["orders"])
        per_cust = (
            c_b.join(
                o_b.hint("merge"),
                (F.col("o_custkey") == F.col("c_custkey"))
                & (F.col("o_orderpriority") != "1-URGENT"),
                "left_outer",
            )
            .groupBy("c_custkey")
            .agg(F.count("o_orderkey").cast("long").alias("c_count"))
        )
        return per_cust.groupBy("c_count").agg(
            F.count(F.lit(1)).cast("long").alias("custdist")
        )

    plain = specs["q_tpch_q13"].builder

    # results pinned equal before timing
    a = sorted(map(tuple, plain(spark, SF).collect()))
    b = sorted(map(tuple, twin(spark, SF).collect()))
    assert a == b, (a[:5], b[:5])
    print(f"results pinned equal ({len(a)} histogram rows)", file=sys.stderr)

    # plan check: the twin must carry no exchange under the fact join
    p = twin(spark, SF)._jdf.queryExecution().executedPlan().toString()
    import re

    shuffles = re.findall(r"Exchange (hash|range)partitioning|Exchange SinglePartition", p)
    print(f"twin plan shuffle exchanges: {len(shuffles)} (histogram rollup only "
          f"expected)", file=sys.stderr)

    def noop(fn):
        fn(spark, SF).write.mode("overwrite").format("noop").save()

    noop(plain); noop(twin)  # warm
    best = {"plain": float("inf"), "twin": float("inf")}
    for _ in range(REPS):
        for arm, fn in (("plain", plain), ("twin", twin)):
            t0 = time.perf_counter()
            noop(fn)
            best[arm] = min(best[arm], time.perf_counter() - t0)
            free_checkpoints(spark)
    out = {
        "sf_dir": SF,
        "layout_once_s": t_layout,
        "plain_s": round(best["plain"], 2),
        "twin_s": round(best["twin"], 2),
        "ratio": round(best["twin"] / best["plain"], 2),
        "twin_plan_shuffles": len(shuffles),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
