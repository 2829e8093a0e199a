#!/usr/bin/env python
"""Custkey-layout twin prototype for q_tpch_q22 (round 11).

Q22's plain plan has one fact-sized exchange (its own docstring names
it): the custkey LEFT ANTI of the country/balance-filtered customer
pool against the date-windowed orders scan. The custkey layout Q13's
twin ships already co-locates BOTH sides, so Q22 rides it for free:
anti-join FIRST as a merge-pinned SMJ over the two bucketed scans
(keeping the scans directly under the join — the 1-row threshold
broadcast would otherwise sit between scan and join as a BNLJ and
cost a local re-sort), then the broadcast above-mean threshold filter
(it commutes with the anti-join — both filter on pool attributes),
then the ≤7-group rollup.

Measure-before-ship (the Q16/Q13 discipline). Ship ONLY on a cure.

Usage: python tools/ab_q22_custkey.py [sf_dir]

OUTCOME (round 11): measured 0.85x at x10 (0.78 -> 0.67 s) and 0.48x
at x100 (1.85 -> 0.89 s) — the ratio improves with scale because the
deleted anti-join exchange is the growth term — SHIPPED as
`q_tpch_q22_bucketed` (operators/bucketed.py). This script remains as
the measurement record; the registered pair is covered by
ab_bucketed_registered.py. The twin plan's 3 remaining shuffles are
all constant-size (the 1-row threshold SinglePartition, the <=7-group
rollup, the orderBy range).
"""

from __future__ import annotations

import json
import os
import re
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

    spark = get_spark("ab-q22-custkey")
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
        pool = (
            c_b.filter(F.col("c_nationkey").isin(2, 5, 9, 13, 17, 21, 24))
            .select(
                "c_custkey",
                F.col("c_nationkey").cast("long").alias("cntrycode"),
                F.floor(F.col("c_acctbal") * 100).cast("long").alias("acctbal_c"),
            )
        )
        pos = pool.filter(F.col("acctbal_c") > 0).agg(
            F.expr("CAST(sum(acctbal_c) AS BIGINT) div count(*)").alias("thr")
        )
        recent = (
            o_b.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
            .select("o_custkey")
        )
        lapsed = pool.join(
            recent.hint("merge"),
            F.col("c_custkey") == F.col("o_custkey"), "left_anti",
        )
        return (
            lapsed.crossJoin(F.broadcast(pos))
            .filter(F.col("acctbal_c") > F.col("thr"))
            .groupBy("cntrycode")
            .agg(
                F.count(F.lit(1)).cast("long").alias("numcust"),
                F.sum("acctbal_c").cast("long").alias("totacctbal_c"),
            )
            .orderBy("cntrycode")
        )

    plain = specs["q_tpch_q22"].builder

    a = sorted(map(tuple, plain(spark, SF).collect()))
    b = sorted(map(tuple, twin(spark, SF).collect()))
    assert a == b, (a[:5], b[:5])
    print(f"results pinned equal ({len(a)} rows)", file=sys.stderr)

    p = twin(spark, SF)._jdf.queryExecution().executedPlan().toString()
    shuffles = re.findall(
        r"Exchange (hash|range)partitioning|Exchange SinglePartition", p
    )
    print(f"twin plan shuffle exchanges: {len(shuffles)}", file=sys.stderr)

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
