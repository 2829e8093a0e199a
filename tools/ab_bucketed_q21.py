#!/usr/bin/env python
"""Bucketed-table twin for q_tpch_q21 (the heaviest TPC-H-completion
row: 9-10 s at x100, dominated by the li/o SortMergeJoin sorts plus
the orderkey window).

Bucketing orders+lineitem on orderkey (sinks.save_bucketed_table, the
same once-per-ingest layout as tools/ab_bucketed_tpch.py) makes the
li⋈o join shuffle-free AND pre-sorted — and the window over
l_orderkey can ride the same bucket sort, so the plan's only
exchange is the ≤|suppliers| rollup. Same session, interleaved
min-of-3 after an sf0.001 warm; results pinned equal at x100 first.

Usage: python tools/ab_bucketed_q21.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO_ROOT, ".cache", "x100")
REPS = 3
N_BUCKETS = 32


def main() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from duckdb_pst_spark.registry import load_all
    from duckdb_pst_spark.session import get_spark
    from duckdb_pst_spark.sinks import save_bucketed_table
    from duckdb_pst_spark.tables import table

    spark = get_spark("ab-bucketed-q21")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()

    t0 = time.perf_counter()
    save_bucketed_table(
        table(spark, SF, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate"),
        "li_b21",
        bucket_by=["l_orderkey"],
        n_buckets=N_BUCKETS,
        sort_by=["l_orderkey"],
    )
    save_bucketed_table(
        table(spark, SF, "orders").select(
            "o_orderkey", "o_orderdate", "o_orderstatus"
        ),
        "o_b21",
        bucket_by=["o_orderkey"],
        n_buckets=N_BUCKETS,
        sort_by=["o_orderkey"],
    )
    t_bucket = round(time.perf_counter() - t0, 2)
    print(f"one-time bucketing: {t_bucket}s", file=sys.stderr)

    def q21_bucketed(spark, sf_dir):
        o = (
            spark.table("o_b21")
            .filter(F.col("o_orderstatus") == "F")
            .select("o_orderkey", "o_orderdate")
        )
        li = spark.table("li_b21")
        j = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).withColumn(
            "late",
            F.col("l_shipdate")
            >= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
        )
        w = Window.partitionBy("l_orderkey")
        j = j.withColumn(
            "n_supp", F.size(F.collect_set("l_suppkey").over(w))
        ).withColumn(
            "n_late",
            F.size(
                F.collect_set(F.when(F.col("late"), F.col("l_suppkey"))).over(w)
            ),
        )
        r = table(spark, sf_dir, "region").filter(F.col("r_name") == "AFRICA")
        n = table(spark, sf_dir, "nation").join(
            F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
        )
        s = (
            table(spark, sf_dir, "supplier")
            .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", "s_name")
        )
        return (
            j.filter(
                F.col("late") & (F.col("n_supp") >= 2) & (F.col("n_late") == 1)
            )
            .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
            .orderBy(F.col("numwait").desc(), "s_name")
            .limit(100)
        )

    plain = lambda d: specs["q_tpch_q21"].builder(spark, d)

    a = sorted(map(tuple, plain(SF).collect()))
    b = sorted(map(tuple, q21_bucketed(spark, SF).collect()))
    assert a == b, (a[:5], b[:5])
    print("results equal at x100", file=sys.stderr)

    arms = {
        "plain": lambda: plain(SF),
        "bucketed": lambda: q21_bucketed(spark, SF),
    }
    best = {name: float("inf") for name in arms}
    for rep in range(REPS):
        for name, mk in arms.items():
            t0 = time.perf_counter()
            mk().write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            best[name] = min(best[name], dt)
            print(f"rep{rep} {name}: {dt:.2f}", file=sys.stderr)

    print({k: round(v, 2) for k, v in best.items()}, {"bucketing_s": t_bucket})
    spark.stop()


if __name__ == "__main__":
    main()
