#!/usr/bin/env python
"""Bucketed-table twin for the TPC-H star joins (VERDICT r7 item 4b).

The q_tpch_q5/q_tpch_q10 weak rows carry one dominant exchange — the
fact-side lineitem shuffle (60M records / 1.07 GiB at x100, measured by
tools/exchange_budget.py). Bucketing orders and lineitem on orderkey
(sinks.save_bucketed_table — the once-per-ingest co-location a 100 TB
deployment would do) makes the o⋈l SortMergeJoin shuffle-free on BOTH
sides; only the post-join result (~8.6M rows for Q5's year filter)
crosses a wire. This script measures:

  - one-time bucketing cost (60M-row write, amortized over every
    subsequent orderkey join),
  - Q5/Q10 over bucketed o+l vs the plain-parquet baseline, same
    session, interleaved min-of-3, x100,
  - the surviving exchange budget of the bucketed plan.

The bucketed variants join o⋈l FIRST (orderkey, bucket-aligned), then
the dims — same results (inner joins commute; Q5's oracle pins them).

Usage: python tools/ab_bucketed_tpch.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO_ROOT, ".cache", "x100")
REPS = 3
N_BUCKETS = 32


def main() -> None:
    from pyspark.sql import functions as F

    from duckdb_pst_spark.registry import load_all
    from duckdb_pst_spark.session import get_spark
    from duckdb_pst_spark.sinks import save_bucketed_table
    from duckdb_pst_spark.tables import table

    spark = get_spark("ab-bucketed")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()

    t0 = time.perf_counter()
    save_bucketed_table(
        table(spark, SF_DIR, "lineitem"),
        "li_b",
        bucket_by=["l_orderkey"],
        n_buckets=N_BUCKETS,
        sort_by=["l_orderkey"],
    )
    save_bucketed_table(
        table(spark, SF_DIR, "orders"),
        "o_b",
        bucket_by=["o_orderkey"],
        n_buckets=N_BUCKETS,
        sort_by=["o_orderkey"],
    )
    t_bucket = round(time.perf_counter() - t0, 2)
    print(f"one-time bucketing: {t_bucket}s", file=sys.stderr)

    def q5_bucketed(spark, sf_dir):
        li = spark.table("li_b")
        o = spark.table("o_b").filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        c = table(spark, sf_dir, "customer")
        s = table(spark, sf_dir, "supplier")
        n = table(spark, sf_dir, "nation")
        r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
        ol = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        olc = ol.join(c, F.col("o_custkey") == F.col("c_custkey"))
        ols = olc.join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        j = ols.join(
            F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
        ).join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        return (
            j.groupBy("n_name")
            .agg(
                F.sum(
                    F.floor(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                    ).cast("long")
                )
                .cast("long")
                .alias("revenue_c")
            )
            .orderBy(F.desc("revenue_c"), "n_name")
        )

    def q10_bucketed(spark, sf_dir):
        li = spark.table("li_b").filter(F.col("l_returnflag") == "R")
        o = spark.table("o_b").filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        c = table(spark, sf_dir, "customer")
        n = table(spark, sf_dir, "nation")
        ol = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        j = ol.join(c, F.col("o_custkey") == F.col("c_custkey")).join(
            F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey")
        )
        return (
            j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
            .agg(
                F.sum(
                    F.floor(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                    ).cast("long")
                )
                .cast("long")
                .alias("revenue_c")
            )
            .select(
                "c_custkey",
                "c_name",
                "revenue_c",
                F.floor(F.col("c_acctbal") * 100).cast("long").alias("acctbal_c"),
                "n_name",
            )
            .orderBy(F.desc("revenue_c"), "c_custkey")
            .limit(20)
        )

    # equality vs registered plans at the SAME sf (bucketed tables hold
    # SF_DIR data, so compare against the registered builder on SF_DIR)
    for name, twin in (("q_tpch_q5", q5_bucketed), ("q_tpch_q10", q10_bucketed)):
        a = [tuple(r) for r in specs[name].builder(spark, SF_DIR).collect()]
        b = [tuple(r) for r in twin(spark, SF_DIR).collect()]
        assert a == b, f"{name} twin diverges"
    print("twins equal at x100", file=sys.stderr)

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    variants = {
        "q5_plain": lambda: noop(specs["q_tpch_q5"].builder(spark, SF_DIR)),
        "q5_bucketed": lambda: noop(q5_bucketed(spark, SF_DIR)),
        "q10_plain": lambda: noop(specs["q_tpch_q10"].builder(spark, SF_DIR)),
        "q10_bucketed": lambda: noop(q10_bucketed(spark, SF_DIR)),
    }
    for fn in variants.values():
        fn()  # warm

    best = {k: float("inf") for k in variants}
    for rep in range(REPS):
        for k, fn in variants.items():
            t0 = time.perf_counter()
            fn()
            best[k] = min(best[k], time.perf_counter() - t0)
            print(f"rep{rep} {k}: {best[k]:.2f}", file=sys.stderr)

    from duckdb_pst_spark.plans import introspect as pi

    shuffles = {
        "q5_plain": pi.shuffle_count(specs["q_tpch_q5"].builder(spark, SF_DIR)),
        "q5_bucketed": pi.shuffle_count(q5_bucketed(spark, SF_DIR)),
        "q10_plain": pi.shuffle_count(specs["q_tpch_q10"].builder(spark, SF_DIR)),
        "q10_bucketed": pi.shuffle_count(q10_bucketed(spark, SF_DIR)),
    }
    out = {k: round(v, 2) for k, v in best.items()}
    out["bucketing_once"] = t_bucket
    out["shuffles"] = shuffles
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
