#!/usr/bin/env python
"""Bucketed-table twins for q_tpch_q7 and q_tpch_q9 — the two
completion-batch rows whose x100 exchange budget is dominated by the
li⋈o orderkey join plus a static-planner SMJ on a small filtered
side (SCALE.md round-8 section).

Twin = the deployment layout + the per-query conf a deployment would
set: orders+lineitem bucketed on orderkey (32 buckets, sorted — the
same once-per-ingest layout as the Q4/Q12/Q21 twins) and an explicit
broadcast of the KNOWN-small side (Q7's two-nation supplier subset,
Q9's name-filtered part slice) that Spark's size-product join
estimate refuses statically. In the registered plans those hints
would be scale-unsafe (part/supplier grow with the corpus); in a
deployment twin they document "this side fits HERE".

Same session, interleaved min-of-3 after an sf0.001 warm; results
pinned equal at x100 first.

Usage: python tools/ab_bucketed_q7q9.py [sf_dir]
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
    from pyspark.sql import functions as F

    from duckdb_pst_spark.registry import load_all
    from duckdb_pst_spark.session import get_spark
    from duckdb_pst_spark.sinks import save_bucketed_table
    from duckdb_pst_spark.tables import table

    spark = get_spark("ab-bucketed-q7q9")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()

    t0 = time.perf_counter()
    save_bucketed_table(
        table(spark, SF, "lineitem").select(
            "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
            "l_extendedprice", "l_discount", "l_shipdate",
        ),
        "li_b79",
        bucket_by=["l_orderkey"],
        n_buckets=N_BUCKETS,
        sort_by=["l_orderkey"],
    )
    save_bucketed_table(
        table(spark, SF, "orders").select("o_orderkey", "o_custkey", "o_orderdate"),
        "o_b79",
        bucket_by=["o_orderkey"],
        n_buckets=N_BUCKETS,
        sort_by=["o_orderkey"],
    )
    t_bucket = round(time.perf_counter() - t0, 2)
    print(f"one-time bucketing: {t_bucket}s", file=sys.stderr)

    def q7_bucketed(sf_dir):
        pair = ["NATION_3", "NATION_8"]
        n = table(spark, sf_dir, "nation").filter(F.col("n_name").isin(pair))
        s = (
            table(spark, sf_dir, "supplier")
            .select("s_suppkey", "s_nationkey")
            .join(
                F.broadcast(n.select(
                    F.col("n_nationkey").alias("sn_key"),
                    F.col("n_name").alias("supp_nation"))),
                F.col("s_nationkey") == F.col("sn_key"),
            )
            .select("s_suppkey", "supp_nation")
        )
        c = (
            table(spark, sf_dir, "customer")
            .select("c_custkey", "c_nationkey")
            .join(
                F.broadcast(n.select(
                    F.col("n_nationkey").alias("cn_key"),
                    F.col("n_name").alias("cust_nation"))),
                F.col("c_nationkey") == F.col("cn_key"),
            )
            .select("c_custkey", "cust_nation")
        )
        o = (
            spark.table("o_b79")
            .join(c, F.col("o_custkey") == F.col("c_custkey"))
            .select("o_orderkey", "cust_nation")
        )
        li = spark.table("li_b79").filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        rev_c = F.floor(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
        ).cast("long")
        return (
            li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
            .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .filter(F.col("supp_nation") != F.col("cust_nation"))
            .select(
                "supp_nation", "cust_nation",
                F.year("l_shipdate").cast("long").alias("l_year"),
                rev_c.alias("rev_c"),
            )
            .groupBy("supp_nation", "cust_nation", "l_year")
            .agg(F.sum("rev_c").cast("long").alias("revenue_c"))
            .orderBy("supp_nation", "cust_nation", "l_year")
        )

    def q9_bucketed(sf_dir):
        p = (
            table(spark, sf_dir, "part")
            .filter(F.col("p_name").like("%red%"))
            .select("p_partkey", "p_retailprice")
        )
        n = table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
        )
        s = (
            table(spark, sf_dir, "supplier")
            .select("s_suppkey", "s_nationkey")
            .join(F.broadcast(n), F.col("s_nationkey") == F.col("sn_key"))
            .select("s_suppkey", "nation")
        )
        o = spark.table("o_b79").select("o_orderkey", "o_orderdate")
        li = spark.table("li_b79")
        amount_c = (
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            ).cast("long")
            - F.floor(F.col("p_retailprice") * 100).cast("long")
            * F.floor(F.col("l_quantity")).cast("long")
        )
        return (
            li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
            .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
            .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .select(
                "nation",
                F.year("o_orderdate").cast("long").alias("o_year"),
                amount_c.alias("amount_c"),
            )
            .groupBy("nation", "o_year")
            .agg(F.sum("amount_c").cast("long").alias("sum_profit_c"))
            .orderBy("nation", F.col("o_year").desc())
        )

    for name, plain_name, twin in (
        ("q7", "q_tpch_q7", q7_bucketed),
        ("q9", "q_tpch_q9", q9_bucketed),
    ):
        a = sorted(map(tuple, specs[plain_name].builder(spark, SF).collect()))
        b = sorted(map(tuple, twin(SF).collect()))
        assert a == b, (name, a[:3], b[:3])
        print(f"{name} results equal at x100", file=sys.stderr)

    arms = {
        "q7_plain": lambda: specs["q_tpch_q7"].builder(spark, SF),
        "q7_bucketed": lambda: q7_bucketed(SF),
        "q9_plain": lambda: specs["q_tpch_q9"].builder(spark, SF),
        "q9_bucketed": lambda: q9_bucketed(SF),
    }
    for mk in arms.values():
        mk().write.mode("overwrite").format("noop").save()  # warm
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
