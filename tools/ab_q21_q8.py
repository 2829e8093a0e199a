#!/usr/bin/env python
"""Same-session A/Bs for the two heaviest TPC-H-completion rows.

(a) q_tpch_q21: window collect_sets over the orderkey partitioning vs
    a groupBy aggregate that collapses each order to one stats row at
    the same exchange (map-side partial collect_set merge, no window
    buffers, no post-window fact-sized rows) — numwait is derivable
    without re-touching lines because every late line in an
    n_late==1 order belongs to THE single late supplier.
(b) q_tpch_q8: declarative li⋈o (AQE picks SMJ at x100) vs forcing a
    broadcast of the windowed+ASIA-pruned orders side (~0.9M skinny
    rows at x100 — just past AQE's 10MB estimate).

Interleaved min-of-3 in ONE session after sf0.001 warm, idle box.
Usage: python tools/ab_q21_q8.py [sf_dir]
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


def main() -> None:
    from pyspark.sql import functions as F

    from duckdb_pst_spark.registry import load_all
    from duckdb_pst_spark.session import get_spark
    from duckdb_pst_spark.tables import table

    spark = get_spark("ab-q21-q8")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()

    def q21_agg(spark, sf_dir):
        o = (
            table(spark, sf_dir, "orders")
            .filter(F.col("o_orderstatus") == "F")
            .select("o_orderkey", "o_orderdate")
        )
        li = table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_suppkey", "l_shipdate"
        )
        late = F.col("l_shipdate") >= F.col("o_orderdate") + F.expr(
            "INTERVAL 90 DAYS"
        )
        j = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
            "l_orderkey", "l_suppkey", late.alias("late")
        )
        stats = (
            j.groupBy("l_orderkey")
            .agg(
                F.size(F.collect_set("l_suppkey")).alias("n_supp"),
                F.size(
                    F.collect_set(F.when(F.col("late"), F.col("l_suppkey")))
                ).alias("n_late"),
                F.max(F.when(F.col("late"), F.col("l_suppkey"))).alias("late_sk"),
                F.sum(F.when(F.col("late"), 1).otherwise(0)).alias("late_lines"),
            )
            .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
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
            stats.join(F.broadcast(s), F.col("late_sk") == F.col("s_suppkey"))
            .groupBy("s_name")
            .agg(F.sum("late_lines").cast("long").alias("numwait"))
            .orderBy(F.col("numwait").desc(), "s_name")
            .limit(100)
        )

    def q8_bco(spark, sf_dir):
        p = (
            table(spark, sf_dir, "part")
            .filter(F.col("p_type") == "ECONOMY")
            .select("p_partkey")
        )
        n1 = table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("sn_key"),
            F.col("n_name").alias("supp_nation"),
        )
        s = (
            table(spark, sf_dir, "supplier")
            .select("s_suppkey", "s_nationkey")
            .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
            .select("s_suppkey", "supp_nation")
        )
        r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
        n2 = table(spark, sf_dir, "nation").join(
            F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
        )
        c = (
            table(spark, sf_dir, "customer")
            .select("c_custkey", "c_nationkey")
            .join(
                F.broadcast(n2.select("n_nationkey")),
                F.col("c_nationkey") == F.col("n_nationkey"),
            )
            .select("c_custkey")
        )
        o = (
            table(spark, sf_dir, "orders")
            .filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            )
            .select("o_orderkey", "o_custkey", "o_orderdate")
            .join(c, F.col("o_custkey") == F.col("c_custkey"))
            .select("o_orderkey", "o_orderdate")
        )
        li = table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
        )
        rev_c = F.floor(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
        ).cast("long")
        j = (
            li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
            .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(o), F.col("l_orderkey") == F.col("o_orderkey"))
            .select(
                F.year("o_orderdate").cast("long").alias("o_year"),
                rev_c.alias("rev_c"),
                "supp_nation",
            )
        )
        return (
            j.groupBy("o_year")
            .agg(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", F.col("rev_c")).otherwise(0)
                )
                .cast("long")
                .alias("nation_rev_c"),
                F.sum("rev_c").cast("long").alias("total_rev_c"),
                F.expr(
                    "CAST(1000000 * sum(CASE WHEN supp_nation = 'NATION_3' "
                    "THEN rev_c ELSE 0 END) div sum(rev_c) AS BIGINT)"
                ).alias("mkt_share_ppm"),
            )
            .orderBy("o_year")
        )

    ARMS = {
        "q21_window": lambda d: specs["q_tpch_q21"].builder(spark, d),
        "q21_agg": lambda d: q21_agg(spark, d),
        "q8_declarative": lambda d: specs["q_tpch_q8"].builder(spark, d),
        "q8_bco": lambda d: q8_bco(spark, d),
    }

    # result-equality pin at sf0.01 before timing
    for pair in (("q21_window", "q21_agg"), ("q8_declarative", "q8_bco")):
        a = sorted(map(tuple, ARMS[pair[0]]("/root/testdata/sf0.01").collect()))
        b = sorted(map(tuple, ARMS[pair[1]]("/root/testdata/sf0.01").collect()))
        assert a == b, (pair, a[:5], b[:5])
        print(f"equal {pair}", file=sys.stderr)

    for name, fn in ARMS.items():
        fn("/root/testdata/sf0.001").write.mode("overwrite").format("noop").save()

    best = {name: float("inf") for name in ARMS}
    for rep in range(REPS):
        for name, fn in ARMS.items():
            t0 = time.perf_counter()
            fn(SF).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            best[name] = min(best[name], dt)
            print(f"rep{rep} {name}: {dt:.2f}", file=sys.stderr)

    print({k: round(v, 2) for k, v in best.items()})
    spark.stop()


if __name__ == "__main__":
    main()
