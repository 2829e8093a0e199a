#!/usr/bin/env python
"""Bucketed-table twin for q_tpch_q16 (the worst TPC-H-completion
ratio once the SF-scaled broadcast hints came off: AQE shuffles the
256k-row part-spec join at x100, sorting the 60M-row bridge scan).

Bucketing part AND lineitem's bridge columns on partkey (32 buckets,
sorted) makes the spec join shuffle-free on both sides — the same
once-per-ingest layout cure as the orderkey twins (Q4/Q12/Q21), on
the OTHER fact key. The distinct-supplier aggregate's own exchange
(filtered, skinny) is all that remains. Same session, interleaved
min-of-3 after an sf0.001 warm; results pinned equal at x100 first.

Usage: python tools/ab_bucketed_q16.py [sf_dir]
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

    spark = get_spark("ab-bucketed-q16")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()

    t0 = time.perf_counter()
    save_bucketed_table(
        table(spark, SF, "lineitem").select("l_partkey", "l_suppkey"),
        "li_b16",
        bucket_by=["l_partkey"],
        n_buckets=N_BUCKETS,
        sort_by=["l_partkey"],
    )
    save_bucketed_table(
        table(spark, SF, "part"),
        "p_b16",
        bucket_by=["p_partkey"],
        n_buckets=N_BUCKETS,
        sort_by=["p_partkey"],
    )
    t_bucket = round(time.perf_counter() - t0, 2)
    print(f"one-time bucketing: {t_bucket}s", file=sys.stderr)

    def q16_bucketed(spark, sf_dir):
        p = (
            spark.table("p_b16")
            .filter(
                (F.col("p_brand") != "Brand#3")
                & (F.col("p_type") != "PROMO")
                & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
            )
            .select("p_partkey", "p_brand", "p_type", "p_size")
        )
        bad = (
            table(spark, sf_dir, "supplier")
            .filter(F.col("s_acctbal") < 0)
            .select("s_suppkey")
        )
        li = spark.table("li_b16")
        return (
            li.join(p, F.col("l_partkey") == F.col("p_partkey"))
            .join(bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
            .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
        )

    plain = lambda: specs["q_tpch_q16"].builder(spark, SF)

    a = sorted(map(tuple, plain().collect()))
    b = sorted(map(tuple, q16_bucketed(spark, SF).collect()))
    assert a == b, (a[:5], b[:5])
    print("results equal at x100", file=sys.stderr)

    arms = {"plain": plain, "bucketed": lambda: q16_bucketed(spark, SF)}
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
