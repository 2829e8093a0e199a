#!/usr/bin/env python
"""Partkey-layout twin prototype for q_tpch_q20 (round 11).

Q20's one fact-sized exchange is the (l_suppkey, l_partkey) quantity
aggregate over the name-semi-pruned, year-windowed lineitem scan. On
the PARTKEY-bucketed lineitem the Q11 twin already materializes,
HashPartitioning(l_partkey) satisfies the {l_suppkey, l_partkey}
clustering (subset rule), so the aggregate runs bucket-local; the
name-filtered part keys ride a keys-only broadcast semi (the Q11 twin
precedent — 8 B/row, bounded by |parts|/12), and everything above the
HAVING is |suppliers|-bounded.

Measure-before-ship (the Q16/Q13 discipline): Q16's partkey twin was
a 1.33x NO-SHIP because its binding cost was aggregate CPU, not
shuffle — Q20 may read the same way. Ship ONLY on a cure; either
verdict is recorded in SCALE.md.

Usage: python tools/ab_q20_partkey.py [sf_dir]

OUTCOME (round 11): measured NO-SHIP. x100 0.85x (2.90 -> 2.47 s),
x10 0.96x (1.58 -> 1.51 s), and the twin plan still carries 3 shuffle
exchanges at scale (the supplier-side attach and final ordering — the
layout only deletes the already-semi-pruned quantity aggregate, whose
exchange the plain's own docstring prices as "only candidate lines").
Same class as Q16's partkey no-ship, milder: the deleted term had
already stopped growing. The plain stands; this script is the record.
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

    from duckdb_pst_spark.operators.bucketed import bucketed_lineitem_partkey
    from duckdb_pst_spark.registry import load_all
    from duckdb_pst_spark.session import free_checkpoints, get_spark
    from duckdb_pst_spark.tables import table

    spark = get_spark("ab-q20-partkey")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()

    t0 = time.perf_counter()
    bucketed_lineitem_partkey(spark, SF)
    t_layout = round(time.perf_counter() - t0, 2)
    print(f"one-time partkey layout: {t_layout}s", file=sys.stderr)

    def twin(spark, sf_dir):
        li_b = bucketed_lineitem_partkey(spark, sf_dir)
        redp = (
            table(spark, sf_dir, "part")
            .filter(F.col("p_name").like("red%"))
            .select("p_partkey")
        )
        li = (
            li_b.filter(
                (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            )
            .select("l_partkey", "l_suppkey", "l_quantity")
            .join(F.broadcast(redp), F.col("l_partkey") == F.col("p_partkey"),
                  "left_semi")
        )
        qual = (
            li.groupBy("l_suppkey", "l_partkey")
            .agg(F.sum(F.floor(F.col("l_quantity")).cast("long")).alias("sq"))
            .filter(F.col("sq") > 25)
            .select("l_suppkey")
        )
        r = table(spark, sf_dir, "region").filter(F.col("r_name") == "AFRICA")
        n = table(spark, sf_dir, "nation").join(
            F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
        )
        return (
            table(spark, sf_dir, "supplier")
            .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
            .join(qual, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
            .select(
                "s_name",
                F.floor(F.col("s_acctbal") * 100).cast("long").alias("acctbal_c"),
            )
            .orderBy("s_name")
        )

    plain = specs["q_tpch_q20"].builder

    a = sorted(map(tuple, plain(spark, SF).collect()))
    b = sorted(map(tuple, twin(spark, SF).collect()))
    assert a == b, (len(a), len(b), a[:3], b[:3])
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
