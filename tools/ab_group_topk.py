#!/usr/bin/env python
"""q_group_topk_freq 3.9x follow-up (VERDICT r7 item 3).

The WindowGroupLimit gate confirmed Catalyst pushes the rk<=3 filter
into Partial+Final per-group top-k heaps (tests/test_plan_shapes.py),
so the residual vs DuckDB is the (lang, tok) token exchange. Candidate
cut, q_corpus_card-style exchange fusion: repartition the exploded
stream by lang BEFORE the aggregate — HashPartitioning(lang) satisfies
ClusteredDistribution(lang, tok) AND the window's hash(lang)
requirement, so the count-aggregate and the rank window share ONE
exchange instead of two. The known cost: parallelism collapses to
n_langs tasks for the whole count (5 langs here) — the reason this
shape cannot ship for the general corpus (a 100 TB corpus with 30
langs would run 30 tasks on 32,000 cores).

Usage: python tools/ab_group_topk.py [corpus_dir]. DuckDB floor first
(JVM-free), then one Spark session, plans warmed, interleaved min-of-3.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

CORPUS = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO_ROOT, ".cache", "x100z")
REPS = 3


def duck_floor() -> float:
    import duckdb

    from duckdb_pst_spark.registry import load_all

    sql = load_all()["q_group_topk_freq"].oracle
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{CORPUS}/documents.parquet'")
    con.execute(f"SELECT count(*) FROM ({sql})").fetchone()
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        con.execute(f"SELECT count(*) FROM ({sql})").fetchone()
        best = min(best, time.perf_counter() - t0)
    con.close()
    return round(best, 2)


def main() -> None:
    duck = duck_floor()
    print(f"duckdb floor: {duck}", file=sys.stderr)

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from duckdb_pst_spark.functions.portable import tokens
    from duckdb_pst_spark.registry import load_all
    from duckdb_pst_spark.session import get_spark
    from duckdb_pst_spark.tables import table

    spark = get_spark("ab-group-topk")
    spark.sparkContext.setLogLevel("ERROR")
    current = load_all()["q_group_topk_freq"].builder

    def fused(spark, sf_dir):
        d = table(spark, sf_dir, "documents")
        tf = d.select("lang", F.explode(tokens(F.col("text"))).alias("tok"))
        # one exchange: hash(lang) satisfies both the (lang, tok)
        # aggregate's clustered distribution and the window partition
        c = tf.repartition("lang").groupBy("lang", "tok").agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
        w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("tok"))
        return (
            c.withColumn("rk", F.row_number().over(w).cast("long"))
            .filter(F.col("rk") <= 3)
            .orderBy("lang", "rk")
        )

    variants = {
        "current": lambda d: current(spark, d),
        "fused_lang_partition": lambda d: fused(spark, d),
    }

    # equality check at sf0.01 before timing
    a = sorted(map(tuple, variants["current"]("/root/testdata/sf0.01").collect()))
    b = sorted(
        map(tuple, variants["fused_lang_partition"]("/root/testdata/sf0.01").collect())
    )
    assert a == b, "variants diverge"
    print("variants equal at sf0.01", file=sys.stderr)

    from duckdb_pst_spark.plans import introspect as pi

    n_sh = {k: pi.shuffle_count(v(CORPUS)) for k, v in variants.items()}
    print(f"shuffles: {n_sh}", file=sys.stderr)

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    for v in variants.values():
        noop(v("/root/testdata/sf0.001"))

    best = {k: float("inf") for k in variants}
    for rep in range(REPS):
        for name, v in variants.items():
            t0 = time.perf_counter()
            noop(v(CORPUS))
            dt = time.perf_counter() - t0
            best[name] = min(best[name], dt)
            print(f"rep{rep} {name}: {dt:.2f}", file=sys.stderr)

    out = {k: round(t, 2) for k, t in best.items()}
    out["duckdb"] = duck
    out["shuffles"] = n_sh
    out["corpus"] = CORPUS
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
