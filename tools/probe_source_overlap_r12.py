#!/usr/bin/env python
"""r12 q_source_overlap A/B: the r11 string-building corpus stage (old,
kept verbatim below) vs the registered linearized poly-hash form, plus
the measured runner-up (numpy kernel shingles). Interleaved min-of-3,
results pinned equal. Usage: python tools/probe_source_overlap_r12.py
<corpus> [kernel]."""
import sys
import time

import os
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_pst_spark.functions.partitioning import spread
from duckdb_pst_spark.functions.portable import poly_hash
from duckdb_pst_spark.operators.sketches import _OVL_K, _OVL_SALT
from duckdb_pst_spark.registry import load_all
from duckdb_pst_spark.session import get_spark
from duckdb_pst_spark.tables import table


def _tail(spark, sh):
    w1 = Window.partitionBy("source", (F.col("hv") % _OVL_SALT)).orderBy("hv")
    w2 = Window.partitionBy("source").orderBy("hv")
    sk = (sh.withColumn("rn1", F.row_number().over(w1)).filter(F.col("rn1") <= _OVL_K)
          .withColumn("rn2", F.row_number().over(w2)).filter(F.col("rn2") <= _OVL_K)
          .select("source", "hv"))
    srcs = sk.select("source").distinct()
    pairs = srcs.select(F.col("source").alias("sa")).join(
        srcs.select(F.col("source").alias("sb")), F.col("sa") < F.col("sb"))
    ska = sk.select(F.col("source").alias("sa"), "hv", F.lit(1).alias("in_a"))
    skb = sk.select(F.col("source").alias("sb"), "hv", F.lit(1).alias("in_b"))
    left = pairs.join(ska, "sa").select("sa", "sb", "hv", "in_a")
    right = pairs.join(skb, "sb").select("sa", "sb", "hv", "in_b")
    u = left.join(right, ["sa", "sb", "hv"], "full_outer").select(
        "sa", "sb", "hv",
        F.coalesce(F.col("in_a"), F.lit(0)).alias("in_a"),
        F.coalesce(F.col("in_b"), F.lit(0)).alias("in_b"))
    wr = Window.partitionBy("sa", "sb").orderBy("hv")
    est = (u.withColumn("rn", F.row_number().over(wr)).filter(F.col("rn") <= _OVL_K)
           .groupBy("sa", "sb")
           .agg(F.count(F.lit(1)).cast("long").alias("k_used"),
                F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("both_n")))
    return est.select("sa", "sb", "k_used",
                      F.expr("(both_n * 1000000) div k_used").alias("jaccard_ppm"))


def old(spark, sf_dir):
    """r11 shape: trigram strings built per gram, per-gram char folds."""
    sh = (
        spread(table(spark, sf_dir, "documents"))
        .select("source", F.expr("filter(split(text, ' '), x -> x != '')").alias("toks"))
        .filter(F.size("toks") >= 3)
        .select("source", F.explode(F.array_distinct(F.expr(
            "transform(sequence(1, size(toks) - 2),"
            " i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))"))).alias("g"))
        .select("source", poly_hash(F.col("g")).alias("hv"))
        .distinct()
    )
    return _tail(spark, sh)


def kernel(spark, sf_dir):
    """Measured runner-up (0.89x at x100 vs the shipped 0.80x): same
    shingle hashes via the numpy poly-hash kernel."""
    def sh_kernel(batches):
        import numpy as np
        import pandas as pd

        from duckdb_pst_spark.functions.batches import rebatch
        from duckdb_pst_spark.functions.polyhash_np import batch_shingle_hashes

        for pdf in rebatch(batches, 4096):
            keys = np.arange(len(pdf), dtype=np.int64)
            kept, _nsh, didx, _pos, h = batch_shingle_hashes(pdf["text"].tolist(), keys)
            if len(h) == 0:
                yield pd.DataFrame({"source": pd.Series([], dtype="object"),
                                    "hv": pd.Series([], dtype="int64")})
                continue
            src = pdf["source"].to_numpy()[kept[didx]]
            yield pd.DataFrame({"source": src, "hv": h}).drop_duplicates()

    sh = (spread(table(spark, sf_dir, "documents"))
          .select("source", "text")
          .mapInPandas(sh_kernel, "source string, hv long")
          .distinct())
    return _tail(spark, sh)


def main():
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    alt = kernel if (len(sys.argv) > 2 and sys.argv[2] == "kernel") else None
    new_b = load_all()["q_source_overlap"].builder
    spark = get_spark("probe-ovl-r12")
    spark.sparkContext.setLogLevel("ERROR")
    builders = {"old": old, "new": new_b}
    if alt:
        builders["kernel"] = alt
    ref = None
    for name, b in builders.items():
        got = sorted(tuple(r) for r in b(spark, corpus).collect())
        if ref is None:
            ref = got
        assert got == ref, f"{name} differs"
    print(f"results pinned equal ({len(ref)} rows)", file=sys.stderr)

    def run(b):
        t0 = time.perf_counter()
        b(spark, corpus).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    for b in builders.values():
        run(b)
    best = {n: float("inf") for n in builders}
    for _ in range(3):
        for n, b in builders.items():
            best[n] = min(best[n], run(b))
    print(" ".join(f"{n}={best[n]:.3f}s" for n in builders),
          f"(new/old {best['new']/best['old']:.2f}x) @ {corpus}")
    spark.stop()


if __name__ == "__main__":
    main()
