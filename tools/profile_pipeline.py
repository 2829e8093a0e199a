#!/usr/bin/env python
"""Stage-wise wall profile of q_pipeline_pretrain (guide §1: find where
the time goes before touching anything). Each stage is timed as its own
noop-sink job in one session, min-of-2, checkpoints freed between runs.

Usage: python tools/profile_pipeline.py [corpus_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from duckdb_pst_spark.functions.partitioning import spread
    from duckdb_pst_spark.functions.portable import tokens
    from duckdb_pst_spark.operators.dedup import _band_pairs, _minhash_band_kernel
    from duckdb_pst_spark.operators.pipeline import (
        EN_RATIO_U,
        MIN_CHARS,
        MIN_TOKENS,
    )
    from duckdb_pst_spark.operators.text import _EN_STOPWORDS
    from duckdb_pst_spark.registry import load_all
    from duckdb_pst_spark.session import free_checkpoints, get_spark
    from duckdb_pst_spark.tables import table

    spark = get_spark("profile-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spread(table(spark, corpus, "documents"))
    d = docs.withColumn("toks", tokens(F.col("text")))
    en_hits = F.size(
        F.filter(F.col("toks"), lambda t: t.isin(*_EN_STOPWORDS))
    ).cast("long")
    gated = d.filter(
        (F.length("text") >= MIN_CHARS)
        & (F.size("toks") >= MIN_TOKENS)
        & ((en_hits * 1_000_000).cast("long") / F.size("toks") >= EN_RATIO_U)
    )
    train = gated.filter(F.col("doc_id") % 100 != 0)

    def shingle_rows(df):
        grams = F.array_distinct(
            F.expr(
                "transform(sequence(1, size(toks) - 2),"
                " i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))"
            )
        )
        return df.filter(F.size("toks") >= 3).select(
            "doc_id", F.explode(grams).alias("g")
        )

    eval_sh = shingle_rows(d.filter(F.col("doc_id") % 100 == 0))
    contaminated = (
        shingle_rows(train)
        .join(F.broadcast(eval_sh.select("g").distinct()), "g")
        .select("doc_id")
        .distinct()
    )

    bands_df = docs.select("doc_id", "text").mapInPandas(
        _minhash_band_kernel, "doc_id long, band_idx int, band_val long"
    )

    stages = {
        "scan+tokenize+gates (train count shape)": lambda: train.select(
            "doc_id", "source", "lang", "text", F.size("toks").alias("n_toks")
        ),
        "eval shingles distinct": lambda: eval_sh.select("g").distinct(),
        "decontamination join (contaminated ids)": lambda: contaminated,
        "minhash band kernel (raw bands)": lambda: bands_df,
        "band pairs (kernel + bucket join)": lambda: _band_pairs(
            docs.select("doc_id", "text").mapInPandas(
                _minhash_band_kernel, "doc_id long, band_idx int, band_val long"
            )
        ),
        "full pipeline": lambda: load_all()["q_pipeline_pretrain"].builder(
            spark, corpus
        ),
    }

    for name, build in stages.items():
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            build().write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
            free_checkpoints(spark)
        print(f"{best:7.3f} s  {name}")
    spark.stop()


if __name__ == "__main__":
    main()
