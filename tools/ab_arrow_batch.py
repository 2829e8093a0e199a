#!/usr/bin/env python
"""Price the 256-row Arrow exchange cap (OPTIMIZATION_r11 item 4).

Runs the minhash band kernel (narrow text rows) and q_knn_gemm (vector
rows) with the session cap at 256 (shipped payload-safe default) vs a
candidate value, in separate processes (the conf is read at execution
time but kept immutable by policy — this probe exists to measure the
headroom the policy costs, not to ship a change).

Usage: python tools/ab_arrow_batch.py <cap> [corpus_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> None:
    cap = sys.argv[1]
    corpus = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.cache/x10"

    from duckdb_pst_spark.operators.dedup import _minhash_band_kernel
    from duckdb_pst_spark.registry import load_all
    from duckdb_pst_spark.session import free_checkpoints, get_spark
    from duckdb_pst_spark.tables import table

    specs = load_all()
    spark = get_spark(
        f"arrow-cap-{cap}",
        extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": cap},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def bands_df():
        return (
            table(spark, corpus, "documents")
            .select("doc_id", "text")
            .mapInPandas(
                _minhash_band_kernel, "doc_id long, band_idx int, band_val long"
            )
        )

    out = []
    for name, build in {
        "band_kernel": bands_df,
        "q_knn_gemm": lambda: specs["q_knn_gemm"].builder(spark, corpus),
    }.items():
        build().write.mode("overwrite").format("noop").save()
        free_checkpoints(spark)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            build().write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
            free_checkpoints(spark)
        out.append(f"{name}={best:.3f}")
    print(f"arrow_cap={cap}: " + " ".join(out))
    spark.stop()


if __name__ == "__main__":
    main()
