#!/usr/bin/env python
"""Shuffle-codec probe (guide §2.3): lz4 (default) vs zstd for the two
shuffle-file-heavy rows (q_minhash_band_stats, q_triangle_count_pte@sf0.01).

spark.io.compression.codec is a context conf — one process per codec;
run this script alternately per codec and compare min-of-3 in-process
warm walls (inter-process noise is why you alternate and min).

Usage: python tools/ab_shuffle_codec.py <lz4|zstd> [corpus_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> None:
    codec = sys.argv[1]
    corpus = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from duckdb_pst_spark.registry import load_all
    from duckdb_pst_spark.session import free_checkpoints, get_spark

    specs = load_all()
    spark = get_spark(
        f"codec-{codec}", extra_conf={"spark.io.compression.codec": codec}
    )
    spark.sparkContext.setLogLevel("ERROR")
    assert spark.conf.get("spark.io.compression.codec") == codec

    rows = {
        "q_minhash_band_stats": corpus,
        "q_triangle_count_pte": "/root/testdata/sf0.01",
    }
    out = []
    for name, d in rows.items():
        b = specs[name].builder
        b(spark, d).write.mode("overwrite").format("noop").save()  # warm
        free_checkpoints(spark)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            b(spark, d).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
            free_checkpoints(spark)
        out.append(f"{name}={best:.3f}")
    print(f"codec={codec}: " + " ".join(out))
    spark.stop()


if __name__ == "__main__":
    main()
