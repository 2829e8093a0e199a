#!/usr/bin/env python
"""Quantify the autoBroadcastJoinThreshold deployment cure for the
two static-planner estimate misses in the TPC-H completion batch
(SCALE.md round-8 section): Q16's 256k-row part-spec join and Q7's
8k-row two-nation supplier join both plan as SMJ at x100 because
Spark's size-product join estimate overshoots the 10 MB default —
AQE converts them to broadcasts at runtime but only after the
exchange is written.

`spark.sql.autoBroadcastJoinThreshold` is a runtime conf, so a
deployment raises it to its executor budget with no code change.
This script measures each query under the 10 MB default and under
64 MB, interleaved min-of-3 in ONE session after an sf0.001 warm
(the conf is read at planning time — each arm rebuilds its plan).

Usage: python tools/ab_broadcast_threshold.py [sf_dir]
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
QUERIES = ["q_tpch_q16", "q_tpch_q7", "q_tpch_q11"]
THRESHOLDS = {"default10m": "10485760", "thr64m": "67108864"}


def main() -> None:
    from duckdb_pst_spark.registry import load_all
    from duckdb_pst_spark.session import free_checkpoints, get_spark

    spark = get_spark("ab-bcast-threshold")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()

    def run(name: str, thr: str, d: str) -> None:
        # q_tpch_q11 localCheckpoints its value view — without freeing,
        # each run pins another x100-sized block and the LATER arm of
        # every pair reads systematically worse (the round-8 session-
        # degradation confound; caught by review on the first version
        # of this tool, which mis-measured Q11's thr64m arm)
        free_checkpoints(spark)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        try:
            specs[name].builder(spark, d).write.mode("overwrite").format(
                "noop"
            ).save()
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", THRESHOLDS["default10m"]
            )

    for name in QUERIES:
        for thr in THRESHOLDS.values():
            run(name, thr, "/root/testdata/sf0.001")

    best: dict[str, float] = {}
    for rep in range(REPS):
        for name in QUERIES:
            for label, thr in THRESHOLDS.items():
                key = f"{name}:{label}"
                t0 = time.perf_counter()
                run(name, thr, SF)
                dt = time.perf_counter() - t0
                best[key] = min(best.get(key, float("inf")), dt)
                print(f"rep{rep} {key}: {dt:.2f}", file=sys.stderr)

    print({k: round(v, 2) for k, v in best.items()})
    spark.stop()


if __name__ == "__main__":
    main()
