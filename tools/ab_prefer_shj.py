#!/usr/bin/env python
"""A/B spark.sql.join.preferSortMergeJoin=false (guide §9) on the
join-heavy TPC-H plains, one session, interleaved min-of-3 per query.

Usage: python tools/ab_prefer_shj.py [corpus_dir] [q1,q2,...]
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

QUERIES = [
    "q_tpch_q2", "q_tpch_q3", "q_tpch_q5", "q_tpch_q8", "q_tpch_q9",
    "q_tpch_q18", "q_tpch_q21", "q_multi_join",
]


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else QUERIES

    from duckdb_pst_spark.registry import load_all
    from duckdb_pst_spark.session import free_checkpoints, get_spark

    specs = load_all()
    spark = get_spark("ab-prefer-shj")
    spark.sparkContext.setLogLevel("ERROR")
    KEY = "spark.sql.join.preferSortMergeJoin"

    def run(name, pref_smj: bool) -> float:
        spark.conf.set(KEY, str(pref_smj).lower())
        t0 = time.perf_counter()
        specs[name].builder(spark, corpus).write.mode("overwrite").format(
            "noop"
        ).save()
        return time.perf_counter() - t0

    for name in names:
        run(name, True), run(name, False)  # warm both plan shapes
        free_checkpoints(spark)
        t_smj, t_shj = float("inf"), float("inf")
        for _ in range(3):
            t_smj = min(t_smj, run(name, True))
            free_checkpoints(spark)
            t_shj = min(t_shj, run(name, False))
            free_checkpoints(spark)
        print(
            f"{name} @ {corpus}: preferSMJ {t_smj:.3f} s -> preferSHJ "
            f"{t_shj:.3f} s ({t_shj / t_smj:.2f}x)"
        )
    spark.conf.set(KEY, "true")
    spark.stop()


if __name__ == "__main__":
    main()
