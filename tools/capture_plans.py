#!/usr/bin/env python
"""Dump .explain("formatted") for benched queries to plans/<tag>/.

Usage: python tools/capture_plans.py <tag> [suffix] [only_csv]

Writes plans/<tag>/<query>_<suffix>.txt (suffix default "before").
Builders run against $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1);
fixed-corpus rows (spec.bench_dir) use their own corpus when present,
mirroring bench.py. Per-query conf overrides (spec.confs) apply during
plan build, so the captured plan is the one the bench times.
"""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r11"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

    from duckdb_pst_spark.registry import applied_confs, load_all
    from duckdb_pst_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO_ROOT, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    specs = load_all()
    if only and "ALL" in only:
        todo = list(specs.values())
    else:
        todo = [s for s in specs.values() if s.bench]
        if only:
            todo = [specs[n] for n in only]

    spark = get_spark("dps-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for spec in todo:
        run_dir = (
            spec.bench_dir
            if spec.bench_dir and os.path.isdir(spec.bench_dir)
            else sf_dir
        )
        path = os.path.join(out_dir, f"{spec.name}_{suffix}.txt")
        try:
            with applied_confs(spark, spec):
                df = spec.builder(spark, run_dir)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
        except Exception as exc:
            plan = f"PLAN CAPTURE FAILED: {type(exc).__name__}: {exc}\n"
        with open(path, "w") as f:
            f.write(f"# {spec.name} @ {run_dir} ({suffix})\n")
            f.write(plan if plan.endswith("\n") else plan + "\n")
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
