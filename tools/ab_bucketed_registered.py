#!/usr/bin/env python
"""Same-session A/B of the REGISTERED bucketed twins vs their plain
siblings (round 9: the twins moved from ad-hoc tools/ scripts into
operators/bucketed.py with merge hints and declarative dims — this
re-measures the shipped code, not the prototypes).

Protocol per the repo's measurement discipline: one session, warm both
arms once, interleaved min-of-3, free_checkpoints between runs; the
one-time export_bucketed cost is reported separately (it amortizes over
every orderkey query in the session/deployment).

Usage: python tools/ab_bucketed_registered.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO_ROOT, ".cache", "x100")
REPS = 3
# pairing lives in operators/bucketed.py (TWIN_PAIRS) — one source of
# truth shared with bench.py's same-session twin/plain ratio emission
from duckdb_pst_spark.operators.bucketed import TWIN_PAIRS

PAIRS = list(TWIN_PAIRS)
# optional filter: comma-separated plain names, e.g. "q_tpch_q7,q_tpch_q8"
_ONLY = os.environ.get("AB_BUCKETED_ONLY")
if _ONLY:
    keep = {n.strip() for n in _ONLY.split(",")}
    PAIRS = [p for p in PAIRS if p[0] in keep]


def main() -> None:
    from duckdb_pst_spark.operators.bucketed import ensure_bucketed
    from duckdb_pst_spark.registry import load_all
    from duckdb_pst_spark.session import free_checkpoints, get_spark

    spark = get_spark("ab-bucketed-registered")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()

    t0 = time.perf_counter()
    ensure_bucketed(spark, SF)
    t_layout = round(time.perf_counter() - t0, 2)
    print(f"one-time export_bucketed: {t_layout}s", file=sys.stderr)

    def noop(name):
        specs[name].builder(spark, SF).write.mode("overwrite").format("noop").save()

    out = {"layout_once_s": t_layout, "sf_dir": SF}
    for plain, twin in PAIRS:
        # results pinned equal before timing
        a = sorted(map(tuple, specs[plain].builder(spark, SF).collect()))
        b = sorted(map(tuple, specs[twin].builder(spark, SF).collect()))
        assert a == b, (plain, a[:3], b[:3])
        free_checkpoints(spark)
        noop(plain); noop(twin)  # warm
        best = {plain: float("inf"), twin: float("inf")}
        for _ in range(REPS):
            for name in (plain, twin):
                t0 = time.perf_counter()
                noop(name)
                best[name] = min(best[name], time.perf_counter() - t0)
                free_checkpoints(spark)
        out[plain] = round(best[plain], 2)
        out[twin] = round(best[twin], 2)
        out[f"{twin}_ratio"] = round(best[twin] / best[plain], 2)
        print(f"{plain}: {out[plain]}  {twin}: {out[twin]} "
              f"({out[f'{twin}_ratio']}x)", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
