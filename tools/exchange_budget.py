#!/usr/bin/env python
"""Quantify the TPC-H star-join exchange budget (VERDICT r7 item 4a).

The 15x/7x single-box rows for q_tpch_q5/q_tpch_q10 lean on "the
exchange parallelizes on a real cluster" — an argument, not a number.
This script turns it into one: run each query at x100 and read the
ACTUAL per-exchange shuffle volume (records + bytes written) from the
SQL status store's plan graph, so SCALE.md can carry a quantified
exchange budget — what fraction of the scan actually crosses the wire,
and what a 1000-executor cluster would move per node.

The metrics come from ``statusStore.planGraph`` (one node per FINAL
physical operator) — summing ``execution.metrics()`` instead
double-counts accumulators across AQE plan versions (measured 8.4x
inflation on Q5).

Round-11 fix: builders with an eager ``localCheckpoint`` (Q11's value
view, Q15's revenue view) execute the checkpointed fragment DURING the
builder call as its own SQL execution — reading only the last
execution saw a post-checkpoint tail that starts at Scan ExistingRDD
and hid every exchange beneath the checkpoint (the r10 Q11 budget had
to be measured by hand because of this). The script now snapshots the
execution list before each builder and aggregates exchanges over ALL
executions the query triggered (checkpoint fragments + the final noop
write).

q_tpch_q6 runs as the zero-exchange control (its budget must be ~zero:
one partial-aggregate row per task).

Usage: python tools/exchange_budget.py [sf_dir] [q1,q2,...]
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO_ROOT, ".cache", "x100")
QUERIES = (
    sys.argv[2].split(",")
    if len(sys.argv) > 2
    else ["q_tpch_q5", "q_tpch_q10", "q_tpch_q6"]
)

_UNITS = {"B": 1, "KiB": 2**10, "MiB": 2**20, "GiB": 2**30, "TiB": 2**40}


def _parse_size(s: str) -> float:
    """'734.9 MiB' / 'total (min, …)\\n734.9 MiB (…)' → bytes (total)."""
    m = re.search(r"([\d.]+)\s*(B|KiB|MiB|GiB|TiB)", s.splitlines()[-1])
    return float(m.group(1)) * _UNITS[m.group(2)] if m else 0.0


def _parse_count(s: str) -> float:
    m = re.search(r"([\d,]+)", s.splitlines()[-1])
    return float(m.group(1).replace(",", "")) if m else 0.0


def main() -> None:
    from duckdb_pst_spark.registry import load_all
    from duckdb_pst_spark.session import get_spark

    spark = get_spark("exchange-budget")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    store = spark._jsparkSession.sharedState().statusStore()

    def _exchanges_of(execution_id) -> list[dict]:
        mvals = store.executionMetrics(execution_id)
        nodes = store.planGraph(execution_id).allNodes()
        out = []
        for i in range(nodes.size()):
            n = nodes.apply(i)
            if n.name() != "Exchange":  # Broadcast/ReusedExchange excluded
                continue
            rec = by = 0.0
            ms = n.metrics()
            for j in range(ms.size()):
                m = ms.apply(j)
                v = mvals.get(m.accumulatorId())
                if v.isEmpty():
                    continue
                if m.name() == "shuffle records written":
                    rec = _parse_count(v.get())
                elif m.name() == "shuffle bytes written":
                    by = _parse_size(v.get())
            out.append({"records": int(rec), "mib": round(by / 2**20, 1)})
        return out

    results: dict[str, dict] = {}
    for name in QUERIES:
        # One untimed pass FIRST: builders with one-time side effects
        # (a bucketed twin's first-use layout materialization, a cached
        # broadcast build) run them here, so the measured pass below
        # attributes only the query's OWN executions — summing the
        # layout-write's full-corpus repartition into a twin's budget
        # would report tens of millions of shuffled records for a
        # genuinely zero-exchange plan.
        specs[name].builder(spark, SF_DIR).write.mode("overwrite").format(
            "noop"
        ).save()
        import time as _t

        _t.sleep(0.5)  # let the async SQL listener drain before snapshotting
        before = store.executionsList().size()
        df = specs[name].builder(spark, SF_DIR)
        df.write.mode("overwrite").format("noop").save()
        _t.sleep(0.5)  # ...and before reading the post-run list
        execs = store.executionsList()
        exchanges = []
        # every execution this query triggered: eager-localCheckpoint
        # fragments during the builder call, then the final noop write
        for k in range(before, execs.size()):
            exchanges.extend(_exchanges_of(execs.apply(k).executionId()))
        exchanges.sort(key=lambda x: -x["records"])
        results[name] = {
            "n_exchanges": len(exchanges),
            "total_records": sum(x["records"] for x in exchanges),
            "total_mib": round(sum(x["mib"] for x in exchanges), 1),
            "per_exchange": exchanges,
        }
        print(f"{name}: {results[name]}", file=sys.stderr)

    import duckdb

    results["_lineitem_rows"] = duckdb.sql(
        f"SELECT count(*) FROM '{SF_DIR}/lineitem.parquet'"
    ).fetchone()[0]
    results["_sf_dir"] = SF_DIR
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
