#!/usr/bin/env python
"""Layout admission test, operationalized (round 11).

The bucketed-layout program's measured A/B verdicts distilled to one
rule (operators/bucketed.py module docstring): a co-location layout
pays exactly when the exchange it would delete carries O(|fact|) rows;
map-side-combined low-cardinality aggregates and semi-pruned facts
leave nothing to delete. This tool applies the rule to any registered
query: it reads the query's ACTUAL per-exchange shuffle volume AND its
scan output rows from the SQL status store (all executions, one
untimed side-effect pass first — the exchange_budget attribution
discipline) and classifies each exchange by its share of the rows the
query scanned:

  CANDIDATE  >= 25% of scanned rows cross the wire (the Q4/Q13/Q22
             class — the exchange is the scan-sized growth term;
             prototype an interleaved A/B)
  MARGINAL   5-25% (watch; a cure, if any, will be Q8-sized)
  NO         < 5% (the Q15/Q16/Q20 class: partial aggregation or a
             semi-prune already collapsed the exchange; a layout
             cannot pay — Q20 measured 0.85x with a 1.9% share)

Run at the LARGEST corpus available (x100 preferred; default x10):
plan shapes are scale-dependent — at sf0.01 AQE broadcasts the tiny
fact sides and the very exchange under test never exists, and a side
that still broadcasts at x10 can flip to a shuffle at x100 (Q13's
customer crosses the broadcast threshold between them, so Q13 reads
MARGINAL 9.1% at x10 but CANDIDATE 72.7% at x100). The share is
therefore a FLOOR: a MARGINAL at one scale can be a CANDIDATE at the
next. Calibration against the recorded verdicts: Q4 at x10 = 80%
CANDIDATE (measured 0.31x cure); Q13 at x100 = 72.7% CANDIDATE
(measured 0.30x cure); Q20 at x10 = 1.8% NO (measured 0.85x
no-ship); Q15 at x10 = 0.6% NO (skipped without writing a layout).

Advisory triage, not a ship decision — the family discipline still
requires the interleaved same-session A/B
(tools/ab_bucketed_registered.py protocol) before registering a twin.

Usage: python tools/layout_advisor.py [sf_dir] [q1,q2,...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    REPO_ROOT, ".cache", "x10"
)
QUERIES = (
    sys.argv[2].split(",")
    if len(sys.argv) > 2
    else ["q_tpch_q3", "q_tpch_q13", "q_tpch_q20", "q_tpch_q15"]
)

CANDIDATE_SHARE = 0.25
MARGINAL_SHARE = 0.05


def main() -> None:
    from tools.exchange_budget import _parse_count
    from duckdb_pst_spark.registry import load_all
    from duckdb_pst_spark.session import get_spark

    spark = get_spark("layout-advisor")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    store = spark._jsparkSession.sharedState().statusStore()

    def nodes_of(execution_id):
        """(exchange_records, scan_output_rows) for one execution."""
        mvals = store.executionMetrics(execution_id)
        nodes = store.planGraph(execution_id).allNodes()
        exch, scans = [], []
        for i in range(nodes.size()):
            n = nodes.apply(i)
            is_exch = n.name() == "Exchange"
            is_scan = n.name().startswith(("Scan ", "BatchScan "))
            if not (is_exch or is_scan):
                continue
            ms = n.metrics()
            for j in range(ms.size()):
                m = ms.apply(j)
                v = mvals.get(m.accumulatorId())
                if v.isEmpty():
                    continue
                if is_exch and m.name() == "shuffle records written":
                    exch.append(int(_parse_count(v.get())))
                elif is_scan and m.name() == "number of output rows":
                    scans.append(int(_parse_count(v.get())))
        return exch, scans

    report = {"sf_dir": SF_DIR, "queries": {}}
    for name in QUERIES:
        # untimed side-effect pass, then the measured pass (same
        # attribution discipline as exchange_budget)
        specs[name].builder(spark, SF_DIR).write.mode("overwrite").format(
            "noop"
        ).save()
        time.sleep(0.5)
        before = store.executionsList().size()
        specs[name].builder(spark, SF_DIR).write.mode("overwrite").format(
            "noop"
        ).save()
        time.sleep(0.5)
        execs = store.executionsList()
        exch, scans = [], []
        for k in range(before, execs.size()):
            e, s = nodes_of(execs.apply(k).executionId())
            exch.extend(e)
            scans.extend(s)
        exch.sort(reverse=True)
        scanned = sum(scans)
        verdicts = []
        for r in exch:
            share = r / scanned if scanned else 0.0
            cls = (
                "CANDIDATE" if share >= CANDIDATE_SHARE
                else "MARGINAL" if share >= MARGINAL_SHARE
                else "NO"
            )
            verdicts.append(
                {"records": r, "scan_share": round(share, 4), "verdict": cls}
            )
        report["queries"][name] = {
            "scanned_rows": scanned,
            "exchanges": verdicts,
        }
        top = verdicts[0] if verdicts else {"verdict": "NO", "records": 0,
                                            "scan_share": 0}
        print(
            f"{name}: scanned {scanned}, top exchange {top['records']} "
            f"({top['scan_share']:.1%}) -> {top['verdict']}",
            file=sys.stderr,
        )
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
