"""Exchange-budget regression net for the 22 TPC-H plains.

Every Exchange is a full cluster re-partition at 100 TB — the quantity
the whole SCALE.md program minimizes. The per-query plan-shape tests
(test_plan_shapes.py) gate specific mechanisms; this file pins the
TOTAL shuffle count of each TPC-H plan to its measured round-10 value
(max over the sf0.001 and sf0.01 test corpora, AQE-final plans), so a
Catalyst upgrade, a session-conf drift, or an innocent-looking rewrite
that reintroduces an exchange fails loudly instead of surfacing rounds
later as a bench regression.

Budgets are ceilings, not targets: a plan using FEWER exchanges passes.
If a deliberate rewrite raises a budget, the new number needs the same
justification trail as a weak-list row (SCALE.md).
"""

from __future__ import annotations

import pytest

from duckdb_pst_spark.plans import introspect as pi
from duckdb_pst_spark.registry import load_all

SPECS = load_all()

# measured round 10: max(shuffle_count at sf0.001, at sf0.01)
BUDGETS = {
    "q_tpch_q1": 2,   # partial+final agg pair over one wide scan
    "q_tpch_q2": 4,   # min-cost offers chain (two agg pairs + join)
    "q_tpch_q3": 1,
    "q_tpch_q4": 2,
    "q_tpch_q5": 2,
    "q_tpch_q6": 1,   # pure scan-aggregate
    "q_tpch_q7": 4,
    "q_tpch_q8": 4,
    "q_tpch_q9": 2,
    "q_tpch_q10": 2,
    "q_tpch_q11": 2,  # partkey agg + tiny threshold filter (twin: 0)
    "q_tpch_q12": 2,
    "q_tpch_q13": 2,
    "q_tpch_q14": 1,
    "q_tpch_q15": 2,
    "q_tpch_q16": 3,
    "q_tpch_q17": 3,
    "q_tpch_q18": 2,
    "q_tpch_q19": 1,
    "q_tpch_q20": 2,
    "q_tpch_q21": 3,
    "q_tpch_q22": 3,
}


@pytest.mark.parametrize("name", sorted(BUDGETS))
def test_tpch_exchange_budget(spark, sf_dir, name):
    df = SPECS[name].builder(spark, sf_dir)
    got = pi.shuffle_count(df)
    assert got <= BUDGETS[name], (
        f"{name}: {got} exchanges > budget {BUDGETS[name]} — a shuffle "
        f"crept into the plan\n{pi.executed_plan(df)}"
    )
