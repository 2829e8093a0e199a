"""Mirror of the driver's correctness gate, run at sf0.001 for speed.

Every oracle-bearing QuerySpec must hash-match DuckDB exactly. Set
SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01 to run at driver scale.
"""

from __future__ import annotations

import pytest

from duckdb_pst_spark.registry import load_all
from tests.oracle import compare

SPECS = load_all()
ORACLE_NAMES = [n for n, s in SPECS.items() if s.oracle is not None]
ROWS_ONLY_NAMES = [n for n, s in SPECS.items() if s.oracle is None]


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, sf_dir, name):
    compare(spark, SPECS[name], sf_dir)


def test_rows_only_class_is_empty():
    """Round 10 closed the rows-only class: every deterministic kernel
    DuckDB can't recompute (xxhash64, BLAS GEMM, media codecs, BPE
    training) now carries a constant-pinned VALUES golden
    (tools/pin_goldens.py), so the driver hash-checks all of them."""
    assert ROWS_ONLY_NAMES == []


def test_pinned_goldens_match_current_corpus():
    """The sf-dependent pinned goldens are only the queries' outputs on
    the EXACT corpus they were generated at. The driver regenerates
    testdata between rounds (it has changed parquet physical types
    before), so gate on a content digest and fail with the fix, not
    with six opaque hash mismatches in the verify window."""
    import hashlib
    import os

    from duckdb_pst_spark.goldens_pinned import PINNED_CORPUS_DIGEST, PINNED_SF

    h = hashlib.sha1()
    for t in ("documents", "embeddings"):
        with open(os.path.join(PINNED_SF, f"{t}.parquet"), "rb") as f:
            h.update(f.read())
    assert h.hexdigest()[:16] == PINNED_CORPUS_DIGEST, (
        f"{PINNED_SF} was regenerated since the goldens were pinned — "
        "re-run `python tools/pin_goldens.py` (it re-verifies determinism "
        "and round-trips every literal) and commit the refreshed "
        "duckdb_pst_spark/goldens_pinned.py"
    )


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_no_nested_output_columns(spark, sf_dir):
    """Driver-contract guard: the driver's canonicalizer pandas-sorts result
    columns, so an Array/Map/Struct output column in an oracle-bearing query
    dies with `unhashable type` at verify time (bug class that broke
    q_embedding_quantize in r2 and q_pstbin_dlist_ids in r3). Ban the class:
    every oracle-bearing spec must emit scalar columns only (explode /
    posexplode nested data into rows instead)."""
    from pyspark.sql import types as T

    offenders = {}
    for name in ORACLE_NAMES:
        schema = SPECS[name].builder(spark, sf_dir).schema
        nested = [
            f.name for f in schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        if nested:
            offenders[name] = nested
    assert not offenders, f"oracle-bearing queries with nested output columns: {offenders}"


def test_verify_window_rotation_consistent():
    """The driver checks the first 50 of load_all(): every window slot
    must be oracle-bearing (a rows-only spec can never go green), the
    rows-only specs must sort last, and ROUND5_PLANNED must name real
    oracle-bearing queries so the next rotation stays executable."""
    from duckdb_pst_spark.registry import (
        ROUND5_PLANNED,
        ROUND6_ADDITIONS,
        ROUND7_ADDITIONS,
        ROUND7_CANARIES,
        ROUND8_ADDITIONS,
        ROUND9_ADDITIONS,
        ROUND9_CANARIES,
        ROUND10_ADDITIONS,
        VERIFY_FIRST,
    )

    names = list(SPECS)
    assert names[: len(VERIFY_FIRST)] == list(VERIFY_FIRST)
    assert all(SPECS[n].oracle is not None for n in VERIFY_FIRST)
    rows_only = [n for n, s in SPECS.items() if s.oracle is None]
    if rows_only:  # class emptied in round 10; guard names[-0:] == all
        assert names[-len(rows_only):] == rows_only
    # the round-11 window: the three round-11 registrations lead (the
    # Q3/Q13/Q22 twins each need their first hash-checked driver row),
    # then the pure oldest-green-first rotation — three r4 stragglers,
    # the 29-query r5 block, r6 registration-order fill. No canaries
    # owed (no green plan was rewritten this round).
    from duckdb_pst_spark.registry import ROUND11_ADDITIONS

    n_add = len(ROUND11_ADDITIONS)
    assert list(VERIFY_FIRST[:n_add]) == list(ROUND11_ADDITIONS)
    assert list(VERIFY_FIRST[n_add:n_add + 3]) == [
        "q_corpus_card", "q_filter_cascade", "q_media_dedup"
    ]
    r5_block = set(VERIFY_FIRST[n_add + 3:n_add + 32])
    assert r5_block <= set(ROUND5_PLANNED) | {
        "q_dedup_minhash", "q_heavy_hitters", "q_tfidf", "q_bigram_surprise",
    }, r5_block - set(ROUND5_PLANNED)
    assert len(VERIFY_FIRST) == 50, len(VERIFY_FIRST)
    for planned in (ROUND5_PLANNED, ROUND6_ADDITIONS, ROUND7_CANARIES,
                    ROUND7_ADDITIONS, ROUND8_ADDITIONS, ROUND9_ADDITIONS,
                    ROUND9_CANARIES, ROUND10_ADDITIONS, ROUND11_ADDITIONS):
        assert all(
            n in SPECS and SPECS[n].oracle is not None for n in planned
        ), [n for n in planned if n not in SPECS or SPECS[n].oracle is None]


def test_survey_inventory_matches_registry():
    """SURVEY.md §2's operator inventory and the registry must stay 1:1 —
    the declared surface IS the checked surface."""
    import os
    import re

    survey = open(os.path.join(os.path.dirname(__file__), "..", "SURVEY.md")).read()
    declared = set(re.findall(r"`(q_[a-z0-9_]+)`", survey))
    registered = set(SPECS)
    assert declared == registered, {
        "declared_not_registered": sorted(declared - registered),
        "registered_not_declared": sorted(registered - declared),
    }
