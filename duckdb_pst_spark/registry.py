"""Central query registry.

Every operator from SURVEY.md §2 registers a ``QuerySpec`` here; the
driver contract (``__spark_entry__.py``) and ``bench.py`` both read from
this one place. ``oracle`` is the ANSI-SQL equivalent DuckDB runs on the
same parquet views for the correctness gate (None → rows-only check for
genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None = None
    tags: tuple[str, ...] = ()
    bench: bool = False  # include in bench.py headline set
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(spec: QuerySpec) -> QuerySpec:
    if spec.name in REGISTRY:
        raise ValueError(f"duplicate query name {spec.name!r}")
    REGISTRY[spec.name] = spec
    return spec


def query(
    name: str,
    *,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
):
    """Decorator form: @query("q_x", oracle="SELECT ...")."""

    def deco(fn: Builder) -> Builder:
        register(QuerySpec(name, fn, oracle=oracle, tags=tags, bench=bench, doc=fn.__doc__ or ""))
        return fn

    return deco


# The driver's correctness gate checks a PREFIX of the registered queries
# (round 1 recorded exactly the first 50 in registration order). To get
# every declared query hash-verified across rounds, load_all() serves the
# registry re-ordered: names listed here come first (in this order), then
# the remaining oracle-bearing specs in registration order, then the
# rows-only specs LAST — a rows-only spec can never produce a green row,
# so it must never occupy a window slot (r3 wasted 4 slots on them).
#
# Round 5 window (per VERDICT r4 item 1, executing the pre-planned
# rotation below): the 39 remaining oracle-bearing never-windowed queries
# (ROUND5_PLANNED) + 11 canaries. Canary arithmetic: of the 10 names the
# round-4 plan reserved, four (q_cluster_size_histogram, q_char_diversity,
# q_token_gini, q_dedup_simhash_prod) are themselves never-windowed and
# already inside ROUND5_PLANNED, so the unique canary adds are the other
# six; the remaining five slots go to queries whose plans ROUND 5 rewrote
# after their r4 green row (q_dedup_incremental shuffle fuse, q_hybrid_rrf
# arm checkpointing, q_sequence_gaps distinct shave — sequence_gaps is in
# ROUND5_PLANNED already) plus the two oldest rewritten-in-r4 greens that
# could not fit r4's window (q_heavy_hitters, q_phrase_pmi,
# q_bigram_surprise).
VERIFY_FIRST: tuple[str, ...] = (
    # never-windowed: relational additions (9)
    "q_zorder_stats", "q_jsonl_ingest", "q_except_all", "q_intersect_all",
    "q_orderby_nulls", "q_decimal_money", "q_hof_parity", "q_sequence_gaps",
    "q_benford",
    # never-windowed: window/time-series family (11)
    "q_window_count_distinct", "q_anomaly_zscore", "q_events_funnel",
    "q_retention_cohorts", "q_cdc_apply", "q_scd2_intervals", "q_merge_upsert",
    "q_skyline", "q_ohlc_bars", "q_regr_slope", "q_attribution_last_touch",
    # never-windowed: streaming replays (4)
    "q_stream_closed_windows", "q_stream_topk", "q_stream_cdc_merge",
    "q_stream_sessions_native",
    # never-windowed: round-4 additions (15)
    "q_media_decode_real", "q_media_salvage_real",
    "q_tpch_q3", "q_tpch_q18", "q_dedup_simhash_prod",
    "q_char_diversity", "q_token_gini", "q_mad_outliers",
    "q_cluster_size_histogram", "q_stream_late_data",
    "q_quality_linear", "q_stream_dedup_wm", "q_containment_prefix",
    "q_kmv_grouped", "q_profile_columns",
    # canaries: plans rewritten in round 4 after their last driver check (6)
    "q_dedup_cluster", "q_dedup_cluster_star", "q_tfidf", "q_vocab_df",
    "q_degree_distribution", "q_dedup_minhash",
    # canaries: plans rewritten in round 5 (2) + r4-rewritten spillover (3)
    "q_dedup_incremental", "q_hybrid_rrf",
    "q_heavy_hitters", "q_phrase_pmi", "q_bigram_surprise",
)

# ROUND5_PLANNED: the 39 oracle-bearing queries that had never been inside
# any driver window as of round 4 — all 39 occupy the first slots of the
# round-5 VERIFY_FIRST above. Kept as a named tuple so the rotation
# arithmetic stays test-gated (tests/test_oracle_parity.py).
ROUND5_PLANNED: tuple[str, ...] = (
    "q_zorder_stats", "q_jsonl_ingest", "q_except_all", "q_intersect_all",
    "q_orderby_nulls", "q_decimal_money", "q_hof_parity", "q_sequence_gaps",
    "q_benford",
    "q_window_count_distinct", "q_anomaly_zscore", "q_events_funnel",
    "q_retention_cohorts", "q_cdc_apply", "q_scd2_intervals", "q_merge_upsert",
    "q_skyline", "q_ohlc_bars", "q_regr_slope", "q_attribution_last_touch",
    "q_stream_closed_windows", "q_stream_topk", "q_stream_cdc_merge",
    "q_stream_sessions_native",
    # round-4 additions (oracle-bearing, never windowed)
    "q_media_decode_real", "q_media_salvage_real",
    "q_tpch_q3", "q_tpch_q18", "q_dedup_simhash_prod",
    "q_char_diversity", "q_token_gini", "q_mad_outliers",
    "q_cluster_size_histogram", "q_stream_late_data",
    "q_quality_linear", "q_stream_dedup_wm", "q_containment_prefix",
    "q_kmv_grouped", "q_profile_columns",
)

# Round 6 window plan (keep the rotation math visible). After a clean
# round-5 window every one of the 213 oracle-bearing queries has been
# inside at least one driver window, so round 6 is pure re-verification:
#   1. Canaries for any plan ROUND 5 rewrites after the r5 window list was
#      frozen (tracked in SCALE.md §"round 5"): none expected beyond the
#      ones already seeded in VERIFY_FIRST, but check before freezing.
#   2. The r4-rewritten greens that never got a canary slot:
#      q_substring_spans q_dedup_semantic q_countmin q_kmv_jaccard
#      q_passage_dedup q_winnowing.
#   3. Oldest-green r1/r2 family canaries, one per operator family, in age
#      order: q_scan_project q_join_inner q_window_rank q_asof_join
#      q_sessionize q_knn_lsh q_hll_distinct q_hash_sample q_minhash_sig
#      q_ngram_jaccard q_tpch_q1 q_pipeline_pretrain — then widen by file
#      order (relational.py → windows.py → …) until the 50 slots are full.
# Done = CORRECTNESS_r06 re-proves every family on its current plan.


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module so its @query decorators run."""
    from duckdb_pst_spark.operators import (  # noqa: F401
        dedup,
        join_strategies,
        pipeline,
        recursive,
        relational,
        sampling,
        similarity,
        sketches,
        text,
        windows,
    )
    from duckdb_pst_spark.multimodal import queries as _mm_queries  # noqa: F401
    from duckdb_pst_spark.sources.mspst import queries as _pstbin_queries  # noqa: F401
    from duckdb_pst_spark.sources import pst_queries  # noqa: F401
    from duckdb_pst_spark.streaming import events as _streaming_events  # noqa: F401
    from duckdb_pst_spark.streaming import stateful as _streaming_stateful  # noqa: F401

    missing = [n for n in VERIFY_FIRST if n not in REGISTRY]
    if missing:
        raise KeyError(f"VERIFY_FIRST names not registered: {missing}")
    head = {n: REGISTRY[n] for n in VERIFY_FIRST}
    rows_only_in_window = [n for n, s in head.items() if s.oracle is None]
    if rows_only_in_window:
        raise ValueError(
            f"rows-only specs may not occupy window slots: {rows_only_in_window}"
        )
    # Oracle-bearing specs before rows-only ones, each group in
    # registration order — rows-only specs can never produce a green
    # driver row, so they must sort behind every proveable query.
    tail = [(n, s) for n, s in REGISTRY.items() if n not in head]
    tail_oracle = {n: s for n, s in tail if s.oracle is not None}
    tail_rows_only = {n: s for n, s in tail if s.oracle is None}
    return {**head, **tail_oracle, **tail_rows_only}
