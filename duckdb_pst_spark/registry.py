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
# Round 6 window (per VERDICT r4 item 8's pre-planned arithmetic; the
# round-5 window came back 49/50, so every oracle-bearing query now has a
# driver row and round 6 is the re-verification round):
#   1. q_decimal_money — the ONE round-5 red (hash mismatch on decimal128
#      outputs; rows+schema matched and values printed identically, so the
#      driver's value-hash is representation-sensitive for decimals).
#      Round 6 rewrote the outputs to the scaled-BIGINT discipline the
#      other 212 greens use; this slot re-proves it.
#   2. Canaries for plans round 6 rewrites after round 5's green row
#      (q_token_gini / q_phrase_pmi / q_dedup_incremental — the remaining
#      >2× perf items this round works on; green r5, re-check on the new
#      plans; q_degree_distribution's r5 rewrite was already inside the
#      r5 run, listed here because round 6 records its missing A/B).
#   3. The r4-rewritten greens that never got a canary slot (6).
#   4. Oldest-green one-per-family canaries (12), r1/r2 vintage.
#   5. Fill by registration order with the oldest r1 relational greens —
#      the least-recently-verified plans in the repo.
VERIFY_FIRST: tuple[str, ...] = (
    # the round-5 red, fixed this round (1)
    "q_decimal_money",
    # canaries: plans (possibly) rewritten in round 6 (5)
    "q_token_gini", "q_phrase_pmi", "q_dedup_incremental",
    "q_degree_distribution", "q_vocab_df",
    # canaries: r4-rewritten greens never re-windowed (6)
    "q_substring_spans", "q_dedup_semantic", "q_countmin", "q_kmv_jaccard",
    "q_passage_dedup", "q_winnowing",
    # oldest-green one-per-family canaries (12)
    "q_scan_project", "q_join_inner", "q_window_rank", "q_asof_join",
    "q_sessionize", "q_knn_lsh", "q_hll_distinct", "q_hash_sample",
    "q_minhash_sig", "q_ngram_jaccard", "q_tpch_q1", "q_pipeline_pretrain",
    # fill: oldest r1/r2 greens in registration order (26)
    "q_filter_eq", "q_filter_like", "q_filter_null", "q_count_star",
    "q_count_distinct", "q_groupby_count_order", "q_orderby_multi", "q_topn",
    "q_late_materialization", "q_distinct", "q_semi_join", "q_from_subquery",
    "q_case_when", "q_struct_access", "q_orderby_expr", "q_union",
    "q_join_agg_topn",
    # round-6 rewrites discovered after the fill was drafted: the DSIR
    # pair shares _dsir_scored (feat checkpoint changed both plans),
    # chi2 moved to the scan-local one-exchange contingency plan, the
    # media_real fixture grew progressive JPEGs (v5/v6 cycle) which
    # changes q_media_decode_real's pinned result set, keep_best moved
    # to the numpy poly-hash signature kernel, and then signatures_for
    # ITSELF migrated to that kernel — so every remaining signature
    # consumer (q_minhash_sig / q_dedup_minhash / q_dedup_incremental
    # already hold slots above) needs one too
    "q_dsir_weights", "q_dsir_resample", "q_chi2_terms",
    "q_media_decode_real", "q_dedup_keep_best",
    "q_lsh_recall", "q_dedup_cluster", "q_dedup_cluster_star",
    "q_cluster_size_histogram",
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

# Round-7 rotation inputs, test-gated (tests/test_oracle_parity.py)
# like ROUND5_PLANNED so the next window stays executable:
ROUND6_ADDITIONS: tuple[str, ...] = (
    "q_split_leakfree", "q_oov_rate", "q_ngram_novelty",
    "q_triangle_count", "q_knn_ivfpq", "q_lang_confusion",
    "q_ivf_nprobe_sweep", "q_dedup_threshold_sweep",
)
ROUND7_CANARIES: tuple[str, ...] = (
    # oracle-string refactor (green r3) + the two _lloyd_gemm
    # training migrations (green r4, md5-equal outputs at Zipf-100×)
    "q_lang_ngram", "q_kmeans_iter", "q_knn_ivf_trained",
)

# Round 7 window plan (keep the rotation math visible). With round 6 the
# rotation becomes a steady-state re-verification cycle:
#   0. The round-6 additions, never windowed: q_split_leakfree,
#      q_oov_rate, q_ngram_novelty, q_triangle_count, q_knn_ivfpq,
#      q_lang_confusion, q_ivf_nprobe_sweep, q_dedup_threshold_sweep
#      (locally hash-exact at sf0.001 AND sf0.01; new queries always
#      take the front slots — same rule that cleared the r3/r4 backlog).
#      q_lang_ngram needs a canary slot too: its oracle SQL was
#      refactored into the shared _DUCK_LANG_GUESS constant (same
#      semantics, green r3). So do q_kmeans_iter and q_knn_ivf_trained
#      (r4 greens whose training moved onto _lloyd_gemm late in round
#      6 — bit-exact, md5-equal outputs at Zipf-100×, but the plans
#      changed: 30.9 → 6.1 s and 32.7 → 7.9 s).
#   1. Canaries for any plan ROUND 7 rewrites (the signature-kernel
#      migration landed IN round 6 — signatures_for itself now runs on
#      functions/polyhash_np.py and every consumer holds a round-6
#      window slot, so no migration debt carries over).
#   2. Continue the registration-order fill where round 6 stopped: after
#      q_join_agg_topn comes q_multi_join q_agg_stats q_rollup_agg
#      q_cube_agg q_intersect q_except q_join_left_outer
#      q_join_full_outer q_anti_join q_percentile q_pivot
#      q_correlated_scalar q_having q_in_subquery q_grouping_sets
#      q_string_agg q_sql_functions q_json_extract q_unpivot, then
#      windows.py (q_window_lag q_window_running q_latest_per_key
#      q_window_range_frame q_window_ntiles q_time_bucket
#      q_gapfill_locf), then text.py / dedup.py / similarity.py /
#      sketches.py / sampling.py r2-r3 greens in file order until the
#      50 slots are full.
# Done = every oracle-bearing query re-verified within ~3 rounds of its
# last plan change.


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
