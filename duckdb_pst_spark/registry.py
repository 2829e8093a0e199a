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
# Round 8 window (executes the plan pre-queued in round 7; arithmetic
# below sums to exactly 50):
#   0. ROUND8_ADDITIONS (16) — queries registered THIS round, all
#      hash-exact at sf0.001 and sf0.01 under the hostile-timezone
#      probe (new queries always take the front slots). The second
#      batch (TPC-H Q7/Q8/Q9/Q2/Q11/Q16/Q20/Q21/Q22 — the suite
#      completion) displaced nine more fill slots to round 9.
#   1. Canaries: none owed — the round-7 window verified every plan
#      round 7 rewrote, and round 8's A/B program shipped NO plan
#      changes (the signature-kernel re-check CONFIRMED the r6 ship
#      idle; the group-topk fusion and the runtime bloom filter were
#      measured no-ships; bucketed TPC-H twins are tools/, not
#      registered plans).
#   2. Fill (34) — continue the registration-order re-verification
#      cycle where round 7 stopped: the 9 text.py r2 greens the
#      round-7 additions displaced, the rest of the text.py r2/r3
#      block (5), then dedup/similarity/sketches/sampling r1-r3
#      greens in file order (12), the r1 recursive trio (3),
#      join_strategies r2 (2), and the first multimodal r2/r3
#      block (3) — the remaining multimodal + pstbin fill was
#      displaced by the TPC-H-completion batch to round 9.
VERIFY_FIRST: tuple[str, ...] = (
    # round-8 additions, registered this round (16)
    "q_tpch_q4", "q_tpch_q12", "q_tpch_q14", "q_join_key_skew",
    "q_char_class_profile", "q_tpch_q17", "q_tpch_q15",
    "q_tpch_q7", "q_tpch_q8", "q_tpch_q9", "q_tpch_q2", "q_tpch_q11",
    "q_tpch_q16", "q_tpch_q20", "q_tpch_q21", "q_tpch_q22",
    # fill: text.py r2 greens displaced from the round-7 window (9)
    "q_explode", "q_explode_agg", "q_list_first", "q_length",
    "q_text_tokens", "q_lang_stopword", "q_quality_score",
    "q_pack_sequences", "q_contamination",
    # fill: rest of the text.py r2/r3 block (5)
    "q_repetition", "q_pii_scrub", "q_fingerprint", "q_doc_chunk",
    "q_text_tokens_bpe",
    # fill: dedup.py r1-r3 greens in file order (3)
    "q_dedup_exact", "q_dedup_simhash", "q_dedup_minhash_vec",
    # fill: similarity.py r2/r3 greens (6)
    "q_embedding_norm", "q_knn_brute", "q_dedup_embedding",
    "q_knn_ivf", "q_embedding_quantize", "q_knn_recall",
    # fill: sketches.py + sampling.py r2 greens (3)
    "q_kmv_distinct", "q_approx_quantile", "q_stratified_sample",
    # fill: recursive.py r1 greens — the OLDEST standing rows (3)
    "q_recursive_descendants", "q_recursive_ancestors",
    "q_recursive_native",
    # fill: join_strategies.py r2 greens (2)
    "q_range_join", "q_skew_join_salted",
    # fill: multimodal r2/r3 greens (3 — the rest of the multimodal
    # block and the first pstbin r3 block were displaced by the
    # TPC-H-completion batch and head the round-9 fill)
    "q_media_stats", "q_media_meta_consistent", "q_video_frame_sample",
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
ROUND7_ADDITIONS: tuple[str, ...] = (
    # registered in round 7, windowed in round 7 (front slots)
    "q_tpch_q5", "q_quality_ks", "q_tokenizer_fertility",
    "q_dedup_prefix_exact", "q_triangle_count_pte",
    "q_minhash_band_stats", "q_group_topk_freq", "q_tpch_q10",
    "q_tpch_q6",
)

ROUND8_ADDITIONS: tuple[str, ...] = (
    # registered in round 8, windowed in round 8 (front slots)
    "q_tpch_q4", "q_tpch_q12", "q_tpch_q14", "q_join_key_skew",
    "q_char_class_profile", "q_tpch_q17", "q_tpch_q15",
    # second round-8 batch: the TPC-H suite completion — all 22
    # reference-family queries now registered (adapted to the
    # testdata schema where it lacks partsupp / commit dates)
    "q_tpch_q7", "q_tpch_q8", "q_tpch_q9", "q_tpch_q2", "q_tpch_q11",
    "q_tpch_q16", "q_tpch_q20", "q_tpch_q21", "q_tpch_q22",
)

# Round 9 window plan (the rotation math, finalized end of round 8):
#   0. Any round-9 registry additions, never windowed (new queries
#      always take the front slots).
#   1. ROUND9_CANARIES: none owed as of end of round 8 — round 8
#      shipped zero plan changes to green queries (its A/B program
#      confirmed the r6 signature-kernel ship idle and no-shipped the
#      group-topk fusion and the runtime bloom filter; the bucketed
#      TPC-H twins live in tools/, not in registered plans). If round
#      9 rewrites a green outside its own window, that query takes a
#      front slot.
#   2. Continue the registration-order fill where round 8 stopped:
#      the three multimodal greens the TPC-H-completion batch
#      displaced (q_image_resize_bytes q_media_probe_real
#      q_media_doc_join), the full pstbin r3 block
#      (q_pstbin_folders q_pstbin_class_counts
#      q_pstbin_sticky_geometry q_pstbin_appointment
#      q_pstbin_dlist_members q_pstbin_task),
#      q_pstbin_counts q_pstbin_count_stats (displaced by the late
#      round-8 Q17/Q15 additions), the remaining pstbin r3/r4 greens
#      (q_pstbin_body_truncate
#      q_pstbin_read_limit q_pstbin_attachment_gate
#      q_pstbin_folder_tree q_pstbin_parent_tree q_pstbin_dlist_ids),
#      the pst_queries r3 block (9), the streaming r3 greens
#      (q_stream_dedup q_stream_window_counts q_stream_stream_join
#      q_stream_stateful_sessions), then the r4 greens in file order
#      (windows.py q_sessionize/q_asof_join are r6 — skip; text.py
#      q_quality_gate_quantile q_token_histogram q_quality_gopher
#      q_bm25 q_bpe_pairs q_histogram_drift, dedup.py
#      q_dedup_simhash_hamming q_setsim_prefix, join_strategies
#      q_bloom_prune q_fuzzy_blocking, similarity q_knn_recall_ivf
#      q_ann_rerank q_knn_pq q_knn_recall_pq q_auc q_embedding_drift,
#      sketches q_source_overlap q_exact_median_2pass, sampling
#      q_source_mix q_source_cap q_global_shuffle, recursive
#      q_pagerank, relational q_lateral_topk q_tpch_q19 q_tpch_q13
#      q_nullsafe_join q_not_in_nulls) until the 50 slots are full.
# Done = every oracle-bearing query re-verified within ~3 rounds of its
# last plan change.
#
# Round-9 harmonization (DONE this round): Q17/Q18 AND the completion
# batch's Q9/Q11/Q20 (the round-8 claim that the batch already used
# FLOOR was wrong — caught by the round-8 advisor) all used the raw
# CAST(l_quantity AS BIGINT), which rounds half-away in DuckDB but
# truncates in Spark — latent on the integral-quantity generated
# corpora, divergent on any fractional corpus. All five builders and
# oracles (plus q_profile_columns' shared projection string) now use
# CAST(FLOOR(l_quantity) AS BIGINT) / F.floor(...).cast("long"), and
# tests/test_fuzz_oracle.py pins a fractional-quantity corpus where
# the old form measurably diverges. The five rewritten queries owe
# canary slots in the round-9 window (ROUND9_CANARIES below).


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module so its @query decorators run."""
    from duckdb_pst_spark.operators import (  # noqa: F401
        bucketed,
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
