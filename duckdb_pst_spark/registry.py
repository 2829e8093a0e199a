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
# registry re-ordered: names listed here come first (in this order), the
# rest follow in registration order.
#
# Round 3 window = every query never yet inside a driver window (the
# flagship pipeline, the binary-PST and golden-PST families, streaming,
# GEMM ANN, BPE/ngram text), the round-1 ERR pair q_dedup_minhash_fast /
# q_dedup_minhash_vec (fixed in r2, never re-proven), the round-2 ERR
# q_embedding_quantize (output reshaped to scalar columns this round) —
# 37 must-prove slots — plus 13 canaries from already-green families
# this round's diff touches (heavy-hitters MG rewrite, kernel rebatching
# in dedup/gemm, multimodal codec work) and the float-heavy flagships,
# so a regression in previously-verified code stays visible to the
# external gate (ADVICE r2).
VERIFY_FIRST: tuple[str, ...] = (
    # flagship chain + the two stale-ERR minhash hot paths
    "q_pipeline_pretrain", "q_dedup_minhash_vec", "q_dedup_minhash_fast",
    # round-2 ERR, output shape fixed this round
    "q_embedding_quantize",
    # never-windowed: ANN hot path, text, multimodal (probe_real is new
    # this round: real JPEG header decode over the golden archive)
    "q_knn_gemm", "q_text_tokens_bpe", "q_lang_ngram",
    "q_image_decode", "q_audio_features", "q_media_doc_join",
    "q_media_probe_real",
    # never-windowed: binary PST reader surface (14)
    "q_pstbin_folders", "q_pstbin_class_counts", "q_pstbin_sticky_geometry",
    "q_pstbin_appointment", "q_pstbin_dlist_members", "q_pstbin_task",
    "q_pstbin_dlist_ids", "q_pstbin_counts", "q_pstbin_count_stats",
    "q_pstbin_body_truncate", "q_pstbin_read_limit",
    "q_pstbin_attachment_gate", "q_pstbin_folder_tree", "q_pstbin_parent_tree",
    # never-windowed: golden-PST bridge surface (9)
    "q_pst_folders_scan", "q_pst_class_counts", "q_pst_folder_tree",
    "q_pst_recipients_explode", "q_pst_body_truncate", "q_pst_read_limit",
    "q_pst_attachment_gate", "q_pst_dlist_members", "q_pst_folder_invariants",
    # never-windowed: streaming (4)
    "q_stream_dedup", "q_stream_window_counts", "q_stream_stream_join",
    "q_stream_stateful_sessions",
    # canaries: families touched by this round's diff
    "q_heavy_hitters", "q_knn_brute", "q_dedup_exact", "q_minhash_sig",
    "q_dedup_minhash", "q_dedup_cluster", "q_media_stats",
    "q_image_resize_bytes",
    # canaries: float-heavy flagships from the round-1/2 windows
    "q_tpch_q1", "q_join_agg_topn", "q_multi_join", "q_agg_stats",
)


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
    tail = {n: s for n, s in REGISTRY.items() if n not in head}
    return {**head, **tail}
