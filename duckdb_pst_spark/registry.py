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
# rest follow in registration order. Round 2 window = the six queries
# whose round-1 hashes mismatched (HUGEINT/Arrow issue, now fixed) plus
# the oracle-bearing families round 1 never reached.
VERIFY_FIRST: tuple[str, ...] = (
    # round-1 hash mismatches, re-proven first
    "q_tpch_q1", "q_join_agg_topn", "q_multi_join", "q_grouping_sets",
    "q_range_join", "q_skew_join_salted",
    # relational tail never checked in round 1
    "q_json_extract", "q_unpivot", "q_explode", "q_explode_agg",
    "q_list_first", "q_length",
    # sampling
    "q_hash_sample", "q_stratified_sample",
    # similarity / ANN
    "q_embedding_norm", "q_knn_brute", "q_knn_lsh", "q_knn_ivf",
    "q_dedup_embedding", "q_embedding_quantize", "q_knn_recall",
    # sketches
    "q_kmv_distinct", "q_hll_distinct", "q_approx_quantile", "q_heavy_hitters",
    # text analysis
    "q_text_tokens", "q_lang_stopword", "q_quality_score", "q_pack_sequences",
    "q_tfidf", "q_contamination", "q_repetition", "q_pii_scrub",
    "q_fingerprint", "q_doc_chunk", "q_vocab_df",
    # windows / time-series
    "q_window_rank", "q_window_lag", "q_window_running", "q_sessionize",
    "q_asof_join", "q_window_range_frame", "q_latest_per_key",
    "q_window_ntiles", "q_time_bucket", "q_gapfill_locf",
    # multimodal (oracle-bearing)
    "q_media_stats", "q_media_meta_consistent", "q_video_frame_sample",
    "q_image_resize_bytes",
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
