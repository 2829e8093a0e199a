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


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module so its @query decorators run."""
    from duckdb_pst_spark.operators import (  # noqa: F401
        dedup,
        join_strategies,
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

    return REGISTRY
