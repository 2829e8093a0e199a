"""Loaders for the driver-generated synthetic tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file per table under ``sf_dir``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table. Parquet scan → Catalyst gets column
    pruning, predicate pushdown and footer-stats count(*) for free."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return _events(spark, path)
    return spark.read.parquet(path)


def _events(spark: SparkSession, path: str) -> DataFrame:
    """Some testdata generations store ``ts`` as parquet TIMESTAMP(NANOS),
    which the Spark reader rejects; others as TIMESTAMP(MICROS), which it
    reads natively. Read with nanosAsLong enabled and rebuild a
    TIMESTAMP_NTZ only when ``ts`` actually arrives as BIGINT nanos —
    timezone-independent, exact to the microsecond (same as DuckDB)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(path)
    ts_field = raw.schema["ts"].dataType
    if not isinstance(ts_field, T.LongType):
        return raw
    ts = F.expr(
        "TIMESTAMP_NTZ '1970-01-01 00:00:00' + "
        "make_dt_interval(0, 0, 0, CAST(ts div 1000 AS DECIMAL(20,0)) / 1000000)"
    )
    return raw.withColumn("ts", ts)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every synthetic table as a temp view for spark.sql use."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
