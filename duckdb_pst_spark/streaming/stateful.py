"""Custom stateful streaming operator — ``applyInPandasWithState``
session aggregation (north-star streaming surface; the reference has no
streaming, SURVEY.md §2.D).

Gap-based sessions (30-min inactivity) are computed by an explicit
per-user state machine running inside Structured Streaming — the shape
every custom stateful operator takes at scale: state keyed by user_id,
hash-partitioned across executors, one state store entry per key,
watermark-bounded in a continuous run.

Determinism for the bounded replay: a far-future SENTINEL event per user
closes every open session at end-of-stream (state flush), so the
streaming result equals the batch/oracle sessionization exactly — the
same trick as a punctuation/flush watermark in other engines.
"""

from __future__ import annotations

import datetime
import os
import shutil
import uuid
from pathlib import Path
from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampNTZType,
)

from duckdb_pst_spark.registry import query
from duckdb_pst_spark.streaming.events import streaming_window_counts  # noqa: F401
from duckdb_pst_spark.tables import table

_CACHE_DIR = Path(__file__).resolve().parent.parent.parent / ".cache"

GAP_MINUTES = 30

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampNTZType()),
        StructField("n_events", LongType()),
    ]
)
STATE_SCHEMA = StructType(
    [
        StructField("last_ts", LongType()),  # micros since epoch
        StructField("session_start", LongType()),
        StructField("n_events", LongType()),
    ]
)

_GAP_US = GAP_MINUTES * 60 * 1_000_000


def _sessionize_group(
    key: Tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user state machine: emit a row per CLOSED session. Sentinel
    events (event_id < 0) only close; they are never counted."""
    (user_id,) = key
    if state.exists:
        last_ts, start, n = state.get
    else:
        last_ts, start, n = None, None, 0
    out = []
    for pdf in batches:
        pdf = pdf.sort_values(["ts", "event_id"])
        for ts, eid in zip(pdf["ts"], pdf["event_id"]):
            us = int(ts.value // 1000)  # ns → µs
            if last_ts is not None and us > last_ts + _GAP_US:
                if n > 0:
                    out.append((user_id, start, n))
                start, n = None, 0
            if eid >= 0:
                if n == 0:
                    start = us
                n += 1
            last_ts = us
    state.update((last_ts, start, n))
    if out:
        yield pd.DataFrame(
            {
                "user_id": [o[0] for o in out],
                "session_start": pd.to_datetime([o[1] for o in out], unit="us"),
                "n_events": [o[2] for o in out],
            }
        )


def stateful_sessions(spark: SparkSession, events_dir: str) -> DataFrame:
    """readStream → groupBy(user_id) → applyInPandasWithState → closed
    sessions. Returns the streaming DataFrame."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    if dict(stream.dtypes)["ts"] == "bigint":
        stream = stream.withColumn(
            "ts",
            F.expr(
                "TIMESTAMP_NTZ '1970-01-01 00:00:00' + "
                "make_dt_interval(0, 0, 0, CAST(ts div 1000 AS DECIMAL(20,0)) / 1000000)"
            ),
        )
    return (
        stream.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


@query(
    "q_stream_stateful_sessions",
    oracle=f"""
    WITH lagged AS (
      SELECT user_id, event_id, ts,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    ), flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN prev IS NULL OR ts > prev + INTERVAL {GAP_MINUTES} MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM lagged
    ), sess AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    )
    SELECT user_id, min(ts) AS session_start, COUNT(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
    tags=("streaming", "stateful"),
)
def q_stream_stateful_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator end-to-end: per-user session summaries
    computed by applyInPandasWithState inside an actual streaming query
    (AvailableNow trigger), flushed via per-user sentinel events, and
    hash-checked against DuckDB's batch sessionization."""
    staging = str(_CACHE_DIR / f"dps_sessions_{uuid.uuid4().hex[:8]}")
    os.makedirs(staging, exist_ok=True)
    try:
        return _run_stateful_sessions(spark, sf_dir, staging)
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def _run_stateful_sessions(spark: SparkSession, sf_dir: str, staging: str) -> DataFrame:
    shutil.copy(
        os.path.join(sf_dir, "events.parquet"), os.path.join(staging, "part-0.parquet")
    )
    # sentinel flush: one far-future event per user closes open sessions.
    # Sentinels must match the physical type of `ts` in the parquet —
    # BIGINT nanos under the nanosAsLong shim for TIMESTAMP(NANOS) data,
    # a plain timestamp column otherwise.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if dict(raw.dtypes)["ts"] == "bigint":
        max_ns = raw.agg(F.max("ts")).collect()[0][0]
        sentinel_ts = F.lit(max_ns + 10 * 3600 * 10**9).cast("long")
    else:
        sentinel_ts = F.lit(
            raw.agg(F.max("ts")).collect()[0][0] + datetime.timedelta(hours=10)
        ).cast(dict(raw.dtypes)["ts"])
    sentinels = (
        raw.select("user_id")
        .distinct()
        .select(
            F.lit(-1).cast("long").alias("event_id"),
            sentinel_ts.alias("ts"),
            F.col("user_id"),
            F.lit("__sentinel__").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit(None).cast("string").alias("props"),
        )
    )
    sentinels.write.mode("overwrite").parquet(os.path.join(staging, "zz_sentinel"))
    for f in os.listdir(os.path.join(staging, "zz_sentinel")):
        if f.endswith(".parquet"):
            shutil.move(
                os.path.join(staging, "zz_sentinel", f),
                os.path.join(staging, f"part-1-{f}"),
            )
    shutil.rmtree(os.path.join(staging, "zz_sentinel"), ignore_errors=True)

    from duckdb_pst_spark.streaming.finalize import finalize_append

    return finalize_append(stateful_sessions(spark, staging), "stateful_sessions")
