"""Structured Streaming surface for the events stream.

The reference has no streaming (SURVEY.md §2.D); this is the north-star
streaming path: the same windowed aggregation you'd run continuously at
scale (readStream → watermark → window agg → writeStream), exercised here
with ``Trigger.AvailableNow`` over the bounded events table so the result
is a finite DataFrame the driver can oracle-check against DuckDB's
``time_bucket`` — the streaming/batch unification Spark promises.

Scale notes: tumbling-window counts keyed by (window, event_type) shuffle
once per micro-batch with map-side partial aggregation; state store size
is bounded by watermarking in a real continuous run.
"""

from __future__ import annotations

import os
import shutil
import uuid
from pathlib import Path

_CACHE_DIR = Path(__file__).resolve().parent.parent.parent / ".cache"

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_pst_spark.registry import query
from duckdb_pst_spark.tables import table


def streaming_window_counts(
    spark: SparkSession, events_dir: str, *, window: str = "1 hour"
) -> DataFrame:
    """readStream(parquet dir) → tumbling-window count per event_type.
    Returns the *streaming* DataFrame (caller picks trigger/sink)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    if dict(stream.dtypes)["ts"] == "bigint":
        # nanos-as-long (see tables._events): rebuild microsecond TIMESTAMP_NTZ
        stream = stream.withColumn(
            "ts",
            F.expr(
                "TIMESTAMP_NTZ '1970-01-01 00:00:00' + "
                "make_dt_interval(0, 0, 0, CAST(ts div 1000 AS DECIMAL(20,0)) / 1000000)"
            ),
        )
    if dict(stream.dtypes)["ts"] == "timestamp":
        # Watermark bounds state store growth in a continuous run. Spark
        # only supports event-time watermarks on TIMESTAMP (LTZ); on an
        # NTZ column we rely on complete-mode output instead (correct for
        # bounded replays like Trigger.AvailableNow).
        stream = stream.withWatermark("ts", "1 hour")
    return (
        stream.groupBy(F.window(F.col("ts"), window).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt")
    )


_NTZ_EPOCH = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"
#: epoch-micros of the NTZ event time — the tz-independent numeric bridge
_TS_US = f"timestampdiff(MICROSECOND, {_NTZ_EPOCH}, ts)"


def _stage_event_batches(spark: SparkSession, sf_dir: str, staging: str, preds) -> object:
    """Stage the events table as ONE parquet file per predicate with
    strictly increasing mtimes, so ``maxFilesPerTrigger=1`` replays them
    as deterministic micro-batches in list order. Event time is
    normalized to TIMESTAMP_NTZ by ``tables.table`` BEFORE staging (the
    repo's single nanos-shim site), so the staged schema needs no
    stream-side rebuild. Returns the staged schema."""
    import time as _time

    ev = table(spark, sf_dir, "events")
    now = _time.time()
    for i, pred in enumerate(preds):
        part_dir = os.path.join(staging, f"b{i}")
        ev.where(pred).coalesce(1).write.mode("overwrite").parquet(part_dir)
        files = [f for f in os.listdir(part_dir) if f.endswith(".parquet")]
        dst = os.path.join(staging, f"part-{i}.parquet")
        shutil.move(os.path.join(part_dir, files[0]), dst)
        shutil.rmtree(part_dir, ignore_errors=True)
        mt = now - 100 + i  # strictly increasing mtimes = batch order
        os.utime(dst, (mt, mt))
    return spark.read.parquet(os.path.join(staging, "part-0.parquet")).schema


def _replay_stream(spark: SparkSession, staging: str, schema) -> DataFrame:
    """``maxFilesPerTrigger=1`` file stream over a staged directory, with
    the NTZ→LTZ numeric watermark bridge attached (no session-timezone
    cast, DST-immune)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
        .withColumn("ltz", F.expr(f"timestamp_micros({_TS_US})"))
        .withWatermark("ltz", "30 minutes")
    )


@query(
    "q_stream_dedup",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    tags=("streaming", "dedup"),
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup — ``dropDuplicates`` over an unbounded
    stream, the continuous form of the training-pipeline content-hash
    dedup (state keyed by the dedup key, new keys emitted in append
    mode). Only the key columns are selected so the surviving-row choice
    cannot make the result nondeterministic. In a real continuous run
    the key includes an event-time column under ``withWatermark`` so
    state is droppable; bounded replay (AvailableNow) needs no watermark."""
    from duckdb_pst_spark.streaming.finalize import finalize_append

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    staging = str(_CACHE_DIR / f"dps_events_{uuid.uuid4().hex[:8]}")
    os.makedirs(staging, exist_ok=True)
    shutil.copy(os.path.join(sf_dir, "events.parquet"), os.path.join(staging, "part-0.parquet"))
    schema = spark.read.parquet(staging).schema
    # parquet-sink finalization: the distinct key set is written by
    # executors and scanned lazily — the driver never holds the
    # O(#distinct keys) result (it would not survive a wide key at scale)
    result = finalize_append(
        spark.readStream.schema(schema)
        .parquet(staging)
        .dropDuplicates(["user_id", "event_type"])
        .select("user_id", "event_type"),
        "stream_dedup",
    )
    shutil.rmtree(staging, ignore_errors=True)
    return result


@query(
    "q_stream_window_counts",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type, COUNT(*) AS cnt
    FROM events
    GROUP BY 1, 2
    """,
    tags=("streaming",),
)
def q_stream_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window counts per event_type, computed by an
    actual Structured Streaming query (AvailableNow trigger, complete
    mode, memory sink) and returned as the finalized batch result.
    Oracle: DuckDB time_bucket — both align windows to the epoch."""
    from duckdb_pst_spark.streaming.finalize import finalize_complete

    # file-stream sources need a directory; stage the single parquet file
    staging = str(_CACHE_DIR / f"dps_events_{uuid.uuid4().hex[:8]}")
    os.makedirs(staging, exist_ok=True)
    shutil.copy(os.path.join(sf_dir, "events.parquet"), os.path.join(staging, "part-0.parquet"))
    result = finalize_complete(streaming_window_counts(spark, staging), "stream_counts")
    shutil.rmtree(staging, ignore_errors=True)
    return result


@query(
    "q_stream_stream_join",
    oracle="""
    SELECT a.event_id AS view_id, b.event_id AS click_id,
           a.user_id AS user_id
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
    WHERE a.event_type = 'view' AND b.event_type = 'click'
    """,
    tags=("streaming", "join"),
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: each 'view' event joined to the same
    user's 'click' events arriving within the next hour — the funnel /
    attribution join, run as an actual two-stream Structured Streaming
    inner join (append mode, AvailableNow replay).

    Scale design: the join keys on user_id, so both streams shuffle once
    per micro-batch to co-locate users; per-key state holds only rows
    inside the hour bound. A continuous run adds ``withWatermark`` on
    both sides so Spark provably drops state older than the interval
    (event time here is TIMESTAMP_NTZ from the nanos shim, where Spark
    can't watermark — bounded replay needs no watermark; a live cluster
    deployment would ingest event time as TIMESTAMP(LTZ) and watermark
    both streams). Inner-join output is append-safe: rows emit exactly
    once when matched, so the bounded replay equals the batch answer."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    staging = str(_CACHE_DIR / f"dps_events_{uuid.uuid4().hex[:8]}")
    os.makedirs(staging, exist_ok=True)
    shutil.copy(os.path.join(sf_dir, "events.parquet"), os.path.join(staging, "part-0.parquet"))

    def one_stream(alias_id: str, etype: str, ts_name: str, with_user: str):
        schema = spark.read.parquet(staging).schema
        s = spark.readStream.schema(schema).parquet(staging)
        if dict(s.dtypes)["ts"] == "bigint":
            s = s.withColumn(
                "ts",
                F.expr(
                    "TIMESTAMP_NTZ '1970-01-01 00:00:00' + "
                    "make_dt_interval(0, 0, 0, CAST(ts div 1000 AS DECIMAL(20,0)) / 1000000)"
                ),
            )
        return s.filter(F.col("event_type") == etype).select(
            F.col("event_id").alias(alias_id),
            F.col("user_id").alias(with_user),
            F.col("ts").alias(ts_name),
        )

    views = one_stream("view_id", "view", "view_ts", "user_id")
    clicks = one_stream("click_id", "click", "click_ts", "c_user_id")
    joined = views.join(
        clicks,
        F.expr(
            "user_id = c_user_id AND "
            "click_ts >= view_ts AND click_ts <= view_ts + INTERVAL 1 HOUR"
        ),
    ).select("view_id", "click_id", "user_id")

    from duckdb_pst_spark.streaming.finalize import finalize_append

    result = finalize_append(joined, "stream_join")
    shutil.rmtree(staging, ignore_errors=True)
    return result


@query(
    "q_stream_closed_windows",
    oracle="""
    SELECT window_start, event_type, cnt FROM (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ) g, (
      SELECT date_trunc('milliseconds', max(ts)) - INTERVAL 30 MINUTE AS w
      FROM events
    ) wm
    WHERE g.window_start + INTERVAL 1 HOUR <= wm.w
    """,
    tags=("streaming",),
)
def q_stream_closed_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPEND-mode windowed counts under a 30-minute watermark: emits
    exactly the windows the final watermark has CLOSED; still-open
    windows (within the delay of the stream's max event time) are
    withheld in state — the exactly-once emission contract a downstream
    consumer of finalized aggregates relies on.

    The oracle encodes Spark's empirically pinned semantics
    (tests/test_streaming_watermark.py): the late-input filter runs
    against the watermark each batch was PLANNED with — single-file
    staging puts all data in batch 0 (planned watermark 0), so nothing
    can be dropped and counts are complete; the trailing no-data batch
    then closes windows against the final watermark, which is the
    millisecond-TRUNCATED max event time minus the delay, inclusive
    (window_end <= watermark emits).

    Event time is TIMESTAMP_NTZ (Spark cannot watermark it); the bridge
    to a watermarkable TIMESTAMP is numeric — NTZ -> epoch micros
    (timestampdiff from the NTZ epoch) -> timestamp_micros — and back,
    so no session-timezone cast ever touches the data: result identical
    under any driver timezone, DST irrelevant by construction.

    Scale: identical plan to a continuous deployment — one shuffle per
    micro-batch keyed (window, type) with map-side partial aggregation,
    state bounded by the watermark horizon."""
    from duckdb_pst_spark.streaming.finalize import finalize_append

    staging = str(_CACHE_DIR / f"dps_events_{uuid.uuid4().hex[:8]}")
    os.makedirs(staging, exist_ok=True)
    shutil.copy(os.path.join(sf_dir, "events.parquet"), os.path.join(staging, "part-0.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(staging).schema
    stream = spark.readStream.schema(schema).parquet(staging)
    if dict(stream.dtypes)["ts"] == "bigint":
        # nanos-as-long testdata: rebuild microsecond NTZ first (tables._events)
        stream = stream.withColumn(
            "ts",
            F.expr(
                "TIMESTAMP_NTZ '1970-01-01 00:00:00' + "
                "make_dt_interval(0, 0, 0, CAST(ts div 1000 AS DECIMAL(20,0)) / 1000000)"
            ),
        )
    stream = stream.withColumn(
        "ltz",
        F.expr(
            "timestamp_micros(timestampdiff(MICROSECOND,"
            " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts))"
        ),
    ).withWatermark("ltz", "30 minutes")
    back_to_ntz = (
        "TIMESTAMP_NTZ '1970-01-01 00:00:00' + make_dt_interval(0, 0, 0,"
        " CAST(unix_micros(w.start) AS DECIMAL(20,0)) / 1000000)"
    )
    agg = (
        stream.groupBy(F.window("ltz", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select(F.expr(back_to_ntz).alias("window_start"), "event_type", "cnt")
    )
    result = finalize_append(agg, "stream_closed")
    shutil.rmtree(staging, ignore_errors=True)
    return result


@query(
    "q_stream_topk",
    oracle="""
    WITH wc AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
             event_type, COUNT(*) AS cnt
      FROM events GROUP BY 1, 2
    )
    SELECT window_start, event_type, cnt, rn FROM (
      SELECT *, CAST(row_number() OVER (
               PARTITION BY window_start
               ORDER BY cnt DESC, event_type ASC) AS BIGINT) AS rn
      FROM wc
    ) t WHERE rn <= 3
    """,
    tags=("streaming", "topn"),
)
def q_stream_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming top-k: the 3 most frequent event types per tumbling
    hour, continuously maintained. Streaming aggregations cannot feed a
    window rank natively (no chained stateful ops), so the rank runs in
    ``foreachBatch`` — each micro-batch hands its full aggregate state
    to plain batch Catalyst, the top-3 per window is computed there, and
    the sink is overwritten exactly-once. This is THE production idiom
    for "streaming leaderboard" shapes (trending topics, hot keys, top
    error codes) and the pattern that unlocks every batch-only operator
    for streaming pipelines.

    Scale: the streaming agg shuffles once per micro-batch (map-side
    partial counts); the foreachBatch rank shuffles only the aggregate
    state — |windows|·|event types| rows, not events. State store growth
    is bounded by watermarking in a continuous (LTZ event-time) run."""
    from duckdb_pst_spark.streaming.finalize import finalize_complete
    from pyspark.sql import Window

    staging = str(_CACHE_DIR / f"dps_events_{uuid.uuid4().hex[:8]}")
    os.makedirs(staging, exist_ok=True)
    shutil.copy(os.path.join(sf_dir, "events.parquet"), os.path.join(staging, "part-0.parquet"))

    def top3(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("window_start").orderBy(
            F.desc("cnt"), F.asc("event_type")
        )
        return df.withColumn("rn", F.row_number().over(w).cast("long")).filter(
            F.col("rn") <= 3
        )

    result = finalize_complete(
        streaming_window_counts(spark, staging), "stream_topk", transform=top3
    )
    shutil.rmtree(staging, ignore_errors=True)
    return result


@query(
    "q_stream_cdc_merge",
    oracle="""
    SELECT user_id, last_event_id, last_ts, last_value_c
    FROM (
      SELECT user_id,
             event_id AS last_event_id,
             ts AS last_ts,
             CAST(FLOOR(value * 100) AS BIGINT) AS last_value_c,
             event_type,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) t
    WHERE rn = 1 AND event_type <> 'error'
    """,
    tags=("streaming", "cdc"),
)
def q_stream_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC merge — the Delta-style continuously-materialized
    upsert table: the change stream arrives in REAL micro-batches
    (maxFilesPerTrigger=1 over a 3-file staging dir), and foreachBatch
    merges each batch into the persisted current-state table (newest
    change per key wins on (ts, event_id); tombstones are KEPT in state
    so an out-of-order older row can never resurrect a deleted key, and
    filtered only at read time). The oracle is q_cdc_apply's batch
    compaction verbatim — the incremental materialization must converge
    to exactly the batch answer regardless of how changes were batched,
    which holds because per-key max(ts, event_id) is associative.

    Scale shape: each merge shuffles state ∪ batch on the primary key
    once (state stays compacted at one row per key, so the merge input
    is |keys| + |batch|, never the full history); the state table writes
    through executors and is only ever scanned lazily. On a real lake
    this foreachBatch body IS the MERGE INTO a table format runs
    (q_merge_upsert's plan) with the file swap handled by the format's
    transaction log instead of a directory rename."""
    import os as _os

    from pyspark.sql import Window
    from duckdb_pst_spark.functions.portable import scaled_long

    run = uuid.uuid4().hex[:8]
    # suffixes match finalize._prune_stale so old runs get swept
    staging = str(_CACHE_DIR / f"cdcm_stage_{run}_ck")
    state = str(_CACHE_DIR / f"cdcm_state_{run}_out")
    tmp = str(_CACHE_DIR / f"cdcm_tmp_{run}_ck")
    ck = str(_CACHE_DIR / f"cdcm_{run}_ck")
    # stage the change log as 3 files → 3 genuine micro-batches
    table(spark, sf_dir, "events").repartition(3).write.mode("overwrite").parquet(staging)
    schema = spark.read.parquet(staging).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(staging)
    cols = ["user_id", "event_id", "event_type", "ts", "value"]

    def merge_batch(batch: DataFrame, _bid: int) -> None:
        b = batch.select(*cols)
        if _os.path.isdir(state):
            prev = spark.read.schema(b.schema).parquet(state)
            allr = prev.unionByName(b)
        else:
            allr = b
        w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
        new_state = (
            allr.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        new_state.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(state, ignore_errors=True)
        _os.rename(tmp, state)

    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(staging, ignore_errors=True)
    final_schema = spark.read.parquet(state).schema
    return (
        spark.read.schema(final_schema)
        .parquet(state)
        .filter(F.col("event_type") != "error")
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("ts").alias("last_ts"),
            scaled_long(F.col("value")).alias("last_value_c"),
        )
    )


@query(
    "q_stream_sessions_native",
    oracle="""
    SELECT user_id, session_start, CAST(n_events AS BIGINT) AS n_events
    FROM (
      SELECT user_id, min(ts) AS session_start, count(*) AS n_events
      FROM (
        SELECT user_id, ts,
               CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
        FROM (
          SELECT event_id, user_id, ts,
                 CASE WHEN prev_ts IS NULL
                           OR ts >= prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
          FROM (
            SELECT event_id, user_id, ts,
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
            FROM events
          ) a
        ) b
      ) c
      GROUP BY user_id, sid
    ) d
    """,
    tags=("streaming", "session"),
)
def q_stream_sessions_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` sessionization — Spark's built-in
    merging-session-state operator beside the repo's two other session
    variants (q_sessionize: batch lag/cumsum; q_stream_stateful_sessions:
    custom applyInPandasWithState), completing the API family. Each
    event opens a [ts, ts+30min) range; overlapping ranges merge, so an
    event at EXACTLY prev+30min starts a NEW session — a half-open
    boundary one notch tighter than the batch q_sessionize's closed
    rule, which the oracle pins with `>=` (the two operators disagree
    on exact-boundary events by design, and the oracles encode which).

    Scale: session_window keeps per-key merging state in the state
    store, bounded by watermark in a continuous run; the bounded
    replay here (AvailableNow + complete mode) finalizes through the
    parquet round-trip like the other streaming adapters — no
    driver-side collect of the result set."""
    from duckdb_pst_spark.streaming.finalize import finalize_complete

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    staging = str(_CACHE_DIR / f"dps_sess_{uuid.uuid4().hex[:8]}")
    os.makedirs(staging, exist_ok=True)
    shutil.copy(
        os.path.join(sf_dir, "events.parquet"), os.path.join(staging, "part-0.parquet")
    )
    try:
        stream = spark.readStream.schema(schema).parquet(staging)
        if dict(stream.dtypes)["ts"] == "bigint":
            stream = stream.withColumn(
                "ts",
                F.expr(
                    "TIMESTAMP_NTZ '1970-01-01 00:00:00' + "
                    "make_dt_interval(0, 0, 0, CAST(ts div 1000 AS DECIMAL(20,0)) / 1000000)"
                ),
            )
        sess = (
            stream.groupBy(
                F.session_window(F.col("ts"), "30 minutes").alias("w"),
                F.col("user_id"),
            )
            .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
            .select(
                "user_id", F.col("w.start").alias("session_start"), "n_events"
            )
        )
        return finalize_complete(sess, "stream_sessions_native")
    finally:
        shutil.rmtree(staging, ignore_errors=True)


@query(
    "q_stream_late_data",
    oracle="""
    WITH a AS (SELECT * FROM events WHERE event_id % 2 = 0),
    mx AS (SELECT max(ts) AS m FROM a),
    wm1 AS (
      SELECT date_trunc('milliseconds', m) - INTERVAL 30 MINUTE AS w FROM mx
    ),
    b2 AS (
      SELECT b.* FROM events b, mx WHERE b.event_id % 2 = 1 AND b.ts <= mx.m
    ),
    admitted AS (
      SELECT e.ts, e.event_type FROM events e, mx
      WHERE e.event_id % 2 = 0 OR e.ts > mx.m
      UNION ALL
      SELECT b2.ts, b2.event_type FROM b2, wm1
      WHERE time_bucket(INTERVAL '1 hour', b2.ts) + INTERVAL 1 HOUR > wm1.w
    ),
    wm2 AS (
      SELECT date_trunc('milliseconds', max(ts)) - INTERVAL 30 MINUTE AS w FROM events
    ),
    g AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
             CAST(count(*) AS BIGINT) AS cnt
      FROM admitted GROUP BY 1, 2
    )
    SELECT g.window_start, g.event_type, g.cnt
    FROM g, wm2
    WHERE g.window_start + INTERVAL 1 HOUR <= wm2.w
    """,
    tags=("streaming",),
)
def q_stream_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data DROP accounting — the one watermark behavior
    q_stream_closed_windows' single-batch replay cannot exhibit. The
    events table is staged as THREE files with strictly-ordered mtimes
    and replayed under ``maxFilesPerTrigger=1``: A = even event_ids,
    B1 = odd ids with ts AFTER A's max event time, B2 = odd ids at or
    before it. Three files are load-bearing: Spark's late-input filter
    runs one batch BEHIND the planned watermark (batch N filters with
    batch N-1's planned value — pinned by
    tests/test_streaming_watermark.py::test_two_batch_replay_cannot_drop),
    so a two-file replay can never drop anything; batch 2 here is the
    first batch whose filter watermark is nonzero, and it equals
    max(ts over A) ms-truncated minus the 30-minute delay. Every B2 row
    whose 1-hour window that watermark already closed is DROPPED
    (window-end-based, not row-time: a row older than the watermark
    whose window is still open is admitted — also pinned); on an
    id-parity split that is most of B2, which is exactly the point: the
    emitted closed-window counts visibly diverge from the full batch
    answer, and the oracle prices the divergence deterministically
    (admitted = A ∪ B1 ∪ {B2 rows with window_end > wm_A}).

    The drop rule, the filter's one-batch lag, and the
    window_end ≤ final-watermark closure are the empirically pinned
    semantics of tests/test_streaming_watermark.py; event time rides
    the NTZ→LTZ numeric bridge (no session-timezone cast, DST-immune)
    from q_stream_closed_windows.

    Scale: this is the accounting you run BEFORE trusting a continuous
    pipeline's numbers — how much arriving data the chosen delay
    actually discards. Per micro-batch the plan is the production one:
    (window, type)-keyed shuffle with map-side partials, state bounded
    by the watermark horizon."""
    from duckdb_pst_spark.streaming.finalize import finalize_append

    staging = str(_CACHE_DIR / f"dps_events_{uuid.uuid4().hex[:8]}")
    os.makedirs(staging, exist_ok=True)
    try:
        # Scalar threshold (1-row collect): max event time of the even-id
        # file — batch 2's effective filter watermark derives from it.
        # Integer epoch-micros via the NTZ bridge: no tz-dependent casts.
        max_a_us = (
            table(spark, sf_dir, "events")
            .where("event_id % 2 = 0")
            .agg(F.max(F.expr(_TS_US)))
            .collect()[0][0]
        )
        schema = _stage_event_batches(
            spark,
            sf_dir,
            staging,
            [
                F.expr("event_id % 2 = 0"),
                F.expr(f"event_id % 2 = 1 AND {_TS_US} > {max_a_us}"),
                F.expr(f"event_id % 2 = 1 AND {_TS_US} <= {max_a_us}"),
            ],
        )
        stream = _replay_stream(spark, staging, schema)
        back_to_ntz = (
            f"{_NTZ_EPOCH} + make_dt_interval(0, 0, 0,"
            " CAST(unix_micros(w.start) AS DECIMAL(20,0)) / 1000000)"
        )
        agg = (
            stream.groupBy(F.window("ltz", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
            .select(F.expr(back_to_ntz).alias("window_start"), "event_type", "cnt")
        )
        return finalize_append(agg, "stream_late")
    finally:
        shutil.rmtree(staging, ignore_errors=True)


@query(
    "q_stream_dedup_wm",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    tags=("streaming", "dedup"),
)
def q_stream_dedup_wm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup with BOUNDED state —
    ``dropDuplicatesWithinWatermark``, the production form of
    q_stream_dedup: plain ``dropDuplicates`` keeps one state row per key
    forever (a continuous 100 TB/day ingest leaks state without bound),
    while the within-watermark variant evicts a key's state once the
    watermark passes its event time + delay, so steady-state store size
    is O(keys per 30-minute horizon), not O(keys ever seen). The
    contract it trades away: a duplicate arriving AFTER its original's
    state expired is re-emitted — exactly right for at-least-once
    upstream retries, which cluster within seconds of the original.

    Replayed as two event_id-parity files with ordered mtimes
    (maxFilesPerTrigger=1) so cross-batch suppression is exercised. Why
    the DISTINCT oracle is exact here — two pinned facts
    (tests/test_streaming_watermark.py::test_dedup_within_watermark_reemission):
    state CAN evict during batch 1 (batch-0 keys older than the delay
    plus one batch expire en masse on a days-spanning table), but the
    dedup probe runs BEFORE eviction, so a batch-1 duplicate of an
    evicting batch-0 key is still suppressed; and re-emission needs a
    duplicate arriving a batch AFTER its original's eviction — a third
    data batch this two-file staging never has. The late-input filter
    also cannot drop in a two-batch replay (one-batch filter lag). Only
    key columns are output so the surviving-row choice cannot leak
    nondeterminism."""
    from duckdb_pst_spark.streaming.finalize import finalize_append

    staging = str(_CACHE_DIR / f"dps_events_{uuid.uuid4().hex[:8]}")
    os.makedirs(staging, exist_ok=True)
    try:
        schema = _stage_event_batches(
            spark,
            sf_dir,
            staging,
            [F.expr("event_id % 2 = 0"), F.expr("event_id % 2 = 1")],
        )
        deduped = (
            _replay_stream(spark, staging, schema)
            .dropDuplicatesWithinWatermark(["user_id", "event_type"])
            .select("user_id", "event_type")
        )
        return finalize_append(deduped, "stream_dedup_wm")
    finally:
        shutil.rmtree(staging, ignore_errors=True)
