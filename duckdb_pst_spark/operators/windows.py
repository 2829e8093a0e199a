"""Window functions & sessionization over the events stream table.

Beyond the reference's own surface (SURVEY.md §2.D notes it has no window
functions) — these are the north-star additions from §2.B and the
building blocks of a training-data pipeline (per-user ordering, session
segmentation).

Parity rules: window frames are spelled out explicitly (ROWS BETWEEN …)
because engines disagree on the default frame; order keys always include
the unique ``event_id`` tiebreak so every frame is deterministic; running
sums of doubles go through floor-scaled BIGINTs (functions/portable.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_pst_spark.registry import query
from duckdb_pst_spark.tables import table

_BY_USER_TIME = ["ts", "event_id"]


@query(
    "q_window_rank",
    oracle="""
    SELECT event_id, user_id, ts, rn FROM (
      SELECT event_id, user_id, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ) t WHERE rn <= 3
    """,
    tags=("window",),
    bench=True,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number per user — "first 3 events per user". One hash
    shuffle on user_id; per-partition sort. At scale, skewed users are
    handled by AQE; rank-then-filter also admits a partial top-k pushdown
    (each map task can pre-trim to 3 per user)."""
    w = Window.partitionBy("user_id").orderBy(*_BY_USER_TIME)
    e = table(spark, sf_dir, "events")
    return (
        e.select("event_id", "user_id", "ts", F.row_number().over(w).cast("long").alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@query(
    "q_window_lag",
    oracle="""
    SELECT event_id, user_id, event_type,
           LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
    FROM events
    """,
    tags=("window",),
)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() — previous event type per user (event-transition modeling)."""
    w = Window.partitionBy("user_id").orderBy(*_BY_USER_TIME)
    return table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.lag("event_type").over(w).alias("prev_type")
    )


@query(
    "q_window_running",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_value_u,
           COUNT(*) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_cnt
    FROM events
    """,
    tags=("window",),
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) aggregates per user, explicit ROWS frame."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(*_BY_USER_TIME)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        "user_id",
        F.sum(F.floor(F.col("value") * 1000000).cast("long")).over(w).alias("run_value_u"),
        F.count(F.lit(1)).over(w).alias("run_cnt"),
    )


@query(
    "q_sessionize",
    oracle="""
    SELECT event_id, user_id, ts, session_id FROM (
      SELECT event_id, user_id, ts,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM (
        SELECT event_id, user_id, ts,
               CASE WHEN prev_ts IS NULL
                         OR ts > prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
        FROM (
          SELECT event_id, user_id, ts,
                 LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
          FROM events
        ) a
      ) b
    ) c
    """,
    tags=("window", "session"),
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity gap): lag + flag +
    running sum. The gap test is a pure timestamp comparison
    (prev_ts + INTERVAL < ts) — no float math, so it's engine-exact.
    This is the batch equivalent of Structured Streaming's session
    window (see streaming/events.py)."""
    order_w = Window.partitionBy("user_id").orderBy(*_BY_USER_TIME)
    run_w = order_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e = table(spark, sf_dir, "events")
    flagged = e.select(
        "event_id",
        "user_id",
        "ts",
        F.when(
            F.lag("ts").over(order_w).isNull()
            | (F.col("ts") > F.lag("ts").over(order_w) + F.expr("INTERVAL 30 MINUTE")),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    return flagged.select(
        "event_id", "user_id", "ts", F.sum("is_new").over(run_w).alias("session_id")
    )


@query(
    "q_asof_join",
    oracle="""
    SELECT s.user_id, s.event_id, s.ts,
           p.event_id AS prior_purchase_event, p.ts AS prior_purchase_ts
    FROM (SELECT * FROM events WHERE event_type = 'view') s
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON s.user_id = p.user_id AND s.ts >= p.ts
    """,
    tags=("window", "asof"),
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join — an operator Spark lacks natively (DuckDB has ASOF
    JOIN): each 'view' event picks the most recent prior 'purchase' by
    the same user. Implemented as the union-merge pattern: tag both
    sides, sort within user by time, carry the last purchase forward
    with last_value(ignorenulls) — ONE shuffle on user_id and a single
    sort, versus a range-join explosion. This is the scale shape: at
    100 TB the shuffle is on the join key only, and AQE handles user
    skew."""
    e = table(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "event_id", "ts", F.lit(1).alias("is_left")
    )
    buys = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", F.lit(0).alias("is_left")
    )
    tagged = views.unionByName(buys)
    # order purchases before views at identical ts (s.ts >= p.ts)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("is_left"), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.select(
        "user_id",
        "event_id",
        "ts",
        "is_left",
        F.last(F.when(F.col("is_left") == 0, F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("prior_purchase_event"),
        F.last(F.when(F.col("is_left") == 0, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("prior_purchase_ts"),
    )
    return carried.filter(F.col("is_left") == 1).select(
        "user_id", "event_id", "ts", "prior_purchase_event", "prior_purchase_ts"
    )


@query(
    "q_window_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS spend_30d_c
    FROM orders
    """,
    tags=("window", "frame"),
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time — trailing 30-day spend per customer.
    A RANGE frame bounds by ORDER-BY *value* distance, not row count, so
    ties and gaps are handled identically on both engines. One shuffle
    on the partition key; frame evaluation is a per-partition sorted
    sweep (state = one sliding aggregate per partition)."""
    import uuid as _uuid

    ov = f"wrange_o_{_uuid.uuid4().hex[:8]}"
    table(spark, sf_dir, "orders").createOrReplaceTempView(ov)
    return spark.sql(
        f"""
        SELECT o_custkey, o_orderkey, o_orderdate,
               SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
               ) AS spend_30d_c
        FROM {ov}
        """
    )


@query(
    "q_latest_per_key",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders) t
    WHERE rn = 1
    """,
    tags=("window", "dedup"),
)
def q_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest row per key (the QUALIFY rn = 1 idiom) — how a pipeline
    keeps the newest version of each document/record. One shuffle on the
    partition key; row_number + filter prunes inside the sorted
    partition, so only one row per key survives the exchange stage.
    Deterministic via the orderkey tiebreak."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    )
    return (
        table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_orderdate")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "q_window_ntiles",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           NTILE(4) OVER w AS tile,
           PERCENT_RANK() OVER w AS pr,
           CUME_DIST() OVER w AS cd
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
    tags=("window",),
)
def q_window_ntiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions — quartile bucket (ntile),
    percent_rank, cume_dist per order-status partition. All three share
    ONE window spec → one shuffle + one sort serves all of them.
    Cross-engine exactness: both engines compute pr=(rank-1)/(n-1) and
    cd=peers/n as a single IEEE division of exact integers, so the
    doubles are bit-identical; ntile is made deterministic under
    o_totalprice ties by the o_orderkey tiebreak."""
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.ntile(4).over(w).cast("long").alias("tile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


@query(
    "q_time_bucket",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS bucket, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT) AS sum_value_m
    FROM events
    GROUP BY date_trunc('day', ts), event_type
    """,
    tags=("window", "timeseries"),
)
def q_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucket rollup (the hypertable/continuous-aggregate idiom):
    day buckets × event_type with counts and floor-scaled value sums.
    The bucket is a DATE extracted from TIMESTAMP_NTZ — pure field
    extraction, no zone math (Spark's date_trunc would route the NTZ
    value through the session timezone, shifting bucket edges under a
    non-UTC session); the aggregate partial-combines map-side
    and shuffles one row per (day, type) per task. At 100 TB this is
    the query that motivates partitioning the events lake by day:
    the groupBy then reads pre-clustered data and the rollup becomes
    an almost-local aggregation."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.to_date(F.col("ts")).alias("bucket"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 1000).cast("long")).alias("sum_value_m"),
        )
    )


@query(
    "q_gapfill_locf",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS bucket,
             COUNT(*) AS n, CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT) AS s
      FROM events WHERE value > 190
      GROUP BY 1, 2
    ), bounds AS (
      SELECT min(bucket) AS mn, max(bucket) AS mx FROM daily
    ), grid AS (
      SELECT t.event_type, g.bucket
      FROM (SELECT DISTINCT event_type FROM daily) t
      CROSS JOIN (SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS bucket
                  FROM bounds) g
    )
    SELECT g.event_type, CAST(g.bucket AS DATE) AS bucket,
           CAST(COALESCE(d.n, 0) AS BIGINT) AS n_events,
           last_value(d.s IGNORE NULLS) OVER (
             PARTITION BY g.event_type ORDER BY g.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_sum_m
    FROM grid g
    LEFT JOIN daily d ON d.event_type = g.event_type AND d.bucket = g.bucket
    """,
    tags=("window", "timeseries"),
    bench=True,
)
def q_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling (the hypertable ``time_bucket_gapfill``
    idiom): high-severity daily rollups re-gridded onto the full
    per-type day range, counts zero-filled, the value sum carried
    forward (LOCF — ``last(col, ignorenulls)`` over an ordered window;
    days before the first observation stay NULL).

    Scale design: the grid is dimensions only — distinct types cross a
    generated day sequence, both broadcast-small however big the fact
    table is; the expensive side is the one partial-aggregated rollup
    shuffle. The LOCF window partitions by series key, so fills
    parallelize across keys; a 100 TB deployment gap-fills millions of
    series keys with per-key partitions, never a global sort."""
    e = table(spark, sf_dir, "events").filter(F.col("value") > 190)
    daily = e.groupBy(
        "event_type", F.to_date(F.col("ts")).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("value") * 1000).cast("long")).alias("s"),
    )
    bounds = daily.agg(F.min("bucket").alias("mn"), F.max("bucket").alias("mx"))
    types = daily.select("event_type").distinct()
    grid = (
        types.crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence(F.col("mn"), F.col("mx"), F.expr("INTERVAL 1 DAY"))
            ).alias("bucket"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(daily, ["event_type", "bucket"], "left")
        .select(
            "event_type",
            "bucket",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
            F.last("s", ignorenulls=True).over(w).alias("locf_sum_m"),
        )
    )


@query(
    "q_window_count_distinct",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(is_first) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS distinct_types
    FROM (
      SELECT event_id, user_id, ts,
             CASE WHEN ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1
               THEN 1 ELSE 0 END AS is_first
      FROM events
    ) t
    """,
    tags=("window",),
)
def q_window_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) per key — how many distinct event types
    each user has produced up to each event (breadth-of-engagement /
    feature-coverage metric). Window aggregates don't take DISTINCT in
    Spark, and a collect_set-over-window holds the whole set per row; the
    portable (and cheaper) form is first-occurrence flags (rn=1 over
    (user, type)) running-summed over (user) — flag state is O(1) per
    row instead of the O(|types|) set a collect_set frame would hold.

    Scale: two exchanges ((user,type) then (user)), both keyed by real
    bounded keys — no global ordering anywhere, and the second shuffle
    carries only (ids, flag). Deterministic via the event_id tiebreak."""
    e = table(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy(*_BY_USER_TIME)
    w_run = (
        Window.partitionBy("user_id")
        .orderBy(*_BY_USER_TIME)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        e.select(
            "event_id",
            "user_id",
            "ts",
            F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias("is_first"),
        )
        .select(
            "event_id",
            "user_id",
            F.sum("is_first").over(w_run).cast("long").alias("distinct_types"),
        )
    )


@query(
    "q_anomaly_zscore",
    oracle="""
    WITH v AS (
      SELECT event_id, user_id, event_type,
             CAST(FLOOR(value * 100) AS BIGINT) AS value_c
      FROM events
    ),
    stats AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(value_c) AS BIGINT) AS s,
             CAST(SUM(value_c * value_c) AS BIGINT) AS q
      FROM v GROUP BY event_type
    )
    SELECT v.event_id, v.user_id, v.event_type, v.value_c
    FROM v JOIN stats st ON st.event_type = v.event_type
    WHERE CAST(st.n * v.value_c - st.s AS DOUBLE)
            * CAST(st.n * v.value_c - st.s AS DOUBLE)
          > 9.0 * CAST(st.n AS DOUBLE)
            * (CAST(st.n AS DOUBLE) * CAST(st.q AS DOUBLE)
               - CAST(st.s AS DOUBLE) * CAST(st.s AS DOUBLE)) / CAST(st.n AS DOUBLE)
    """,
    tags=("window", "pipeline"),
)
def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier flagging: events whose value sits more
    than 3σ from their event-type mean — the metric-anomaly gate in a
    data-quality pipeline. The test |x−μ| > 3σ is evaluated as
    (n·x−S)² > 9·n·(n·Q−S²)/n on EXACT integer aggregates
    (S=Σx, Q=Σx² over centi-scaled values, all < 2^53), so the double
    comparison is computed from identical integers with the identical
    op sequence on both engines — portable without ever materializing
    a float mean or stddev (unordered double sums are not reproducible;
    the integer sums are).

    Scale: one groupBy shuffle for the 5-row stats table, broadcast
    back onto the stream — the scan-side filter is codegen'd arithmetic.
    """
    from duckdb_pst_spark.functions.portable import scaled_long

    e = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", scaled_long(F.col("value")).alias("value_c")
    )
    stats = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("value_c").alias("s"),
        F.sum(F.col("value_c") * F.col("value_c")).alias("q"),
    )
    j = e.join(F.broadcast(stats), "event_type")
    dev = (F.col("n") * F.col("value_c") - F.col("s")).cast("double")
    nd = F.col("n").cast("double")
    var_term = nd * F.col("q").cast("double") - F.col("s").cast("double") * F.col("s").cast("double")
    return j.where(dev * dev > F.lit(9.0) * nd * var_term / nd).select(
        "event_id", "user_id", "event_type", "value_c"
    )


@query(
    "q_events_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON s1.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s2 ON s2.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY e.user_id
    )
    SELECT s1.user_id, s1.t1, s2.t2, s3.t3,
           CAST(CASE WHEN s3.t3 IS NOT NULL THEN 3
                     WHEN s2.t2 IS NOT NULL THEN 2
                     ELSE 1 END AS BIGINT) AS stage
    FROM s1
    LEFT JOIN s2 ON s2.user_id = s1.user_id
    LEFT JOIN s3 ON s3.user_id = s1.user_id
    """,
    tags=("window", "events"),
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: signup → first click AFTER the signup → first
    purchase AFTER that click, per user — conversion analysis where
    order matters (a purchase before the signup must not count). Each
    stage is "earliest qualifying event after the previous stage's
    time", so the result is deterministic (MIN of a value set) without
    any row-order assumption.

    Scale: three aggregate+join rounds, ALL keyed on user_id — one
    logical partitioning reused; each round's build side shrinks
    (funnels only narrow), and stage inputs are type-filtered at the
    scan. The sessionization-free formulation avoids any per-user
    event sort: at 100 TB this is 3 skinny hash aggregates, not a
    window over the raw stream. Event time stays TIMESTAMP_NTZ."""
    e = table(spark, sf_dir, "events")
    s1 = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    stage = (
        F.when(F.col("t3").isNotNull(), 3)
        .when(F.col("t2").isNotNull(), 2)
        .otherwise(1)
        .cast("long")
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select("user_id", "t1", "t2", "t3", stage.alias("stage"))
    )


@query(
    "q_retention_cohorts",
    oracle="""
    WITH first_day AS (
      SELECT user_id, CAST(MIN(date_trunc('day', ts)) AS DATE) AS cohort
      FROM events GROUP BY user_id
    )
    SELECT f.cohort,
           CAST(date_diff('day', f.cohort, CAST(date_trunc('day', e.ts) AS DATE)) // 7
                AS BIGINT) AS week_k,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS active_users
    FROM events e JOIN first_day f ON f.user_id = e.user_id
    GROUP BY 1, 2
    """,
    tags=("window", "events"),
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by their first-activity
    day, counted as active in each subsequent week offset — the
    retention triangle every growth dashboard is built on.

    Scale: one aggregate finds each user's cohort day (hash agg on
    user), one join tags every event with its user's cohort (same key,
    exchange reusable), and the distinct-count shuffles (cohort, week,
    user) — partial-distinct map-side first, so shuffled rows are
    bounded by distinct actives, not events. Day math is calendar
    arithmetic on NTZ dates — no zone shifts."""
    e = table(spark, sf_dir, "events")
    first_day = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort"))
    return (
        e.join(first_day, "user_id")
        .select(
            "cohort",
            (F.datediff(F.to_date("ts"), F.col("cohort")) / 7)
            .cast("int")
            .cast("long")
            .alias("week_k"),
            "user_id",
        )
        .groupBy("cohort", "week_k")
        .agg(F.countDistinct("user_id").cast("long").alias("active_users"))
    )


# ---------------------------------------------------------- CDC / SCD
@query(
    "q_cdc_apply",
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
    tags=("window", "cdc"),
)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC APPLY — materialize current table state from a changelog (the
    MERGE-from-change-stream idiom): each user's newest change wins
    (ts desc, event_id desc tiebreak for same-timestamp changes, i.e.
    log position order); a 'error'-typed final change acts as a DELETE
    tombstone, removing the key from the materialized state entirely.

    Scale: this is the compaction shape every CDC lake pipeline runs —
    ONE shuffle on the primary key, row_number prunes to one row per
    key inside the sorted partition, tombstones drop after the rank (a
    tombstone only deletes if it is the LAST change — filtering earlier
    would resurrect overwritten rows). Values carried as centi-scaled
    BIGINTs for engine-exact comparison."""
    from duckdb_pst_spark.functions.portable import scaled_long

    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        table(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("ts").alias("last_ts"),
            scaled_long(F.col("value")).alias("last_value_c"),
        )
    )


@query(
    "q_scd2_intervals",
    oracle="""
    SELECT user_id, event_id, value_c, valid_from, valid_to,
           CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
    FROM (
      SELECT user_id, event_id,
             CAST(FLOOR(value * 100) AS BIGINT) AS value_c,
             ts AS valid_from,
             LEAD(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
      FROM events
      WHERE event_type = 'purchase'
    ) t
    """,
    tags=("window", "cdc"),
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD TYPE-2 history build — turn a change stream into validity
    intervals: each change row becomes (value, valid_from, valid_to)
    where valid_to is the NEXT change's timestamp (NULL = current
    version). The temporal-table layout every warehouse keeps for
    as-of-date joins; q_asof_join is the read side of this shape.

    Scale: one shuffle on the business key; lead() needs only the
    1-row-lookahead frame, so state per key is O(1) inside the sorted
    partition. Ties on ts are ordered by event_id (log position), so
    interval chaining is deterministic."""
    from duckdb_pst_spark.functions.portable import scaled_long

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    valid_to = F.lead("ts").over(w)
    return (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "event_id",
            scaled_long(F.col("value")).alias("value_c"),
            F.col("ts").alias("valid_from"),
            valid_to.alias("valid_to"),
        )
        .withColumn(
            "is_current",
            F.when(F.col("valid_to").isNull(), 1).otherwise(0).cast("long"),
        )
    )


@query(
    "q_merge_upsert",
    oracle="""
    WITH t AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_c
      FROM orders
    ),
    src AS (
      SELECT o_orderkey, 'U' AS op, o_custkey,
             'M' AS o_orderstatus, (price_c * 11) // 10 AS price_c
      FROM t WHERE o_orderkey % 10 = 3
      UNION ALL
      SELECT o_orderkey, 'D', o_custkey, o_orderstatus, price_c
      FROM t WHERE o_orderkey % 10 = 7
      UNION ALL
      SELECT o_orderkey + 10000000, 'I', o_custkey, 'I', CAST(9999 AS BIGINT)
      FROM t WHERE o_orderkey % 1000 = 1
    )
    SELECT COALESCE(s.o_orderkey, t.o_orderkey) AS o_orderkey,
           COALESCE(s.o_custkey, t.o_custkey) AS o_custkey,
           CASE WHEN s.op IS NULL THEN t.o_orderstatus
                ELSE s.o_orderstatus END AS o_orderstatus,
           CASE WHEN s.op IS NULL THEN t.price_c ELSE s.price_c END AS price_c,
           CASE WHEN s.op IS NULL THEN 'kept'
                WHEN s.op = 'U' THEN 'updated'
                ELSE 'inserted' END AS action
    FROM t FULL OUTER JOIN src s ON s.o_orderkey = t.o_orderkey
    WHERE s.op IS NULL OR s.op <> 'D'
    """,
    tags=("cdc", "merge"),
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO — the lakehouse upsert primitive: apply a batch of
    updates / deletes / inserts to a target table in one statement
    (WHEN MATCHED AND op='D' THEN DELETE / WHEN MATCHED THEN UPDATE /
    WHEN NOT MATCHED THEN INSERT). The change batch is derived
    deterministically from the target itself (10%% of keys updated,
    10%% deleted, a few new keys inserted) so both engines see the same
    MERGE inputs; q_cdc_apply is the changelog-compaction sibling that
    produces such a batch from a raw change stream.

    Scale: the physical MERGE shape is ONE full-outer join on the
    primary key — target and source each shuffle once on the key (or
    the source broadcasts when the change batch is small, the common
    case for incremental loads; Spark picks that automatically under
    AQE when the batch is under the broadcast threshold). The CASE
    projection and the delete filter are scan-local. This is exactly
    the copy-on-write rewrite a Delta/Iceberg MERGE plans — minus the
    file-level pruning a table format's min/max stats would add (the
    range-clustered export in sinks.py is that pruning story).
    Prices carried centi-scaled for engine-exact comparison."""
    from duckdb_pst_spark.functions.portable import scaled_long

    t = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        scaled_long(F.col("o_totalprice")).alias("price_c"),
    )
    upd = t.filter(F.col("o_orderkey") % 10 == 3).select(
        "o_orderkey",
        F.lit("U").alias("op"),
        "o_custkey",
        F.lit("M").alias("o_orderstatus"),
        F.expr("price_c * 11 div 10").alias("price_c"),
    )
    dele = t.filter(F.col("o_orderkey") % 10 == 7).select(
        "o_orderkey", F.lit("D").alias("op"), "o_custkey", "o_orderstatus", "price_c"
    )
    ins = t.filter(F.col("o_orderkey") % 1000 == 1).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        F.lit("I").alias("op"),
        "o_custkey",
        F.lit("I").alias("o_orderstatus"),
        F.lit(9999).cast("long").alias("price_c"),
    )
    src = upd.unionByName(dele).unionByName(ins)
    s = src.select(
        F.col("o_orderkey").alias("s_key"),
        "op",
        F.col("o_custkey").alias("s_custkey"),
        F.col("o_orderstatus").alias("s_status"),
        F.col("price_c").alias("s_price_c"),
    )
    merged = t.join(s, t["o_orderkey"] == s["s_key"], "full_outer")
    return merged.filter(F.col("op").isNull() | (F.col("op") != "D")).select(
        F.coalesce(F.col("s_key"), F.col("o_orderkey")).alias("o_orderkey"),
        F.coalesce(F.col("s_custkey"), F.col("o_custkey")).alias("o_custkey"),
        F.when(F.col("op").isNull(), F.col("o_orderstatus"))
        .otherwise(F.col("s_status"))
        .alias("o_orderstatus"),
        F.when(F.col("op").isNull(), F.col("price_c"))
        .otherwise(F.col("s_price_c"))
        .alias("price_c"),
        F.when(F.col("op").isNull(), F.lit("kept"))
        .when(F.col("op") == "U", F.lit("updated"))
        .otherwise(F.lit("inserted"))
        .alias("action"),
    )


# ----------------------------------------------------- Pareto skyline
_SKY_BUCKETS = 256


@query(
    "q_skyline",
    oracle="""
    WITH c AS (
      SELECT p_partkey, CAST(floor(p_retailprice * 100) AS BIGINT) AS cents,
             CAST(p_size AS BIGINT) AS size FROM part
    )
    SELECT p.p_partkey, p.cents, p.size
    FROM c p
    WHERE NOT EXISTS (
      SELECT 1 FROM c q
      WHERE q.cents <= p.cents AND q.size <= p.size
        AND (q.cents < p.cents OR q.size < p.size)
    )
    """,
    tags=("window", "relational"),
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto skyline (non-dominated set over price × size) — the
    classic preference-query operator [Börzsönyi et al., ICDE'01]: a
    part survives iff nothing is both ≤ on price and ≤ on size with
    one strict. Naively an O(n²) anti-self-join; in one dimension
    sorted it collapses to a prefix-minimum sweep — and the sweep is
    implemented here as a DISTRIBUTED prefix-scan, never a single-task
    global window: rows bucket into 256 equal-width price ranges
    (bucketing is monotone, so lower bucket ⇒ strictly lower price);
    per-bucket minima form a 256-row table whose cumulative min
    broadcasts back; the within-bucket strict-prefix min runs in a
    window PARTITIONED BY bucket (parallel); a row survives iff both
    minima are > its size and it is minimal among equal prices (equal
    price+size pairs never dominate each other, so duplicates all
    survive). The oracle states the same set as the NOT EXISTS
    anti-join — quadratic but fine for an embedded engine at QA scale.

    Scale shape: one 256-group map-side-combined aggregate, one tiny
    broadcast join, and windows whose partitions are price buckets /
    equal-price groups — the distributed-prefix-scan shape that turns
    any ordered sweep (skylines, running minima, gap detection) into
    bounded-partition work at 100 TB."""
    p = table(spark, sf_dir, "part").select(
        "p_partkey",
        F.floor(F.col("p_retailprice") * 100).cast("long").alias("cents"),
        F.col("p_size").cast("long").alias("size"),
    )
    mm = F.broadcast(p.agg(F.min("cents").alias("mn"), F.max("cents").alias("mx")))
    b = p.crossJoin(mm).withColumn(
        "bucket",
        F.expr(f"((cents - mn) * {_SKY_BUCKETS}) div (mx - mn + 1)"),
    )
    per_bucket = b.groupBy("bucket").agg(F.min("size").alias("bmin"))
    wprior = (
        Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    )  # 256 rows — driver-trivial window
    prior = per_bucket.withColumn(
        "prior_min", F.min("bmin").over(wprior)
    ).select("bucket", "prior_min")
    wb = (
        Window.partitionBy("bucket")
        .orderBy("cents")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    wc = Window.partitionBy("cents")
    out = (
        b.join(F.broadcast(prior), "bucket")
        .withColumn("inb_min", F.min("size").over(wb))
        # least() skips NULLs (empty prefix on either level), returning
        # NULL only when BOTH prefixes are empty — the global minimum row
        .withColumn("m1", F.least(F.col("prior_min"), F.col("inb_min")))
        .withColumn("cmin", F.min("size").over(wc))
        .filter(
            (F.col("m1").isNull() | (F.col("m1") > F.col("size")))
            & (F.col("size") == F.col("cmin"))
        )
    )
    return out.select("p_partkey", "cents", "size")


# -------------------------------------------------------- OHLC bars
@query(
    "q_ohlc_bars",
    oracle="""
    WITH v AS (
      SELECT event_type, date_trunc('hour', ts) AS bar,
             ts, event_id,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    r AS (
      SELECT event_type, bar, cents,
             row_number() OVER (PARTITION BY event_type, bar
                                ORDER BY ts ASC, event_id ASC) AS rn_a,
             row_number() OVER (PARTITION BY event_type, bar
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM v
    )
    SELECT event_type, bar,
           CAST(sum(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT) AS open_c,
           max(cents) AS high_c,
           min(cents) AS low_c,
           CAST(sum(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT) AS close_c,
           CAST(count(*) AS BIGINT) AS n
    FROM r
    GROUP BY event_type, bar
    """,
    tags=("window", "timeseries"),
)
def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bars — the canonical hypertable rollup (TimescaleDB's
    first/last + candlestick demo): per event_type × hour, the first
    and last observed value (open/close), the extremes (high/low), and
    the tick count. First/last are made deterministic by the
    (ts, event_id) total order — a bare first()/arg_min on ts alone is
    ambiguous under same-timestamp ticks, which is exactly where
    engines disagree; values floor-scale to integer cents so the bars
    hash-check bit-exactly.

    Scale shape: the two row_number windows and the final aggregate all
    partition by (event_type, bar) — ONE shuffle on the bar key serves
    all three (the windows and the groupBy share partitioning), state
    per group is O(1), and bars parallelize across the full cluster
    like any keyed window. This is the continuous-aggregate shape: at
    100 TB you materialize it incrementally per closed window
    (q_stream_closed_windows is the streaming twin)."""
    v = table(spark, sf_dir, "events").select(
        "event_type",
        # NOT date_trunc: Spark's date_trunc returns TIMESTAMP (LTZ) even
        # for NTZ input, routing the value through the session timezone.
        # Field extraction + make_timestamp_ntz is zone-free on NTZ.
        F.expr(
            "make_timestamp_ntz(year(ts), month(ts), day(ts), hour(ts), 0, 0)"
        ).alias("bar"),
        "ts",
        "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    wa = Window.partitionBy("event_type", "bar").orderBy(
        F.asc("ts"), F.asc("event_id")
    )
    wd = Window.partitionBy("event_type", "bar").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    r = v.withColumn("rn_a", F.row_number().over(wa)).withColumn(
        "rn_d", F.row_number().over(wd)
    )
    return r.groupBy("event_type", "bar").agg(
        F.sum(F.when(F.col("rn_a") == 1, F.col("cents"))).cast("long").alias("open_c"),
        F.max("cents").alias("high_c"),
        F.min("cents").alias("low_c"),
        F.sum(F.when(F.col("rn_d") == 1, F.col("cents"))).cast("long").alias("close_c"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


# ------------------------------------------------- regression aggregate
_REGR_EPOCH = "2024-01-01 00:00:00"  # x origin (events start here)


@query(
    "q_regr_slope",
    oracle=f"""
    WITH v AS (
      SELECT event_type,
             CAST(date_diff('hour', TIMESTAMP '{_REGR_EPOCH}', ts) AS BIGINT) AS x,
             CAST(floor(value * 100) AS BIGINT) AS y
      FROM events
    ),
    s AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
      FROM v GROUP BY event_type
    )
    SELECT event_type, n,
           n * sxy - sx * sy AS num,
           n * sxx - sx * sx AS den,
           CASE WHEN (n * sxx - sx * sx) // 1000000 = 0 THEN NULL
                ELSE (n * sxy - sx * sy) // ((n * sxx - sx * sx) // 1000000) END
             AS slope_u
    FROM s
    """,
    tags=("window", "agg", "timeseries"),
)
def q_regr_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS regression slope (value trend over time, the
    regr_slope aggregate family) — computed EXACTLY in integers from
    the five classical sufficient statistics (n, Σx, Σy, Σxy, Σx²):
    slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²), emitted as exact
    numerator/denominator plus a micro-unit quotient. Native
    regr_slope is float and partition-order-dependent; the sufficient
    statistics are integer sums, so they merge associatively and the
    result is bit-identical on any engine or partitioning. x is hours
    from a fixed NTZ origin via zone-free timestamp difference
    (NEVER unix_timestamp — session-tz-dependent).

    Scale shape: ONE map-side-combined groupBy carrying five BIGINTs
    of state per group — the textbook mergeable aggregate; degenerate
    groups (all x equal → den 0) yield NULL. Integer headroom: with
    x ≤ 10³ and cents ≤ 10⁶, nΣxy stays in BIGINT to n ≈ 10⁹ rows per
    group; beyond that, center x on the group mean with a first pass
    (the standard two-pass stabilization) or widen to DECIMAL."""
    v = table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(
            f"timestampdiff(HOUR, TIMESTAMP_NTZ '{_REGR_EPOCH}', ts)"
        ).cast("long").alias("x"),
        F.floor(F.col("value") * 100).cast("long").alias("y"),
    )
    s = v.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    return s.select(
        "event_type",
        "n",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("den"),
        F.expr(
            "CASE WHEN (n * sxx - sx * sx) div 1000000 = 0 THEN NULL"
            " ELSE (n * sxy - sx * sy) div ((n * sxx - sx * sx) div 1000000) END"
        ).alias("slope_u"),
    )


# --------------------------------------------------- touch attribution
@query(
    "q_attribution_last_touch",
    oracle="""
    WITH tt AS (
      SELECT user_id, ts, arg_max(event_type, event_id) AS t_type
      FROM events WHERE event_type IN ('click', 'view')
      GROUP BY user_id, ts
    ),
    p AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase')
    SELECT attributed, CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM (
      SELECT CASE WHEN t.ts IS NOT NULL AND p.ts - t.ts <= INTERVAL 1 HOUR
                  THEN t.t_type ELSE 'none' END AS attributed,
             p.value
      FROM p ASOF LEFT JOIN tt t
        ON p.user_id = t.user_id AND p.ts >= t.ts
    ) a
    GROUP BY attributed
    """,
    tags=("window", "asof", "pipeline"),
)
def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution — the marketing-analytics workload the
    as-of join exists for: every purchase credited to the user's most
    recent click/view within the 1-hour window, else 'none'; revenue
    rolled up per attributed channel. Determinism where engines would
    otherwise diverge: simultaneous touches collapse to ONE per
    (user, ts) by arg_max on the unique event id BEFORE the as-of
    (both engines make the identical pick), and the equal-timestamp
    rule (a touch at exactly the purchase ts counts) is the `>=` both
    sides implement.

    Plan: same union-merge shape as q_asof_join — one shuffle on
    user_id carries the last touch forward inside a sorted window, no
    range join — then a |channels|-group rollup. The 100 TB story is
    q_asof_join's unchanged."""
    e = table(spark, sf_dir, "events")
    tt = (
        e.filter(F.col("event_type").isin("click", "view"))
        .groupBy("user_id", "ts")
        .agg(
            F.max(F.struct("event_id", "event_type")).getField("event_type").alias(
                "t_type"
            )
        )
        .select("user_id", "ts", "t_type", F.lit(0).alias("is_left"))
        .withColumn("value", F.lit(None).cast("double"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .select(
            "user_id", "ts",
            F.lit(None).cast("string").alias("t_type"),
            F.lit(1).alias("is_left"),
            "value",
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tt.unionByName(p).select(
        "user_id", "ts", "is_left", "value",
        F.last(F.when(F.col("is_left") == 0, F.col("t_type")), ignorenulls=True)
        .over(w)
        .alias("last_type"),
        F.last(F.when(F.col("is_left") == 0, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("last_ts"),
    )
    attributed = carried.filter(F.col("is_left") == 1).select(
        F.when(
            F.col("last_ts").isNotNull()
            & (F.col("ts") <= F.col("last_ts") + F.expr("INTERVAL 1 HOUR")),
            F.col("last_type"),
        )
        .otherwise(F.lit("none"))
        .alias("attributed"),
        "value",
    )
    return attributed.groupBy("attributed").agg(
        F.count(F.lit(1)).cast("long").alias("n_purchases"),
        F.sum(F.floor(F.col("value") * 100).cast("long")).cast("long").alias(
            "revenue_cents"
        ),
    )
