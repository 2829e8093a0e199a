"""Scale-out join strategies — north-star additions (SURVEY.md §2.B).

The reference's only join machinery is DuckDB's generic hash join (e.g.
the late-materialization HASH_JOIN,
/root/reference/test/sql/query_optimizations.test:49-53). These two
operators cover the join shapes that break naive plans at 100 TB:

- **binned range join**: point-in-interval joins have no equi-key, so
  Spark falls back to BroadcastNestedLoopJoin / cartesian — O(N·M).
  Binning both sides onto a common grid restores an equi-key and a hash
  join; the residual range predicate filters within-bin pairs.
- **salted skew join**: when one join key dominates (hot user, hot
  null-bucket), every row for it lands in one task. Salting splits the
  hot key across S tasks by extending the key with a deterministic
  salt on the fact side and replicating the dim side S ways.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_pst_spark.functions.portable import scaled_long
from duckdb_pst_spark.registry import query
from duckdb_pst_spark.tables import table

N_INTERVALS = 30
SALT_BUCKETS = 8


@query(
    "q_range_join",
    oracle=f"""
    WITH iv AS (
      SELECT i AS interval_id,
             TIMESTAMP '2024-01-01 00:00:00' + i * INTERVAL 24 HOUR AS lo,
             TIMESTAMP '2024-01-01 00:00:00' + i * INTERVAL 24 HOUR
               + INTERVAL 36 HOUR AS hi
      FROM generate_series(0, {N_INTERVALS - 1}) AS t(i)
    )
    SELECT iv.interval_id,
           count(*) AS n_events,
           CAST(SUM(CAST(FLOOR(e.value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
    FROM iv JOIN events e ON e.ts >= iv.lo AND e.ts < iv.hi
    GROUP BY iv.interval_id
    """,
    tags=("join", "range"),
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join via bin bucketing.

    30 overlapping 36-hour windows (one starting each midnight of
    2024-01) are joined to every event whose timestamp falls inside
    them. Expressed directly (`ON ts >= lo AND ts < hi`) Spark has no
    equi-key and plans BroadcastNestedLoopJoin — O(N·M) predicate
    evaluations. Instead both sides are mapped onto a 24 h grid: an
    interval spanning [d·24h, d·24h+36h) covers day-bins {d, d+1}
    (exploded, ≤2 rows per interval), an event belongs to exactly one
    bin, and the join becomes a hash join on `bin` with the residual
    range predicate applied within bins only. tests/test_plan_shapes.py
    asserts no nested-loop join survives in the plan.

    Scale shape: bin fan-out is bounded by ceil(interval_len/bin_len)+1
    regardless of data volume; with a huge interval side the same plan
    degrades gracefully to a shuffle hash join on `bin` (and bin
    granularity is the skew knob). Event time is TIMESTAMP_NTZ
    end-to-end so binning is timezone-independent."""
    iv = spark.range(N_INTERVALS).select(
        F.col("id").alias("interval_id"),
        F.expr(
            "TIMESTAMP_NTZ '2024-01-01 00:00:00'"
            " + make_dt_interval(CAST(id AS INT), 0, 0, 0)"
        ).alias("lo"),
        F.expr(
            "TIMESTAMP_NTZ '2024-01-01 00:00:00'"
            " + make_dt_interval(CAST(id AS INT), 36, 0, 0)"
        ).alias("hi"),
    )
    iv_binned = iv.withColumn(
        "bin",
        F.explode(
            F.array(
                F.col("interval_id").cast("int"),
                (F.col("interval_id") + 1).cast("int"),
            )
        ),
    )
    e = table(spark, sf_dir, "events").select(
        "ts",
        scaled_long(F.col("value")).alias("value_c"),
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias(
            "bin"
        ),
    )
    joined = e.join(F.broadcast(iv_binned), "bin").filter(
        (F.col("ts") >= F.col("lo")) & (F.col("ts") < F.col("hi"))
    )
    return joined.groupBy("interval_id").agg(
        F.count("*").alias("n_events"),
        F.sum("value_c").alias("sum_value_c"),
    )


@query(
    "q_skew_join_salted",
    oracle="""
    SELECT c.c_mktsegment,
           count(*) AS n_events,
           CAST(SUM(CAST(FLOOR(e.value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    tags=("join", "skew"),
)
def q_skew_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-dim equi-join executed with key salting.

    events.user_id is a low-cardinality hot key set (~1.5k users for
    100k events at sf0.1 — each key's rows would hash to one task in a
    plain shuffle join). The fact side extends the key with a
    deterministic salt pmod(xxhash64(event_id), S); the dim side is
    replicated S ways with an exploded salt column; the join key
    becomes (user_id, salt) so each hot key spreads over S tasks. The
    salt never escapes the join — results aggregate to exactly the
    plain-join answer, which is what the oracle runs.

    Scale notes: salting is the manual fallback when (a) the dim is too
    big to broadcast and (b) single keys are hot enough to blow a task
    even after AQE's skew-split (AQE splits oversized *partitions*, but
    cannot split one key without this rewrite). S multiplies the dim
    shuffle volume — keep the replicated side the small one. The
    shuffle_hash hint forces the shuffle path so the salted shape is
    actually exercised at test scale (Catalyst would otherwise
    broadcast the tiny test dim and the salt would be a no-op)."""
    e = table(spark, sf_dir, "events").select(
        "user_id",
        scaled_long(F.col("value")).alias("value_c"),
        F.pmod(F.xxhash64("event_id"), F.lit(SALT_BUCKETS)).cast("int").alias("salt"),
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment").withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(SALT_BUCKETS)]))
    )
    joined = e.join(
        c.hint("shuffle_hash"),
        (e.user_id == c.c_custkey) & (e.salt == c.salt),
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        F.sum("value_c").alias("sum_value_c"),
    )
