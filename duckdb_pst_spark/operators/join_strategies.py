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


# ------------------------------------------------- bloom-pruned semi-join
BLOOM_BITS = 1 << 15  # m bits (512 int64 words)
BLOOM_WORDS = BLOOM_BITS // 64
BLOOM_HASHES = 3  # k


def _bloom_positions(key, j: int):
    """j-th bloom bit position for a key: pmod(xxhash64(j, key), m)."""
    return F.pmod(F.xxhash64(F.lit(j), key), F.lit(BLOOM_BITS))


@query(
    "q_bloom_prune",
    oracle="""
    SELECT o.o_orderpriority,
           count(*) AS n_orders,
           CAST(SUM(CAST(FLOOR(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS sum_price_c
    FROM orders o
    WHERE o.o_custkey IN (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    GROUP BY o.o_orderpriority
    """,
    tags=("join", "bloom"),
)
def q_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join with an explicit bloom runtime filter: the filtered dim
    keys (BUILDING customers) are folded into a {32}-Kbit / k={3} bloom
    bitmap, the bitmap is broadcast as a literal, and the fact side
    (orders) is PRE-FILTERED by a codegen'd bit test before the shuffle
    semi-join that removes the bloom's false positives. The result is
    exactly the plain semi-join (bloom has no false negatives) — the
    oracle runs the plain IN.

    Scale design: this is the shape for a dim that is too big to
    BROADCAST as rows but whose key set compresses into a few MB of
    bloom bits — ~80% of fact rows (the non-BUILDING 4/5) never enter
    the shuffle, so shuffled bytes shrink proportionally while the plan
    stays a hash semi-join (shuffle_hash hint keeps the test-scale plan
    honest; Catalyst would broadcast the tiny test dim). The bitmap is
    built DISTRIBUTED (bit positions → word groupBy → bit_or) and only
    the 512 finished words are collected — the same build Spark's own
    InjectRuntimeFilter does for `spark.sql.optimizer.runtime.
    bloomFilter`; here it is explicit so the pruning is visible,
    testable, and available to sources Catalyst will not inject into.
    False-positive rate at the test dim (~300 keys) is ≈1e-4; m is the
    knob to hold that at bigger dims.
    """
    dim = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    # distributed bitmap build: k positions per key -> word -> OR of masks
    pos = dim.select(
        F.explode(
            F.array(*[_bloom_positions(F.col("c_custkey"), j) for j in range(BLOOM_HASHES)])
        ).alias("pos")
    )
    words_df = (
        pos.selectExpr(
            "CAST(pos / 64 AS BIGINT) AS w",
            "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT)) AS m",
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("mask"))
    )
    words = [0] * BLOOM_WORDS
    for r in words_df.collect():  # <= 512 rows: the runtime-filter build job
        words[int(r["w"])] = int(r["mask"])
    bitmap = F.array(*[F.lit(v).cast("long") for v in words])

    o = table(spark, sf_dir, "orders").withColumns(
        {f"_bp{j}": _bloom_positions(F.col("o_custkey"), j) for j in range(BLOOM_HASHES)}
    )
    bloom_hit = None
    for j in range(BLOOM_HASHES):
        word = F.element_at(bitmap, (F.col(f"_bp{j}") / 64).cast("int") + 1)
        mask = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(_bp{j} % 64 AS INT))")
        t = word.bitwiseAND(mask) != 0
        bloom_hit = t if bloom_hit is None else (bloom_hit & t)

    pruned = o.where(bloom_hit).drop(*[f"_bp{j}" for j in range(BLOOM_HASHES)])
    exact = pruned.join(
        dim.hint("shuffle_hash"),
        pruned.o_custkey == dim.c_custkey,
        "left_semi",
    )
    return exact.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(scaled_long(F.col("o_totalprice"))).alias("sum_price_c"),
    )


# ------------------------------------------------------ fuzzy blocking
FUZZY_BLOCK_LEN = 15  # 'Customer#000001' — blocks by id-prefix
FUZZY_MAX_DIST = 1


@query(
    "q_fuzzy_blocking",
    oracle=f"""
    WITH b AS (
      SELECT c_custkey, c_name, substring(c_name, 1, {FUZZY_BLOCK_LEN}) AS blk
      FROM customer
    )
    SELECT a.c_custkey AS key_a, c.c_custkey AS key_b,
           CAST(levenshtein(a.c_name, c.c_name) AS BIGINT) AS dist
    FROM b a JOIN b c ON c.blk = a.blk AND c.c_custkey > a.c_custkey
    WHERE levenshtein(a.c_name, c.c_name) <= {FUZZY_MAX_DIST}
    """,
    tags=("join", "dedup"),
)
def q_fuzzy_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage by blocking + edit distance — the entity-resolution
    primitive (find records that are *nearly* the same entity): records
    join only within a cheap blocking key (here the name's id prefix),
    and the expensive Levenshtein verify runs on within-block pairs
    only. Both engines implement classic unit-cost Levenshtein, so the
    integer distances hash-check exactly.

    Scale shape: the self-join is an equi-join on the block key — the
    all-pairs n² never exists, exactly like the LSH band join in
    q_dedup_minhash (blocking IS the string-world LSH). Block size is
    the skew knob: an over-full block (too-generic key) is AQE's
    skew-join case first and a salting candidate second; production
    blocking composes several keys (prefix, length, phonetic code) and
    unions the candidate sets, each a bounded equi-join."""
    b = table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        F.substring("c_name", 1, FUZZY_BLOCK_LEN).alias("blk"),
    )
    a = b.select(
        F.col("blk"), F.col("c_custkey").alias("key_a"), F.col("c_name").alias("name_a")
    )
    c = b.select(
        F.col("blk"), F.col("c_custkey").alias("key_b"), F.col("c_name").alias("name_b")
    )
    return (
        a.join(c, "blk")
        .filter(F.col("key_b") > F.col("key_a"))
        .select(
            "key_a",
            "key_b",
            F.levenshtein("name_a", "name_b").cast("long").alias("dist"),
        )
        .filter(F.col("dist") <= FUZZY_MAX_DIST)
    )


# ------------------------------------------------- join-key skew audit
@query(
    "q_join_key_skew",
    oracle="""
    WITH k AS (
      SELECT l_orderkey AS key, CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY l_orderkey
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS total, max(n) AS mx FROM k)
    SELECT CAST(floor(log2(n)) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(n) AS BIGINT) AS n_rows,
           CAST(max(n) AS BIGINT) AS max_rows,
           CAST(1000000 * max(n) // any_value(total) AS BIGINT)
             AS max_key_share_ppm
    FROM k CROSS JOIN tot
    GROUP BY bucket ORDER BY bucket
    """,
    tags=("join", "quality"),
)
def q_join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key multiplicity audit — the table read BEFORE choosing a
    join strategy at 100 TB: the log2 histogram of per-key row counts
    on the fact join key (l_orderkey) says whether the shuffle will be
    balanced (flat head) or needs salting / AQE skew splitting (a
    bucket whose max_rows dwarfs the rest), and max_key_share_ppm is
    the single-task worst case as a fraction of the table (the number
    AQE's skewedPartitionFactor reasons about). The same audit shape
    as q_degree_distribution, pointed at a JOIN key instead of a graph
    — together with q_minhash_band_stats these are the pre-flight
    tuning tables a production run publishes first.

    Scale shape: one (key) map-side-combined count aggregate — the
    identical exchange the audited join itself would pay, so the audit
    prices what will run; then a ≤64-group rollup crossed with a
    1-row broadcast total. floor(log2(n)) of a BIGINT count is exact
    in both engines (same contract as q_degree_distribution)."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey")
    k = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = k.agg(
        F.sum("n").cast("long").alias("total"), F.max("n").alias("mx")
    )
    return (
        k.crossJoin(F.broadcast(tot))
        .groupBy(F.expr("CAST(floor(log2(n)) AS BIGINT)").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum("n").cast("long").alias("n_rows"),
            F.max("n").cast("long").alias("max_rows"),
            F.expr("CAST(1000000 * max(n) div any_value(total) AS BIGINT)").alias(
                "max_key_share_ppm"
            ),
        )
        .orderBy("bucket")
    )
