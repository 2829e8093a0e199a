"""Approximate / sketch aggregates — north-star additions (SURVEY.md §2.B).

The reference has no sketch surface (its only aggregate optimization is
the stats-backed ``count(*)``, /root/reference/src/table_function.cpp:325-351);
these are the mergeable-sketch aggregates a 100 TB pipeline needs when
exact distinct/quantile would force a full shuffle of every key.

Oracle strategy: sketches are engine-specific, so cross-engine parity is
proven two ways —

- ``q_kmv_distinct`` uses a **K-minimum-values sketch built from the
  portable hash** (functions/portable.py): both engines compute the
  identical hash, keep the identical k smallest values, and therefore
  produce the *bit-identical* estimate. Fully hash-checked.
- ``q_hll_distinct`` / ``q_approx_quantile`` run each engine's native
  sketch (HyperLogLog / t-digest-family) and hash-check only the exact
  value and a deterministic within-tolerance verdict, since the raw
  estimates legitimately differ across implementations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_pst_spark.functions.portable import (
    P_HASH,
    duck_poly_hash_long,
    poly_hash_long,
)
from duckdb_pst_spark.registry import query
from duckdb_pst_spark.tables import table

KMV_K = 256


@query(
    "q_kmv_distinct",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT {duck_poly_hash_long('o_custkey')} AS hv FROM orders
    ),
    k AS (SELECT hv FROM h ORDER BY hv LIMIT {KMV_K}),
    s AS (SELECT count(*) AS kc, max(hv) AS hk FROM k),
    x AS (SELECT count(DISTINCT o_custkey) AS exact_distinct FROM orders)
    SELECT s.kc AS k_used,
           CASE WHEN s.kc < {KMV_K} THEN s.kc
                ELSE CAST(FLOOR((s.kc - 1) * CAST({P_HASH} AS DOUBLE) / s.hk)
                          AS BIGINT) END AS kmv_estimate,
           x.exact_distinct
    FROM s, x
    """,
    tags=("sketch", "agg"),
)
def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-count sketch, engine-portable.

    Hash every key with the portable multiplicative hash (uniform on
    [0, P)), keep the k smallest *distinct* hash values; the k-th
    smallest estimates D ≈ (k-1)·P / h_k. Because the hash is identical
    in both engines the estimate is bit-identical — a sketch the oracle
    can hash-check exactly (unlike HLL, see q_hll_distinct).

    Scale shape: the distinct-hash set is a partial-aggregated hash
    shuffle, and orderBy().limit(k) is TakeOrdered — each task keeps
    only its k smallest, the driver merges #partitions·k values. Total
    sketch state is O(k) per task regardless of data size; at 100 TB
    the same two-phase (local top-k, merge) shape holds, which is the
    defining property of a mergeable sketch."""
    o = table(spark, sf_dir, "orders")
    topk = (
        o.select(poly_hash_long(F.col("o_custkey")).alias("hv"))
        .distinct()
        .orderBy("hv")
        .limit(KMV_K)
    )
    s = topk.agg(F.count("*").alias("kc"), F.max("hv").alias("hk"))
    x = o.agg(F.count_distinct("o_custkey").alias("exact_distinct"))
    return s.crossJoin(x).select(
        F.col("kc").alias("k_used"),
        F.when(F.col("kc") < KMV_K, F.col("kc"))
        .otherwise(
            F.floor(
                (F.col("kc") - 1).cast("double")
                * F.lit(float(P_HASH))
                / F.col("hk").cast("double")
            ).cast("long")
        )
        .alias("kmv_estimate"),
        "exact_distinct",
    )


@query(
    "q_hll_distinct",
    oracle="""
    WITH s AS (
      SELECT approx_count_distinct(o_custkey) AS hll,
             count(DISTINCT o_custkey) AS exact_distinct
      FROM orders
    )
    SELECT exact_distinct,
           abs(CAST(hll AS DOUBLE) - exact_distinct)
             <= 0.10 * exact_distinct AS hll_within_10pct
    FROM s
    """,
    tags=("sketch", "agg"),
)
def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct count, checked as a within-tolerance verdict.

    Spark's approx_count_distinct (HLL++, rsd 5%) and DuckDB's
    approx_count_distinct are different sketch implementations, so the
    raw estimates legitimately differ; the oracle hash-checks the exact
    count plus the deterministic |est − exact| ≤ 10% verdict, which
    both engines' ~2% standard error satisfies with wide margin.

    Scale shape: HLL is the canonical mergeable sketch — a fixed
    ~kilobytes register array per partial aggregate, map-side combined,
    one tiny final merge. The exact count shown beside it is the thing
    that does NOT scale (full shuffle of every distinct key)."""
    o = table(spark, sf_dir, "orders")
    s = o.agg(
        F.approx_count_distinct("o_custkey").alias("hll"),
        F.count_distinct("o_custkey").alias("exact_distinct"),
    )
    return s.select(
        "exact_distinct",
        (
            F.abs(F.col("hll").cast("double") - F.col("exact_distinct"))
            <= 0.10 * F.col("exact_distinct")
        ).alias("hll_within_10pct"),
    )


@query(
    "q_approx_quantile",
    oracle="""
    WITH s AS (
      SELECT quantile_cont(o_totalprice, 0.5) AS ex,
             approx_quantile(o_totalprice, 0.5) AS aq
      FROM orders
    )
    SELECT CAST(FLOOR(ex * 100) AS BIGINT) AS exact_median_c,
           abs(aq - ex) <= 0.02 * ex AS approx_within_2pct
    FROM s
    """,
    tags=("sketch", "agg"),
)
def q_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate median vs exact, checked as a tolerance verdict.

    Spark's percentile_approx (Greenwald-Khanna summary, accuracy
    10000) and DuckDB's approx_quantile (t-digest) are different
    sketches; the oracle pins the floor-scaled exact median (identical
    in both engines — see q_percentile) and the |approx − exact| ≤ 2%
    verdict.

    Scale shape: quantile summaries are mergeable partial aggregates
    with bounded state, so the approx path is one map-side-combined
    pass; exact percentile needs a full sort per group and is the thing
    to avoid at 100 TB."""
    o = table(spark, sf_dir, "orders")
    s = o.agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("ex"),
        F.expr("percentile_approx(o_totalprice, 0.5, 10000)").alias("aq"),
    )
    return s.select(
        F.floor(F.col("ex") * 100).cast("long").alias("exact_median_c"),
        (F.abs(F.col("aq") - F.col("ex")) <= 0.02 * F.col("ex")).alias(
            "approx_within_2pct"
        ),
    )


MG_CAPACITY = 64
HH_PHI = 1.0 / 32  # exact binary fraction — bit-identical threshold math


@query(
    "q_heavy_hitters",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(list_filter(string_split(text, ' '), x -> x != '')) AS t
      FROM documents
    ),
    tot AS (SELECT count(*) AS n FROM tok)
    SELECT t, count(*) AS cnt
    FROM tok, tot
    GROUP BY t, n
    HAVING count(*) >= {HH_PHI} * n
    """,
    tags=("sketch", "text"),
    bench=True,
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """φ-heavy hitters (tokens with frequency ≥ 1/32 of the stream) via
    the two-pass sketch-then-verify pattern.

    Pass 1 runs a Misra-Gries summary (capacity 64 ≥ 1/φ) *per
    partition* inside one Arrow-batched mapInPandas — MG state carries
    across the partition's record batches, and its guarantee makes the
    surviving keys a superset of every φ-heavy key no matter how rows
    are partitioned. Pass 2 exact-counts only those candidates
    (left-semi against the broadcast candidate set) and applies the
    exact threshold — so the output is the exact heavy-hitter set,
    deterministic and oracle-checkable even though pass 1 is a sketch.

    Scale shape: pass 1 shuffles nothing and holds O(1/φ) state per
    partition; pass 2 shuffles partial counts for ≤ #partitions·64
    candidate keys instead of the full vocabulary. This is the
    heavy-hitter plan for vocabularies too large for a plain groupBy
    (URLs, n-grams, user-ids), where exact counting of every key is the
    thing that OOMs."""
    import pandas as pd  # noqa: PLC0415 — executor-side import

    from duckdb_pst_spark.functions.partitioning import spread

    # explode(split) + WHERE stays inside whole-stage codegen end to end;
    # the equivalent higher-order filter() before the explode is an
    # interpreted expression and measured ~17% slower at 100x volume.
    toks = (
        spread(table(spark, sf_dir, "documents"))
        .select(F.explode(F.split(F.col("text"), " ")).alias("t"))
        .filter(F.col("t") != "")
    )

    def misra_gries(batches):
        # Vectorized MG: each Arrow batch is histogrammed with
        # value_counts() (C speed), then the batch histogram is merged
        # into the running summary with the mergeable-summaries MG merge
        # (Agarwal et al., PODS'12): add counts, and if more than
        # `capacity` keys survive, subtract the (capacity+1)-th largest
        # count from every key and drop the non-positives. Total
        # decrement mass stays ≤ n_partition/(capacity+1), so every key
        # with partition frequency above that bound survives — the same
        # superset guarantee as the per-token update, at ~vocab-per-batch
        # Python iterations instead of one per token (~100× fewer).
        from duckdb_pst_spark.functions.batches import rebatch

        counters: dict[str, int] = {}
        for pdf in rebatch(batches, 8192):
            for t, c in pdf["t"].value_counts().items():
                counters[t] = counters.get(t, 0) + int(c)
            if len(counters) > MG_CAPACITY:
                m = sorted(counters.values(), reverse=True)[MG_CAPACITY]
                counters = {k: v - m for k, v in counters.items() if v > m}
        yield pd.DataFrame({"t": list(counters.keys())})

    candidates = toks.mapInPandas(misra_gries, "t string").distinct()
    # counting stays TWO separate passes on purpose: a fold-the-total-
    # into-the-candidate-count variant (left join + NULL catch-all group)
    # measured ~25% SLOWER at 100x — joining every token costs more than
    # a dedicated count-only pass, because the semi-join prunes ~99% of
    # tokens before any aggregation state is touched.
    total = toks.agg(F.count("*").alias("n"))
    return (
        toks.join(F.broadcast(candidates), "t", "left_semi")
        .groupBy("t")
        .agg(F.count("*").alias("cnt"))
        .crossJoin(total)
        .filter(F.col("cnt") >= F.lit(HH_PHI) * F.col("n"))
        .select("t", "cnt")
    )
