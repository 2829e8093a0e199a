"""Deterministic sampling — north-star additions (SURVEY.md §2.B).

Training-data pipelines sample constantly (debug subsets, eval splits,
class rebalancing). ``TABLESAMPLE`` / ``df.sample`` are engine- and
partitioning-dependent, so they can never pass a cross-engine oracle and
— worse for a real pipeline — are not reproducible run-to-run on
changing cluster layouts. The scalable, reproducible alternative is
**hash sampling**: keep a row iff ``hash(key) % D < r``. Selection is a
pure function of the key, so it is stable across engines, partitionings,
and reruns, and composable (the same key lands in the same split
everywhere — exactly how train/test splits should be cut).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_pst_spark.functions.portable import duck_poly_hash_long, poly_hash_long
from duckdb_pst_spark.registry import query
from duckdb_pst_spark.tables import table


@query(
    "q_hash_sample",
    oracle=f"""
    SELECT source, count(*) AS n_sampled, CAST(SUM(n_chars) AS BIGINT) AS chars_sampled
    FROM documents
    WHERE {duck_poly_hash_long('doc_id')} % 100 < 10
    GROUP BY source
    """,
    tags=("sampling",),
)
def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% deterministic sample of documents by key hash.

    The predicate is computed per-row from the portable hash of doc_id,
    so it pushes into the scan's codegen span — zero shuffle, zero
    coordination, and the same 10% is selected on any engine or cluster
    shape. At 100 TB this is the only sampling that is both one-pass
    and reproducible; df.sample() re-draws on every retry/re-layout."""
    d = table(spark, sf_dir, "documents")
    return (
        d.filter(poly_hash_long(F.col("doc_id")) % 100 < 10)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum("n_chars").alias("chars_sampled"),
        )
    )


@query(
    "q_stratified_sample",
    oracle=f"""
    SELECT lang, count(*) AS n_sampled
    FROM documents
    WHERE {duck_poly_hash_long('doc_id')} % 100
          < CASE WHEN lang = 'en' THEN 20 ELSE 80 END
    GROUP BY lang
    """,
    tags=("sampling",),
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified (class-rebalancing) hash sample: 20% of the majority
    'en' documents, 80% of each minority language — the standard move
    when building a balanced training mix from a skewed corpus. Same
    deterministic hash predicate as q_hash_sample, with a per-stratum
    rate; still a single codegen'd scan with no shuffle before the
    final count."""
    d = table(spark, sf_dir, "documents")
    rate = F.when(F.col("lang") == "en", 20).otherwise(80)
    return (
        d.filter(poly_hash_long(F.col("doc_id")) % 100 < rate)
        .groupBy("lang")
        .agg(F.count("*").alias("n_sampled"))
    )


@query(
    "q_source_mix",
    oracle=f"""
    WITH per_src AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS src_chars
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT CAST(SUM(src_chars) AS BIGINT) AS total_chars,
             CAST(count(*) AS BIGINT) AS n_sources
      FROM per_src
    ),
    rates AS (
      SELECT source, src_chars,
             least(1000000,
                   (tot.total_chars * 1000000) // (tot.n_sources * src_chars)
             ) AS rate_u
      FROM per_src, tot
    )
    SELECT d.source,
           r.rate_u,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(SUM(d.n_chars) AS BIGINT) AS chars_kept
    FROM documents d
    JOIN rates r ON r.source = d.source
    WHERE {duck_poly_hash_long('d.doc_id')} % 1000000 < r.rate_u
    GROUP BY d.source, r.rate_u
    """,
    tags=("sampling", "pipeline"),
)
def q_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic DATA MIXING toward a uniform per-source character
    budget — the "source weights" step of a pre-training pipeline
    (up-weight scarce sources, down-sample dominant ones so no single
    crawl swamps the mix).

    Two phases, both engine-exact: (1) one aggregate computes each
    source's share of total characters and turns it into an integer
    keep-rate in parts-per-million — rate = min(1, fair_share /
    actual_share), so over-represented sources are down-sampled to the
    uniform budget and under-represented ones keep everything (a real
    pipeline would add an epochs/up-sampling factor here); (2) the same
    hash-gate as q_hash_sample applies that rate per row.

    Scale shape: phase 1 is a map-side-combined aggregate producing
    #sources rows, broadcast back; phase 2 is a scan-local codegen'd
    filter — the corpus is read once, nothing but the tiny rate table
    moves. Selection is a pure function of (doc_id, rate table), so the
    mix is reproducible across engines, partitionings, and reruns, and
    the oracle hash-checks it exactly (integer ppm rates; no floats)."""
    d = table(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("src_chars"),
    )
    tot = per_src.agg(
        F.sum("src_chars").cast("long").alias("total_chars"),
        F.count(F.lit(1)).cast("long").alias("n_sources"),
    )
    rates = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        F.least(
            F.lit(1_000_000).cast("long"),
            # `div` = exact integer division on longs (matches DuckDB //)
            F.expr("(total_chars * 1000000) div (n_sources * src_chars)").cast("long"),
        ).alias("rate_u"),
    )
    kept = d.join(F.broadcast(rates), "source").filter(
        poly_hash_long(F.col("doc_id")) % 1_000_000 < F.col("rate_u")
    )
    return kept.groupBy("source", "rate_u").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.sum("n_chars").cast("long").alias("chars_kept"),
    )


_CAP_PER_SOURCE = 15


@query(
    "q_source_cap",
    oracle=f"""
    SELECT doc_id, source, rk FROM (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY {duck_poly_hash_long('doc_id')} % 1000000, doc_id) AS rk
      FROM documents
    ) t WHERE rk <= {_CAP_PER_SOURCE}
    """,
    tags=("sampling", "pipeline"),
)
def q_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap: keep at most {N} documents per source,
    chosen in deterministic hash order — the "no domain may dominate the
    mix" gate every web-scale corpus applies (a handful of boilerplate
    domains would otherwise contribute most of the tokens). Hash order
    (not doc_id order) makes the kept subset an unbiased draw that is
    STABLE across engines, reruns, and re-crawls that append documents
    with higher ids.

    Scale: one shuffle on `source` + a window rank with early-out (rank
    needs only the per-source order, and the per-partition sort tops
    out at the source's doc count). A skew-prone hot source is exactly
    the thing being capped — but its SORT is still over all its rows, so
    for web-scale hot domains you'd pre-prune with the same hash
    predicate (hash % M < threshold per source) before ranking; the
    cap rank then runs on the survivors. Deterministic: ties broken by
    doc_id."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        (poly_hash_long(F.col("doc_id")) % 1000000).asc(), F.col("doc_id").asc()
    )
    return (
        d.select("doc_id", "source", F.row_number().over(w).cast("long").alias("rk"))
        .where(F.col("rk") <= _CAP_PER_SOURCE)
    )


_N_TRAIN_SHARDS = 8


@query(
    "q_global_shuffle",
    oracle=f"""
    SELECT doc_id, shard,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY shard ORDER BY h2, doc_id) AS BIGINT) AS pos
    FROM (
      SELECT doc_id,
             {duck_poly_hash_long('doc_id')} % {_N_TRAIN_SHARDS} AS shard,
             {duck_poly_hash_long('doc_id + 1000003')} AS h2
      FROM documents
    ) t
    """,
    tags=("sampling", "pipeline"),
)
def q_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic GLOBAL SHUFFLE into training shards — the
    "shuffle the corpus before training" step every dataloader needs:
    each document gets a shard (hash-uniform) and a pseudo-random
    position inside it (a SECOND, decorrelated hash orders the shard, so
    shard membership doesn't leak into within-shard order). The result
    is a reproducible permutation: same corpus → same shards, same
    order, on any engine, any partitioning, any rerun.

    Scale: ONE shuffle keyed by shard + a within-shard sort — never a
    global ORDER BY (a total sort at 100 TB is a range-partition over
    the whole corpus; per-shard sorts are embarrassingly parallel and
    each shard is 1/8 of the corpus). Writing the result is
    repartition(shard).sortWithinPartitions(h2) → one file per shard,
    which is exactly how the export sink in sinks.py lays out training
    data."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    h2 = poly_hash_long(F.col("doc_id") + F.lit(1000003))
    shard = poly_hash_long(F.col("doc_id")) % _N_TRAIN_SHARDS
    w = Window.partitionBy("shard").orderBy("h2", "doc_id")
    return (
        d.select("doc_id", shard.alias("shard"), h2.alias("h2"))
        .select(
            "doc_id",
            "shard",
            F.row_number().over(w).cast("long").alias("pos"),
        )
    )


# ------------------------------------------------- leakage-free split
_SPLIT_TRAIN_PCT = 80  # train share of the 0-99 hash space


@query(
    "q_split_leakfree",
    oracle=f"""
    SELECT doc_id, rep_id,
           CASE WHEN {duck_poly_hash_long('rep_id')} % 100 < {_SPLIT_TRAIN_PCT}
                THEN 'train' ELSE 'valid' END AS split
    FROM (
      SELECT doc_id, MIN(doc_id) OVER (PARTITION BY text) AS rep_id
      FROM documents
    ) t
    """,
    tags=("sampling", "dedup", "pipeline"),
)
def q_split_leakfree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free train/validation split — the eval-integrity step a
    naive per-document hash split gets wrong: if two copies of the same
    text land on opposite sides, the model is evaluated on its own
    training data and the validation loss is a lie (the failure mode
    the deduplication literature flags for perplexity benchmarks).
    Here the split key is the exact-duplicate GROUP, not the document:
    every doc inherits its group representative (min doc_id over
    identical text) and the portable hash of THAT decides the side, so
    duplicate copies can never straddle the split. For near-duplicate
    leakage the same two-line pattern composes with the connected-
    component output of q_dedup_cluster_star (split on the component
    representative instead); the exact-group form keeps this an
    oracle-checkable single-exchange query.

    Scale shape: ONE text-keyed exchange (the window's partitioning) —
    the same exchange any exact-dedup pass already pays, so in a real
    pipeline the representative column is free (it is exactly
    q_dedup_exact's group key). The split predicate itself is pure
    per-row integer arithmetic on rep_id — no second shuffle, no
    coordination, reproducible on any engine or cluster shape, and new
    corpus increments route deterministically to the same side their
    duplicate group already lives on."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    rep = F.min("doc_id").over(Window.partitionBy("text")).alias("rep_id")
    return d.select("doc_id", rep).select(
        "doc_id",
        "rep_id",
        F.when(
            poly_hash_long(F.col("rep_id")) % 100 < _SPLIT_TRAIN_PCT, "train"
        )
        .otherwise("valid")
        .alias("split"),
    )
