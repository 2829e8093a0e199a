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
