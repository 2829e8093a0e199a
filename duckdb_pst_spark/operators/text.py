"""Text analysis over the documents table — SURVEY.md §2.B B16-B23 plus
the training-data-pipeline text operators (tokenization, language ID
heuristic, quality scoring, fingerprinting).

Everything is built-in-function column algebra (split / filter /
transform / aggregate / explode) — JVM-side, whole-stage-codegen'd, no
Python UDFs. Ratios are computed with exact integer division
(``a * 10^k div b``) so the DuckDB oracle hash-matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_pst_spark.functions.portable import poly_hash, tokens
from duckdb_pst_spark.registry import query
from duckdb_pst_spark.tables import table

# tiny English stopword list for the language-ID heuristic
_EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")


def _docs_with_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "documents").withColumn("toks", tokens(F.col("text")))


# ------------------------------------------------------------ B16 explode
@query(
    "q_explode",
    oracle="""
    SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x != '')) AS tok
    FROM documents
    WHERE doc_id < 50
    """,
    tags=("nested", "explode"),
)
def q_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B16: unnest(list) → rows (reference test/sql/read_unittest_pst.test:66
    `unnest(one_off_members)`). Generator runs inside codegen."""
    d = _docs_with_tokens(spark, sf_dir).filter(F.col("doc_id") < 50)
    return d.select("doc_id", F.explode("toks").alias("tok"))


@query(
    "q_explode_agg",
    oracle="""
    SELECT tok, COUNT(*) AS cnt FROM (
      SELECT unnest(list_filter(string_split(text, ' '), x -> x != '')) AS tok
      FROM documents
    ) t
    GROUP BY tok
    ORDER BY cnt DESC, tok
    LIMIT 25
    """,
    tags=("nested", "agg"),
    bench=True,
)
def q_explode_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B23: aggregation after explode — corpus term frequencies. The
    explode→groupBy pipeline partial-aggregates map-side before the
    shuffle, so the shuffled data is one row per distinct token per task,
    not one per token occurrence — the property that makes this viable
    at 100 TB."""
    d = _docs_with_tokens(spark, sf_dir)
    return (
        d.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(25)
    )


# --------------------------------------------------------- B18/B19 scalars
@query(
    "q_list_first",
    oracle="""
    SELECT doc_id, (list_filter(string_split(text, ' '), x -> x != ''))[1] AS first_tok
    FROM documents
    """,
    tags=("nested",),
)
def q_list_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B18: list_first (reference test/sql/table_function_parameters.test:33).
    try_element_at ↔ DuckDB 1-based [] (both NULL on empty)."""
    d = _docs_with_tokens(spark, sf_dir)
    return d.select("doc_id", F.try_element_at("toks", F.lit(1)).alias("first_tok"))


@query(
    "q_length",
    oracle="SELECT doc_id, length(text) AS text_len, n_chars FROM documents",
    tags=("expr",),
)
def q_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B19: length(str) (reference test/sql/table_function_parameters.test:21),
    cross-checked against the precomputed n_chars column."""
    return table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("text_len"), "n_chars"
    )


# --------------------------------------------------- pipeline: token stats
@query(
    "q_text_tokens",
    oracle="""
    SELECT doc_id,
           len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_distinct_tokens,
           CAST(length(text) AS BIGINT) // len(toks) AS chars_per_tok
    FROM (
      SELECT doc_id, text, list_filter(string_split(text, ' '), x -> x != '') AS toks
      FROM documents
    ) t
    """,
    tags=("text", "pipeline"),
    bench=True,
)
def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting per document (whitespace tokenizer) — n_tokens,
    distinct tokens, integer chars-per-token. All array algebra, no
    shuffle at all: embarrassingly parallel over the corpus."""
    d = _docs_with_tokens(spark, sf_dir)
    return d.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct_tokens"),
        F.expr("CAST(length(text) AS BIGINT) div size(toks)").alias("chars_per_tok"),
    )


@query(
    "q_lang_stopword",
    oracle=f"""
    SELECT doc_id, lang,
           (CAST(len(list_filter(toks, t -> t IN {_EN_STOPWORDS!r})) AS BIGINT) * 1000000)
             // len(toks) AS en_ratio_u,
           CASE WHEN (CAST(len(list_filter(toks, t -> t IN {_EN_STOPWORDS!r})) AS BIGINT)
                      * 1000000) // len(toks) >= 100000
                THEN 'en' ELSE 'other' END AS lang_guess
    FROM (
      SELECT doc_id, lang, list_filter(string_split(text, ' '), x -> x != '') AS toks
      FROM documents
    ) t
    """,
    tags=("text", "pipeline"),
)
def q_lang_stopword(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: English stopword ratio (scaled integer) and
    a thresholded guess — the classic cheap lang-ID signal for corpus
    filtering. Exact integer arithmetic keeps it engine-portable."""
    d = _docs_with_tokens(spark, sf_dir)
    # `div` (exact integer division) has no Column-API form, so the ratio
    # is an expr; array literal mirrors the oracle's IN list.
    stop_sql = "array(" + ", ".join(f"'{s}'" for s in _EN_STOPWORDS) + ")"
    en_ratio = F.expr(
        f"(CAST(size(filter(toks, t -> array_contains({stop_sql}, t))) AS BIGINT)"
        " * 1000000) div size(toks)"
    )
    return d.select(
        "doc_id",
        "lang",
        en_ratio.alias("en_ratio_u"),
        F.when(en_ratio >= 100000, "en").otherwise("other").alias("lang_guess"),
    )


@query(
    "q_quality_score",
    oracle="""
    SELECT doc_id,
           length(text) AS n_chars_txt,
           len(toks) AS n_tokens,
           (CAST(len(list_distinct(toks)) AS BIGINT) * 1000000) // len(toks) AS uniq_ratio_u,
           CASE WHEN len(toks) >= 20
                 AND (CAST(len(list_distinct(toks)) AS BIGINT) * 1000000) // len(toks) >= 200000
                THEN 1 ELSE 0 END AS quality_pass
    FROM (
      SELECT doc_id, text, list_filter(string_split(text, ' '), x -> x != '') AS toks
      FROM documents
    ) t
    """,
    tags=("text", "pipeline"),
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring: length, token count, type-token
    (uniqueness) ratio, and a pass/fail gate — the shape of a pretraining
    corpus quality filter. Scaled-integer ratios for portability."""
    d = _docs_with_tokens(spark, sf_dir)
    uniq_ratio = F.expr(
        "(CAST(size(array_distinct(toks)) AS BIGINT) * 1000000) div size(toks)"
    )
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_txt"),
        F.size("toks").alias("n_tokens"),
        uniq_ratio.alias("uniq_ratio_u"),
        F.when((F.size("toks") >= 20) & (uniq_ratio >= 200000), 1).otherwise(0).alias("quality_pass"),
    )


@query(
    "q_fingerprint",
    oracle="""
    SELECT doc_id,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
             [CAST(ascii(c) AS BIGINT) for c in string_split(text, '')]),
             (acc, x) -> (acc * 31 + x) % 1000000007) AS fp
    FROM documents
    """,
    tags=("text", "pipeline"),
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: rolling polynomial hash of the full text
    (portable across engines — see functions/portable.py). On the 100 TB
    hot path you'd swap in xxhash64(text) (single JVM hash call); the
    pipeline shape (fingerprint → group → dedup) is identical."""
    return table(spark, sf_dir, "documents").select(
        "doc_id", poly_hash(F.col("text")).alias("fp")
    )
