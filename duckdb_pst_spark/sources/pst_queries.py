"""PST-domain queries over the fixture tables (SURVEY.md §2.C).

Each query mirrors a golden test of the reference
(/root/reference/test/sql/read_unittest_pst.test,
table_function_parameters.test, read_pst_folders.test, README.md) over the
deterministic parquet fixtures written by
``duckdb_pst_spark.sources.fixtures``. Oracle SQL reads the same parquet
through DuckDB ``read_parquet`` on absolute paths, so these ARE
hash-checked like the §2.B queries — the fixture dir is generated at
import time (idempotent) so the paths exist for both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_pst_spark.operators.recursive import treewalk
from duckdb_pst_spark.registry import query
from duckdb_pst_spark.sources import fixtures, pst

_DIR = fixtures.generate()  # idempotent; absolute fixture dir for oracle SQL


def _pq(table: str) -> str:
    return f"read_parquet('{_DIR}/{table}.parquet')"


# --------------------------------------------------------------------- §2.C


@query(
    "q_pst_folders_scan",
    oracle=f"""
    SELECT pst_name, node_id, parent_node_id, container_class,
           CASE WHEN display_name = '' THEN '<empty>' ELSE display_name END
             AS display_name,
           subfolder_count, message_count, unread_message_count
    FROM {_pq("pst_folders")}
    """,
    tags=("pst", "scan"),
)
def q_pst_folders_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden folder-table scan with the reference's `<empty>` CASE
    projection (read_unittest_pst.test:19-37, B15)."""
    f = pst.read_pst_folders(spark)
    return f.select(
        "pst_name",
        "node_id",
        "parent_node_id",
        "container_class",
        F.when(F.col("display_name") == "", "<empty>")
        .otherwise(F.col("display_name"))
        .alias("display_name"),
        "subfolder_count",
        "message_count",
        "unread_message_count",
    )


@query(
    "q_pst_class_counts",
    oracle=f"""
    SELECT message_class, count(*) AS c
    FROM {_pq("pst_messages")}
    GROUP BY message_class
    ORDER BY c DESC, message_class
    """,
    tags=("pst", "agg"),
)
def q_pst_class_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The README flagship over a multi-file glob: message-class histogram
    (README.md:25-37) — partial aggregation map-side, one shuffle on the
    low-cardinality class key."""
    m = pst.read_pst_messages(spark, "fixtures/*.pst")
    return (
        m.groupBy("message_class")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("message_class"))
    )


@query(
    "q_pst_folder_tree",
    oracle=f"""
    WITH RECURSIVE d AS (
      SELECT CAST(32802 AS BIGINT) AS key
      UNION
      SELECT f.node_id AS key
      FROM {_pq("pst_folders")} f JOIN d ON f.parent_node_id = d.key
      WHERE f.pst_path = 'fixtures/fix000.pst' AND f.node_id <> f.parent_node_id
    )
    SELECT d.key, f.display_name
    FROM d JOIN {_pq("pst_folders")} f
      ON f.node_id = d.key AND f.pst_path = 'fixtures/fix000.pst'
    """,
    tags=("pst", "recursive"),
)
def q_pst_folder_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive descendants of 'Top of Outlook data file' (node 32802) —
    the README dirtree query (README.md:406-417) on the PST fixture tree,
    via the treewalk fixpoint loop (UNION-dedup terminates the root
    self-loop)."""
    folders = pst.read_pst_folders(spark, "fixtures/fix000.pst")
    edges = folders.filter(F.col("node_id") != F.col("parent_node_id")).select(
        F.col("node_id").cast("long").alias("child"),
        F.col("parent_node_id").cast("long").alias("parent"),
    )
    frontier = spark.range(32802, 32803).select(F.col("id").alias("key"))
    keys = treewalk(frontier, edges, from_col="parent", to_col="child", dedup_level=False)
    return keys.join(
        F.broadcast(folders.select(F.col("node_id").alias("key"), "display_name")),
        "key",
    )


@query(
    "q_pst_recipients_explode",
    oracle=f"""
    SELECT node_id, subject,
           r.display_name AS recipient_name,
           r.email_address AS recipient_email,
           r.recipient_type AS recipient_type
    FROM (SELECT node_id, subject, unnest(recipients) AS r
          FROM {_pq("pst_messages")}
          WHERE pst_path = 'fixtures/fix000.pst')
    """,
    tags=("pst", "nested"),
)
def q_pst_recipients_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unnest(recipients) → rows with struct-field projection
    (read_unittest_pst.test:66 shape, B16/B17)."""
    m = pst.read_pst_messages(spark, "fixtures/fix000.pst")
    r = m.select("node_id", "subject", F.explode("recipients").alias("r"))
    return r.select(
        "node_id",
        "subject",
        F.col("r.display_name").alias("recipient_name"),
        F.col("r.email_address").alias("recipient_email"),
        F.col("r.recipient_type").alias("recipient_type"),
    )


@query(
    "q_pst_body_truncate",
    oracle=f"""
    SELECT node_id, length(substr(body_html, 1, 50)) AS html_chars
    FROM {_pq("pst_messages")}
    WHERE body_html IS NOT NULL AND pst_path = 'fixtures/fix000.pst'
    """,
    tags=("pst", "params"),
)
def q_pst_body_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """read_body_size_bytes=100 → 50 UTF-16 chars (A12 byte math;
    table_function_parameters.test:19-28 asserts exactly this)."""
    m = pst.read_pst_messages(spark, "fixtures/fix000.pst", read_body_size_bytes=100)
    return m.filter(F.col("body_html").isNotNull()).select(
        "node_id", F.length("body_html").cast("long").alias("html_chars")
    )


@query(
    "q_pst_read_limit",
    oracle=f"""
    SELECT count(*) AS n
    FROM (SELECT * FROM {_pq("pst_messages")} LIMIT 5)
    """,
    tags=("pst", "params"),
)
def q_pst_read_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """read_limit=5 caps planned rows (A6;
    table_function_parameters.test:13-17 counts a limited subquery)."""
    m = pst.read_pst_messages(spark, read_limit=5)
    return m.select(F.lit(1).alias("one")).agg(F.count(F.lit(1)).alias("n"))


@query(
    "q_pst_attachment_gate",
    oracle=f"""
    SELECT node_id,
           a.filename AS filename,
           CAST(NULL AS BLOB) AS first_bytes
    FROM (SELECT node_id, unnest(attachments) AS a
          FROM {_pq("pst_messages")}
          WHERE has_attachments AND pst_path = 'fixtures/fix000.pst')
    """,
    tags=("pst", "params"),
)
def q_pst_attachment_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """read_attachment_body=False NULLs attachment bytes (A14,
    row_serializer.cpp:152-161; complementary empty-result assertion in
    table_function_parameters.test:30-40). The oracle pins bytes to NULL —
    the Spark side must have gated them for the hash to match."""
    m = pst.read_pst_messages(spark, "fixtures/fix000.pst", read_attachment_body=False)
    a = m.filter("has_attachments").select("node_id", F.explode("attachments").alias("a"))
    return a.select(
        "node_id",
        F.col("a.filename").alias("filename"),
        F.col("a.bytes").alias("first_bytes"),
    )


@query(
    "q_pst_dlist_members",
    oracle=f"""
    SELECT d.display_name AS list_name,
           m.display_name AS member_name,
           m.address_type AS address_type,
           m.email_address AS email_address,
           len(d.member_node_ids) AS contact_member_count
    FROM (SELECT display_name, member_node_ids, unnest(one_off_members) AS m
          FROM {_pq("pst_distribution_lists")}
          WHERE pst_path = 'fixtures/fix000.pst') d
    """,
    tags=("pst", "nested"),
)
def q_pst_dlist_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-list one-off members unnested + member-id list length
    (read_unittest_pst.test:57-69, A16 output shape)."""
    d = pst.read_pst_distribution_lists(spark, "fixtures/fix000.pst")
    e = d.select(
        F.col("display_name").alias("list_name"),
        F.size("member_node_ids").cast("long").alias("contact_member_count"),
        F.explode("one_off_members").alias("m"),
    )
    return e.select(
        "list_name",
        F.col("m.display_name").alias("member_name"),
        F.col("m.address_type").alias("address_type"),
        F.col("m.email_address").alias("email_address"),
        "contact_member_count",
    )


@query(
    "q_pst_folder_invariants",
    oracle=f"""
    SELECT pst_name, count(*) AS n, count(DISTINCT node_id) AS distinct_nodes
    FROM {_pq("pst_folders")}
    GROUP BY pst_name
    ORDER BY pst_name
    """,
    tags=("pst", "agg"),
)
def q_pst_folder_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file invariant: node_id unique within a file
    (read_pst_folders.test:19-29) — count vs count(DISTINCT) per
    pst_name."""
    f = pst.read_pst_folders(spark)
    return (
        f.groupBy("pst_name")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("node_id").alias("distinct_nodes"),
        )
        .orderBy("pst_name")
    )
