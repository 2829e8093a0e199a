"""PST-shaped source layer — the 8 table functions of the reference
(/root/reference/src/include/table_function.hpp:68-76), re-expressed as
PySpark readers over the fixture parquet (SURVEY.md §2.A / milestone 2).

Reader parameters reproduce the reference's named scan parameters
(table_function.hpp:78-82, defaults :29-31):

- ``read_body_size_bytes`` (default 1_000_000, 0 = unlimited): body /
  body_html are capped at N *bytes* of UTF-16, i.e. N/2 characters —
  the same byte math the reference applies to the property stream
  (row_serializer.cpp:95-108; asserted 100 bytes → 50 chars in
  test/sql/table_function_parameters.test:19-28). Implemented as
  ``substring`` at ingest, which Catalyst keeps next to the scan.
- ``read_attachment_body`` (default False): attachment ``bytes`` are
  NULLed unless requested AND the method is by-value AND the attachment
  is not an embedded message (row_serializer.cpp:152-161).
- ``read_limit`` (default None): cap on rows scanned. The reference
  applies it at planning time to stop the filesystem crawl
  (table_function.cpp:121-131); Spark's LocalLimit/GlobalLimit with
  parquet gives the same early-out.
- glob ``path``: matched against ``pst_path`` (the reference expands the
  glob at bind, table_function.cpp:48-61). A prefix-glob becomes a
  sargable LIKE filter pushed to the parquet scan.

Typed readers (notes/contacts/…) apply the message-class filter the
reference applies during partition planning (A5,
table_function.cpp:133-175) — here a pushed-down predicate + their own
subtype table.
"""

from __future__ import annotations

import fnmatch

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_pst_spark.sources import fixtures

DEFAULT_READ_BODY_SIZE_BYTES = 1_000_000  # table_function.hpp:31


def _glob_filter(df: DataFrame, path_glob: str | None) -> DataFrame:
    if path_glob is None or path_glob in ("*", "**"):
        return df
    if "*" not in path_glob and "?" not in path_glob and "[" not in path_glob:
        return df.filter(F.col("pst_path") == path_glob)
    # prefix globs (the common 'dir/*.pst' shape) stay sargable
    star = min(
        [i for i in (path_glob.find("*"), path_glob.find("?")) if i >= 0], default=-1
    )
    prefix = path_glob[:star] if star >= 0 else path_glob
    df = df.filter(F.col("pst_path").startswith(prefix))
    # exact glob semantics on top (portable fnmatch via regex-free UDF-less
    # translation would be lossy; LIKE covers '*' and '?')
    like = path_glob.replace("%", r"\%").replace("_", r"\_").replace("*", "%").replace("?", "_")
    return df.filter(F.col("pst_path").like(like))


def _truncate_bodies(df: DataFrame, read_body_size_bytes: int) -> DataFrame:
    if read_body_size_bytes == 0:  # 0 = read whole body (row_serializer.cpp:296-311)
        return df
    chars = max(read_body_size_bytes // 2, 1)  # UTF-16: N bytes → N/2 chars
    for col in ("body", "body_html"):
        if col in df.columns:
            df = df.withColumn(col, F.substring(F.col(col), 1, chars))
    return df


def _gate_attachment_bytes(df: DataFrame, read_attachment_body: bool) -> DataFrame:
    if "attachments" not in df.columns or read_attachment_body:
        # by-value + not-embedded already guaranteed by the fixture writer;
        # the real binary reader would apply row_serializer.cpp:152-161 here.
        return df
    gated = F.transform(
        F.col("attachments"),
        lambda a: F.struct(
            a["filename"].alias("filename"),
            a["mime_type"].alias("mime_type"),
            a["size"].alias("size"),
            a["attach_content_id"].alias("attach_content_id"),
            a["attach_method"].alias("attach_method"),
            a["is_message"].alias("is_message"),
            F.lit(None).cast("binary").alias("bytes"),
        ),
    )
    return df.withColumn("attachments", gated)


def _read(
    spark: SparkSession,
    table: str,
    path: str | None,
    *,
    message_class: str | None = None,
    read_body_size_bytes: int = DEFAULT_READ_BODY_SIZE_BYTES,
    read_attachment_body: bool = False,
    read_limit: int | None = None,
    fixture_files: int = fixtures.DEFAULT_N_FILES,
) -> DataFrame:
    data_dir = fixtures.generate(fixture_files)
    df = spark.read.parquet(f"{data_dir}/{table}.parquet")
    df = _glob_filter(df, path)
    if message_class is not None:
        # A5: planning-time class filter → pushed-down equality predicate
        df = df.filter(F.col("message_class") == message_class)
    df = _truncate_bodies(df, read_body_size_bytes)
    df = _gate_attachment_bytes(df, read_attachment_body)
    if read_limit is not None:  # A6
        df = df.limit(read_limit)
    return df


def read_pst_folders(spark: SparkSession, path: str | None = None, **kw) -> DataFrame:
    """read_pst_folders — FOLDER_SCHEMA (schema.hpp:347-359)."""
    kw.pop("read_body_size_bytes", None)
    kw.pop("read_attachment_body", None)
    return _read(spark, "pst_folders", path, **kw)


def read_pst_messages(spark: SparkSession, path: str | None = None, **kw) -> DataFrame:
    """read_pst_messages — NOTE_SCHEMA over ALL message classes
    (table_function.hpp:70: Message mode, no class filter)."""
    return _read(spark, "pst_messages", path, **kw)


def read_pst_notes(spark: SparkSession, path: str | None = None, **kw) -> DataFrame:
    """read_pst_notes — NOTE_SCHEMA filtered to IPM.Note (A5)."""
    return _read(spark, "pst_messages", path, message_class="IPM.Note", **kw)


def read_pst_contacts(spark: SparkSession, path: str | None = None, **kw) -> DataFrame:
    """read_pst_contacts — CONTACT_SCHEMA (schema.hpp:175-260)."""
    return _read(spark, "pst_contacts", path, message_class="IPM.Contact", **kw)


def read_pst_appointments(spark: SparkSession, path: str | None = None, **kw) -> DataFrame:
    """read_pst_appointments — APPOINTMENT_SCHEMA (schema.hpp:263-287)."""
    return _read(spark, "pst_appointments", path, message_class="IPM.Appointment", **kw)


def read_pst_sticky_notes(spark: SparkSession, path: str | None = None, **kw) -> DataFrame:
    """read_pst_sticky_notes — STICKY_NOTE_SCHEMA (schema.hpp:290-304)."""
    return _read(spark, "pst_sticky_notes", path, message_class="IPM.StickyNote", **kw)


def read_pst_tasks(spark: SparkSession, path: str | None = None, **kw) -> DataFrame:
    """read_pst_tasks — TASK_SCHEMA (schema.hpp:307-330)."""
    return _read(spark, "pst_tasks", path, message_class="IPM.Task", **kw)


def read_pst_distribution_lists(spark: SparkSession, path: str | None = None, **kw) -> DataFrame:
    """read_pst_distribution_lists — DLIST_SCHEMA (schema.hpp:333-343)."""
    return _read(spark, "pst_distribution_lists", path, message_class="IPM.DistList", **kw)


READERS = {
    "read_pst_folders": read_pst_folders,
    "read_pst_messages": read_pst_messages,
    "read_pst_notes": read_pst_notes,
    "read_pst_contacts": read_pst_contacts,
    "read_pst_appointments": read_pst_appointments,
    "read_pst_sticky_notes": read_pst_sticky_notes,
    "read_pst_tasks": read_pst_tasks,
    "read_pst_distribution_lists": read_pst_distribution_lists,
}


def match_paths(path_glob: str, all_paths: list[str]) -> list[str]:
    """Bind-time glob expansion helper (parity with table_function.cpp:48-61)."""
    return sorted(p for p in all_paths if fnmatch.fnmatch(p, path_glob))
