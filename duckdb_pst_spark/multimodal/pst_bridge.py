"""PST → multimodal bridge: mail attachments as a binary media table.

The reference stops at exposing ``attachments[].bytes`` per message
(LIST(STRUCT), /root/reference/src/row_serializer.cpp:391-407, gated by
``read_attachment_body`` — A14). This module is the training-pipeline
continuation: explode every archive's attachments into the same
``(media_id, bytes, meta)`` shape the Arrow-batched multimodal kernels
(`multimodal/ops.py`) consume, so "mail corpus → image stats / resize /
features" is one DataFrame chain.

Container formats (jpeg/png/...) keep NULL geometry in ``meta`` and hit
the kernels' codec gate (`NotImplementedError` without PIL — the decode
step is a stub by design here); RAW formats decode in-container. All
plumbing — explode, hashing, schema, batch shape — is real Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def pst_attachments(spark: SparkSession, path: str, *, table: str = "messages") -> DataFrame:
    """One row per by-value attachment across a PST glob/URL.

    Columns: ``media_id`` (stable xxhash64 of archive/node/position),
    provenance (``pst_path``, ``node_id``, ``filename``, ``mime_type``,
    ``size``), payload ``bytes``, and a kernel-ready ``meta`` struct
    whose ``format`` comes from the MIME subtype (falling back to the
    filename extension). Embedded-message and by-reference attachments
    carry no bytes (A14) and are filtered out.
    """
    from duckdb_pst_spark.sources.mspst.datasource import register

    register(spark)
    m = (
        spark.read.format("pst")
        .option("table", table)
        .option("read_attachment_body", "true")
        .load(path)
    )
    a = m.select("pst_path", "node_id", F.posexplode("attachments").alias("idx", "a"))
    fmt = F.lower(
        F.coalesce(
            F.element_at(F.split(F.col("a.mime_type"), "/"), -1),
            F.element_at(F.split(F.col("a.filename"), r"\."), -1),
        )
    )
    return (
        a.filter(F.col("a.bytes").isNotNull())
        .select(
            F.xxhash64("pst_path", "node_id", "idx").alias("media_id"),
            "pst_path",
            "node_id",
            F.col("a.filename").alias("filename"),
            F.col("a.mime_type").alias("mime_type"),
            F.col("a.size").alias("size"),
            F.col("a.bytes").alias("bytes"),
            F.struct(
                fmt.alias("format"),
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                F.lit(None).cast("int").alias("channels"),
            ).alias("meta"),
        )
    )
