"""Session utilities."""

from __future__ import annotations

from duckdb_pst_spark.session import free_checkpoints
from duckdb_pst_spark.tables import table


def test_free_checkpoints_releases_blocks(spark, sf_dir):
    """free_checkpoints unpersists every resident RDD block — the
    between-independent-queries heap release (round-8 finding: resident
    localCheckpoint blocks degrade long measurement sessions and OOM'd
    a 16 GiB driver over three triangle builds)."""
    free_checkpoints(spark)  # start clean (other tests may leak)
    a = table(spark, sf_dir, "documents").select("doc_id").localCheckpoint(eager=True)
    b = table(spark, sf_dir, "orders").select("o_orderkey").localCheckpoint(eager=True)
    assert a.count() > 0 and b.count() > 0
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    assert jmap.size() >= 2
    n = free_checkpoints(spark)
    assert n >= 2
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == 0
