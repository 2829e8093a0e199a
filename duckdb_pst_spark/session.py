"""SparkSession factory with scale-conscious defaults.

Tuned for the contest harness (local[32], 128 GiB) but every knob here is
the one you'd set on a 1000-executor cluster too: AQE for runtime
re-planning (skew joins, partition coalescing), Arrow for any Python
exchange, parquet aggregate pushdown so ``count(*)`` is answered from
footers (the Spark analogue of the reference's stats-based count —
/root/reference/src/table_function.cpp:325-351).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "duckdb-pst-spark",
    *,
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # local mode: ~2x cores keeps all cores busy under AQE coalescing.
        # On a real cluster this would scale with executor count / data size.
        shuffle_partitions = max(2 * cpus, 32)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow exchange batch size: the payload-safe setting. This conf
        # is session-global and read at EXECUTION time, so per-operator
        # mutation races other operators — with ~MB binary rows
        # (multimodal/ops.py) anything large is a multi-GB allocation per
        # task. Narrow-row kernels regain large-batch throughput inside
        # the kernel via functions/batches.rebatch, not by raising this.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # DSv2 parquet read path: aggregate pushdown (count/min/max from
        # footers — the reference's COLUMN_DATA_SCAN analogue) only exists
        # in v2 scans; correctness is identical on v1 (driver default).
        .config("spark.sql.sources.useV1SourceList", "")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def free_checkpoints(spark: SparkSession) -> int:
    """Unpersist every persisted RDD in the session; returns how many.

    The operator library materializes shared subtrees with
    ``localCheckpoint(eager=True)`` (signature sets, oriented edge
    lists, dedup representatives). Those blocks are never freed by
    Catalyst: in a long-lived session running many independent queries
    they accumulate on the driver heap until GC pressure degrades
    every later job — measured in round 8, an interleaved nine-query
    measurement session read up to 2× slower than fresh per-query
    processes, and a three-run triangle sweep OOM'd a 16 GiB heap on
    its second run (SCALE.md round-8 weak-list section).

    Call BETWEEN independent queries — a checkpointed DataFrame from
    before the call cannot be recomputed afterwards (the checkpoint
    truncated its lineage), so free only when prior results are fully
    materialized or discarded. On a production cluster this is the
    between-jobs ``unpersist`` a pipeline scheduler issues."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    rdds = list(jmap.values())
    for rdd in rdds:
        rdd.unpersist(False)
    return len(rdds)
