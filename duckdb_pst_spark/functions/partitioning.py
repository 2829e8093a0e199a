"""Parallelism guard for compute-bound stages.

A parquet scan's partition count is bounded by file count and row-group
layout — a corpus written as a few huge files with giant row groups
(exactly what single-writer exports produce) can deliver 1-2 scan
partitions no matter what ``spark.sql.files.maxPartitionBytes`` says,
because a row group is indivisible. A narrow scan stage doesn't care;
a COMPUTE-BOUND stage (interpreted higher-order expressions, Arrow
Python kernels) then runs on 2 of N cores while the rest idle.

:func:`spread` is the guard, with two conditions so it can never hurt:

- the input has FEWER partitions than the cluster's parallelism
  (otherwise the scan already feeds every core), AND
- the input is big enough that each core gets a meaningful slice —
  judged by parquet FOOTER ROW COUNTS (exact, read without a job), not
  by Catalyst's ``sizeInBytes``: that estimate is the COMPRESSED file
  size, and highly repetitive text compresses so well (a replicated
  corpus measured 80:1) that byte thresholds call a 5M-row
  compute-bound input "small". Same failure mode as AQE's
  compressed-size skew detection, documented in SCALE.md.

Below the row threshold the repartition shuffle plus per-task overhead
costs more than the single-partition run (measured: the sf0.1 pipeline
regressed 2.5 → 8.0 s under an unconditional repartition). On a
well-laid-out lake (many files, row groups ≤ 128 MB) the scan already
delivers ≥ cores partitions and spread() is a no-op. Measured at 100x
volume on local[32] (one giant-row-group file per table): heavy-hitters
36.5 → 8.3 s, minhash-LSH 26.8 → 4.9 s, brute-force KNN 12.8 → 1.8 s,
full pipeline 39.6 → 13.8 s.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: minimum rows per core before a repartition pays for itself ahead of a
#: compute-bound stage (below this, task/shuffle overhead wins)
MIN_ROWS_PER_CORE = 2000


def input_row_count(df: DataFrame) -> int | None:
    """Exact row count from the scan's parquet footers (no Spark job);
    None when the input isn't local parquet files."""
    try:
        import pyarrow.parquet as pq

        files = df.inputFiles()
        if not files:
            return None
        total = 0
        for f in files:
            if f.startswith("file:"):
                f = f[len("file:") :]
                while f.startswith("//"):
                    f = f[1:]
            total += pq.ParquetFile(f).metadata.num_rows
        return total
    except Exception:
        return None


def spread(df: DataFrame, factor: int = 2) -> DataFrame:
    """Repartition ``df`` to ``factor`` x defaultParallelism iff the scan
    under-delivers partitions AND the row volume amortizes the shuffle."""
    sc = df.sparkSession.sparkContext
    cores = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= cores:
        return df
    rows = input_row_count(df)
    if rows is None or rows < cores * MIN_ROWS_PER_CORE:
        return df
    return df.repartition(factor * cores)
