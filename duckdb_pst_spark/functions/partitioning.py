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
  judged by the parquet footers' UNCOMPRESSED byte size (exact, read
  without a job), not by Catalyst's ``sizeInBytes``: that estimate is
  the COMPRESSED file size, and highly repetitive text compresses so
  well (a replicated corpus measured 80:1) that compressed-byte
  thresholds call a 5M-row compute-bound input "small". Same failure
  mode as AQE's compressed-size skew detection, documented in
  SCALE.md. Uncompressed bytes also separate wide text rows (~1 KB
  each — repartition pays off from ~50k rows) from narrow embedding
  rows (~0.3 KB — the same row count is NOT worth a shuffle), which a
  row-count threshold cannot.

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

#: minimum UNCOMPRESSED input bytes per core before a repartition pays
#: for itself ahead of a compute-bound stage (below this, task/shuffle
#: overhead wins — measured on both wide-text and narrow-vector inputs).
#: 256 KiB: at a 10x-replica volume (50k docs, ~8 MB of footer bytes
#: after dictionary encoding) the 1 MiB setting left the kernels on the
#: scan's single partition — pipeline 20.3 s vs 10.7 s and minhash-vec
#: 5.7 s vs 3.6 s once spread fires; at sf0.1 (2.5 MB) both settings
#: are a no-op, so the small-corpus guard survives the lower bar.
MIN_BYTES_PER_CORE = 1 << 18


def input_uncompressed_bytes(df: DataFrame) -> int | None:
    """Uncompressed encoded-page size from the scan's parquet footers (no
    Spark job); None when the input isn't local parquet files.

    Caveat: ``total_byte_size`` counts ENCODED pages, so dictionary
    encoding still understates logical width on highly repetitive
    columns (a 100x-replicated corpus measures ~3x small) — but that is
    an order of magnitude closer to compute volume than the compressed
    size Catalyst reports (~80x small on the same data), and the
    threshold has margin for it."""
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
            md = pq.ParquetFile(f).metadata
            total += sum(
                md.row_group(i).total_byte_size for i in range(md.num_row_groups)
            )
        return total
    except Exception:
        return None


def spread(df: DataFrame, factor: int = 2) -> DataFrame:
    """Repartition ``df`` to ``factor`` x defaultParallelism iff the scan
    under-delivers partitions AND the data volume amortizes the shuffle."""
    sc = df.sparkSession.sparkContext
    cores = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= cores:
        return df
    nbytes = input_uncompressed_bytes(df)
    if nbytes is None or nbytes < cores * MIN_BYTES_PER_CORE:
        return df
    return df.repartition(factor * cores)
