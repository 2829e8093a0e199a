"""Finalize a bounded streaming query into a stable batch DataFrame.

The registered ``q_stream_*`` queries run a REAL Structured Streaming
query (AvailableNow trigger) but must hand the driver contract a plain
DataFrame. The round-2 adapters used a memory sink + ``collect()`` —
fine for bounded window counts, but the collected set of a streaming
dedup is O(#distinct keys) on the DRIVER, a ceiling a wide key blows
through at scale.

These helpers finalize through a parquet sink instead: executors write
the result files, the driver never materializes a row, and the returned
DataFrame is a lazy scan of the sink directory. Sink dirs live under the
repo ``.cache`` (bounded: one result set per invocation) so the lazy
read stays valid after the streaming query object is gone.

- :func:`finalize_append` — append-mode queries (dedup, stream-stream
  join, flatMapGroupsWithState output): the native parquet file sink,
  exactly-once via its checkpoint + ``_spark_metadata`` commit log.
- :func:`finalize_complete` — complete-mode aggregations (needed when
  event time is TIMESTAMP_NTZ, which Spark cannot watermark):
  ``foreachBatch`` overwriting the sink per micro-batch, so the final
  micro-batch's full result is what remains.
"""

from __future__ import annotations

import uuid
from pathlib import Path

from pyspark.sql import DataFrame

_CACHE_DIR = Path(__file__).resolve().parent.parent.parent / ".cache"


_STALE_SECONDS = 24 * 3600


def _prune_stale() -> None:
    """Best-effort removal of finalize dirs older than a day — repeated
    test/driver runs must not accumulate sink directories forever."""
    import shutil
    import time

    try:
        now = time.time()
        for p in _CACHE_DIR.iterdir():
            if p.name.endswith(("_out", "_ck")) and p.is_dir():
                if now - p.stat().st_mtime > _STALE_SECONDS:
                    shutil.rmtree(p, ignore_errors=True)
    except OSError:
        pass


def _dirs(name: str) -> tuple[str, str]:
    _prune_stale()
    run = f"{name}_{uuid.uuid4().hex[:8]}"
    out = _CACHE_DIR / f"{run}_out"
    ck = _CACHE_DIR / f"{run}_ck"
    return str(out), str(ck)


def finalize_append(sdf: DataFrame, name: str) -> DataFrame:
    """Run an append-mode streaming DataFrame to completion through the
    parquet file sink; return a lazy scan of the result files."""
    out, ck = _dirs(name)
    q = (
        sdf.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # explicit schema: a zero-row result leaves no part files to infer from
    return sdf.sparkSession.read.schema(sdf.schema).parquet(out)


def finalize_complete(sdf: DataFrame, name: str, transform=None) -> DataFrame:
    """Run a complete-mode streaming aggregation to completion, keeping
    only the LAST micro-batch's full result (foreachBatch + overwrite);
    return a lazy scan of it.

    ``transform`` (optional) is a batch-DataFrame → batch-DataFrame
    function applied INSIDE foreachBatch before the write — the idiom
    for post-aggregation operators streaming cannot express natively
    (window ranks, joins against batch dims): each micro-batch's full
    aggregate state is re-derived through plain batch Catalyst, so the
    final sink holds the transformed final state exactly-once."""
    out, ck = _dirs(name)

    def write_batch(df: DataFrame, _batch_id: int) -> None:
        if transform is not None:
            df = transform(df)
        df.write.mode("overwrite").parquet(out)

    q = (
        sdf.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", ck)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    schema = sdf.schema
    if transform is not None:
        # derive the post-transform schema from an empty batch frame
        schema = transform(sdf.sparkSession.createDataFrame([], sdf.schema)).schema
    return sdf.sparkSession.read.schema(schema).parquet(out)
