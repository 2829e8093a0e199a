"""Pin Spark's ACTUAL watermark behavior in bounded AvailableNow replays.

The q_stream_* oracles are deliberately watermark-independent: their
results equal the batch answer over the full bounded input. These tests
pin the empirical Spark 4.1 facts that make that the only sound design —
if a Spark upgrade changes them, the streaming family needs re-auditing:

1. The late-input filter runs against the watermark the batch was
   PLANNED with, which lags the data by one batch: rows late relative
   to the previous batch's watermark are dropped; rows only-late
   relative to data in their own or the immediately preceding batch are
   admitted and merge into state. Corollary: in a single-file replay
   (all data in batch 0, planned with watermark 0) NOTHING can be
   dropped — which is exactly why q_stream_closed_windows stages its
   input as one file and why its oracle is the complete batch count
   over closed windows.
2. Eviction/emission uses the advancing watermark: append mode emits a
   window when window_end <= ms-truncated(max event time) - delay
   (inclusive), complete as of that batch.
3. dropDuplicates evicts no state within a drained AvailableNow replay
   (eviction would happen in a subsequent batch that never runs), so
   replayed duplicates stay suppressed — the bounded replay IS
   exactly-once.

Both runs use the NTZ→epoch-micros→LTZ bridge (timezone-independent by
construction: timestampdiff from the NTZ epoch, never a session-tz cast).
"""

from __future__ import annotations

import datetime
import glob
import os
import shutil
import tempfile
import time
from collections import Counter

import pytest
from pyspark.sql import functions as F

T = datetime.datetime
_TO_US = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
_SCHEMA = "event_id long, ts timestamp_ntz"


@pytest.fixture()
def two_file_stage(spark):
    """Builder: stage two parquet files with ordered mtimes so
    maxFilesPerTrigger=1 replays them as two deterministic microbatches."""
    d = tempfile.mkdtemp(prefix="dps_wm_")

    def build(file_rows: list[list[tuple[int, datetime.datetime]]]) -> str:
        stage = os.path.join(d, "stream")
        os.makedirs(stage)
        now = time.time()
        for i, rows in enumerate(file_rows):
            p = os.path.join(d, f"gen_{i}")
            spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.parquet(p)
            dst = os.path.join(stage, f"f{i}.parquet")
            shutil.copy(glob.glob(p + "/*.parquet")[0], dst)
            mt = now - 100 + i  # strictly increasing mtimes = batch order
            os.utime(dst, (mt, mt))
        return stage

    yield build
    shutil.rmtree(d, ignore_errors=True)


def _stream(spark, stage):
    return (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage)
        .withColumn("ltz", F.expr(f"timestamp_micros({_TO_US})"))
        .withWatermark("ltz", "30 minutes")
    )


def _run(sdf, name):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def test_late_filter_lags_one_batch(spark, two_file_stage):
    """Three batches. Batch 0 (10:00/10:05/05:01) is planned with wm 0 —
    nothing droppable. Batch 1 (10:10) is planned with wm 09:35; its
    eviction emits the 05:00 window complete (count 1, the 05:01 row).
    Batch 2 brings a row at 05:00 — late relative to batch 1's
    watermark — and it is DROPPED by the input filter, not re-opened:
    no second emission of the 05:00 window. The 10:00 window (end
    11:00 > final wm 10:00) stays open and never emits, so the total
    output is exactly one row."""
    stage = two_file_stage(
        [
            [(1, T(2024, 1, 1, 10, 0)), (2, T(2024, 1, 1, 10, 5)), (9, T(2024, 1, 1, 5, 1))],
            [(8, T(2024, 1, 1, 10, 10))],
            [(3, T(2024, 1, 1, 5, 0)), (7, T(2024, 1, 1, 10, 30))],
        ]
    )
    agg = (
        _stream(spark, stage)
        .groupBy(F.window("ltz", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.expr("unix_micros(w.start)").alias("ws_us"), "cnt")
    )
    _run(agg, "wm_lag")
    rows = [(r.ws_us // 3_600_000_000 % 24, r.cnt) for r in spark.table("wm_lag").collect()]
    assert rows == [(5, 1)], rows


def test_late_row_admitted_while_filter_wm_still_zero(spark, two_file_stage):
    """Two batches. The same 05:00 straggler arriving one batch EARLIER
    (batch 1, planned with wm 0) is admitted, merges into the live
    05:00 window, and the window emits once with the COMPLETE count of
    2 — late-row admission depends on the lagged planning watermark,
    not on how late the event time is."""
    stage = two_file_stage(
        [
            [(1, T(2024, 1, 1, 10, 0)), (2, T(2024, 1, 1, 10, 5)), (9, T(2024, 1, 1, 5, 1))],
            [(3, T(2024, 1, 1, 5, 0)), (7, T(2024, 1, 1, 10, 30))],
        ]
    )
    agg = (
        _stream(spark, stage)
        .groupBy(F.window("ltz", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.expr("unix_micros(w.start)").alias("ws_us"), "cnt")
    )
    _run(agg, "wm_admit")
    rows = [(r.ws_us // 3_600_000_000 % 24, r.cnt) for r in spark.table("wm_admit").collect()]
    assert rows == [(5, 2)], rows


def test_replayed_duplicates_stay_suppressed(spark, two_file_stage):
    """dropDuplicates keyed on event_id: batch 2 replays every batch-1 row
    (at-least-once upstream). Within a bounded replay no state is
    evicted — even for keys far older than the watermark — so every
    replay is suppressed and the result is exactly the distinct set."""
    rows1 = [
        (0, T(2024, 1, 1, 5, 0)),  # far older than wm after batch 1
        (4, T(2024, 1, 1, 9, 35)),  # exactly at wm
        (1, T(2024, 1, 1, 10, 0)),
        (2, T(2024, 1, 1, 10, 5)),
    ]
    stage = two_file_stage([rows1, rows1])
    dedup = _stream(spark, stage).dropDuplicates(["event_id"]).select("event_id")
    q = _run(dedup, "wm_dedup")
    emitted = Counter(r.event_id for r in spark.table("wm_dedup").collect())
    assert emitted == {0: 1, 4: 1, 1: 1, 2: 1}, emitted
    state = [
        (p["stateOperators"][0].get("numRowsTotal"), p["stateOperators"][0].get("numRowsRemoved"))
        for p in q.recentProgress
        if p["stateOperators"]
    ]
    # state never shrinks during the drained replay (no eviction batch)
    assert all(removed == 0 for _, removed in state), state
    assert state[-1][0] == 4, state
