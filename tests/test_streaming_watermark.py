"""Pin Spark's ACTUAL watermark behavior in bounded AvailableNow replays.

The q_stream_* oracles are deliberately watermark-independent: their
results equal the batch answer over the full bounded input. These tests
pin the empirical Spark 4.1 facts that make that the only sound design —
if a Spark upgrade changes them, the streaming family needs re-auditing:

1. The late-input filter lags the PLANNED watermark by one more batch:
   batch N is planned (and reports progress) with the watermark derived
   from data through batch N-1, but its input filter runs against batch
   N-1's PLANNED value — i.e. data through batch N-2. And the filter is
   window-END-based for windowed aggregation: a row older than the
   filter watermark whose window is still open is admitted. Corollaries:
   a single-file replay (all data in batch 0) and even a TWO-file replay
   can never drop anything — which is exactly why q_stream_closed_windows
   stages its input as one file with a complete-batch oracle, and why
   q_stream_late_data needs THREE files to exhibit a real drop.
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
        stage = tempfile.mkdtemp(prefix="stream_", dir=d)  # fresh per call
        now = time.time()
        for i, rows in enumerate(file_rows):
            p = os.path.join(d, f"gen_{i}")
            spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
                "overwrite"
            ).parquet(p)
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


def test_two_batch_replay_cannot_drop(spark, two_file_stage):
    """The late-input filter lags the PLANNED watermark by one batch:
    batch N filters with batch N-1's planned value, so batch 1 — though
    planned (and reported in progress) with wm 09:35 — still filters
    with batch 0's planned wm of 0 and admits a 05:00 straggler.
    Corollary: a two-file replay can never drop anything; staging a
    drop scenario takes THREE files (q_stream_late_data relies on
    this). The admitted straggler's window closes under the final
    watermark (10:00), so it emits with count 1."""
    stage = two_file_stage(
        [
            [(1, T(2024, 1, 1, 10, 0)), (2, T(2024, 1, 1, 10, 5))],
            [(3, T(2024, 1, 1, 5, 0)), (4, T(2024, 1, 1, 10, 30))],
        ]
    )
    agg = (
        _stream(spark, stage)
        .groupBy(F.window("ltz", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.expr("unix_micros(w.start)").alias("ws_us"), "cnt")
    )
    q = _run(agg, "wm_twofile")
    planned = [
        p["eventTime"].get("watermark")
        for p in q.recentProgress
        if p["eventTime"].get("watermark")
    ]
    # batch 1 really was planned with a nonzero watermark …
    assert any(w.startswith("2024-01-01T09:35") for w in planned), planned
    # … and the straggler was still admitted (filter lagged to wm 0).
    rows = [(r.ws_us // 3_600_000_000 % 24, r.cnt) for r in spark.table("wm_twofile").collect()]
    assert rows == [(5, 1)], rows


def test_late_filter_is_window_end_based(spark, two_file_stage):
    """Batch 2 filters with batch 1's planned wm (09:35). A row at
    09:10 — OLDER than that watermark but belonging to the still-open
    [09:00, 10:00) window — is ADMITTED (the filter compares window
    end, not row time), while an 08:50 row whose window end 09:00 is
    at/before the watermark is dropped. Final wm 11:30 closes both
    surviving windows."""
    stage = two_file_stage(
        [
            [(1, T(2024, 1, 1, 10, 0)), (2, T(2024, 1, 1, 10, 5))],
            [(3, T(2024, 1, 1, 10, 30))],
            [(4, T(2024, 1, 1, 9, 10)), (5, T(2024, 1, 1, 8, 50)), (6, T(2024, 1, 1, 12, 0))],
        ]
    )
    agg = (
        _stream(spark, stage)
        .groupBy(F.window("ltz", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.expr("unix_micros(w.start)").alias("ws_us"), "cnt")
    )
    _run(agg, "wm_wend")
    rows = sorted(
        (r.ws_us // 3_600_000_000 % 24, r.cnt) for r in spark.table("wm_wend").collect()
    )
    assert rows == [(9, 1), (10, 3)], rows


def test_dedup_within_watermark_reemission(spark, two_file_stage):
    """dropDuplicatesWithinWatermark state-expiry semantics, both sides:

    - A duplicate arriving IN THE SAME BATCH that evicts its original's
      state is still suppressed — the dedup probe runs before eviction,
      so {key 1 at 10:00, wm-bump to 13:30, dup 1 at 10:20} emits key 1
      once even though batch 2 removes its state row.
    - A duplicate arriving a batch AFTER the eviction is RE-EMITTED —
      the bounded-state trade the API documents. Same stage plus one
      spacer batch: key 1 emits twice.

    q_stream_dedup_wm's two-batch replay sits strictly inside the
    no-evict regime these probes bracket, which is what makes its
    DISTINCT oracle exact."""
    from collections import Counter

    def run(files, name):
        stage = two_file_stage(files)
        dedup = (
            _stream(spark, stage)
            .dropDuplicatesWithinWatermark(["event_id"])
            .select("event_id")
        )
        _run(dedup, name)
        return Counter(r.event_id for r in spark.table(name).collect())

    same_batch = run(
        [
            [(1, T(2024, 1, 1, 10, 0))],
            [(2, T(2024, 1, 1, 14, 0))],
            [(1, T(2024, 1, 1, 10, 20))],
        ],
        "wmdd_same",
    )
    assert same_batch == {1: 1, 2: 1}, same_batch

    later_batch = run(
        [
            [(1, T(2024, 1, 1, 10, 0))],
            [(2, T(2024, 1, 1, 14, 0))],
            [(3, T(2024, 1, 1, 14, 5))],
            [(1, T(2024, 1, 1, 14, 10))],
        ],
        "wmdd_later",
    )
    assert later_batch == {1: 2, 2: 1, 3: 1}, later_batch
