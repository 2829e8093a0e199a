"""Scan/job progress reporting (SURVEY §2.A A19).

The reference surfaces a live progress % for a PST scan as
``nodes_processed / planned cardinality``
(/root/reference/src/table_function.cpp:359-365). Spark's unit of
progress is the task, and the cluster already tracks it — this module
turns that into the same queryable number via the public
``StatusTracker`` API instead of re-counting rows in Python:

- the denominator is total tasks across the job-group's stages (for a
  PST scan that is the planned partition count — `pst_scan_info()`
  additionally exposes the planned ROW denominator, A20);
- the numerator is completed tasks, sampled by a daemon thread while the
  action runs.

This is driver-side observation only: zero cost on executors, works for
ANY action (scan, join, write), and at 100 TB it is the number a
progress bar or an orchestrator's heartbeat reads.
"""

from __future__ import annotations

import threading
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import SparkSession


@dataclass
class ProgressSample:
    t: float
    completed_tasks: int
    total_tasks: int

    @property
    def pct(self) -> float:
        return 100.0 * self.completed_tasks / self.total_tasks if self.total_tasks else 0.0


@dataclass
class JobProgress:
    """Context manager: run actions inside it, read ``pct()`` live (from
    another thread) or ``samples`` afterwards.

    >>> with JobProgress(spark) as p:
    ...     df.count()
    >>> p.pct()      # 100.0
    >>> p.samples    # the observed climb
    """

    spark: SparkSession
    interval: float = 0.05
    group: str = field(default_factory=lambda: f"progress-{uuid.uuid4().hex[:8]}")
    samples: list[ProgressSample] = field(default_factory=list)
    _stop: threading.Event = field(default_factory=threading.Event)
    _thread: threading.Thread | None = None

    def _snapshot(self) -> ProgressSample:
        sc = self.spark.sparkContext
        tracker = sc.statusTracker()
        # dedupe stages shared between AQE sub-jobs, and ignore stages
        # that never ran (AQE skips reused/elided exchanges: numTasks > 0
        # but no task ever starts — counting them understates progress
        # forever)
        stages: dict[int, tuple[int, int]] = {}
        for job_id in tracker.getJobIdsForGroup(self.group):
            info = tracker.getJobInfo(job_id)
            if info is None:
                continue
            for sid in info.stageIds:
                st = tracker.getStageInfo(sid)
                if st is None or (st.numActiveTasks == 0 and st.numCompletedTasks == 0):
                    continue
                stages[sid] = (st.numCompletedTasks, st.numTasks)
        done = sum(d for d, _ in stages.values())
        total = sum(t for _, t in stages.values())
        return ProgressSample(time.monotonic(), done, total)

    def _poll(self) -> None:
        while not self._stop.is_set():
            try:
                self.samples.append(self._snapshot())
            except Exception:  # py4j race during shutdown — observation only
                pass
            self._stop.wait(self.interval)

    def __enter__(self) -> "JobProgress":
        self.spark.sparkContext.setJobGroup(self.group, "duckdb_pst_spark progress scope")
        self._thread = threading.Thread(target=self._poll, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
        try:
            self.samples.append(self._snapshot())
        finally:
            # leave the session group-less for subsequent queries
            self.spark.sparkContext.setLocalProperty("spark.jobGroup.id", None)

    def pct(self) -> float:
        """Latest observed progress %, 0.0 before any stage submits."""
        return self.samples[-1].pct if self.samples else 0.0
