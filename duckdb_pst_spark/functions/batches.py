"""Arrow batch-shape helpers for mapInPandas kernels.

``spark.sql.execution.arrow.maxRecordsPerBatch`` is a SESSION-GLOBAL
conf read at execution time, so per-operator `spark.conf.set(...)` at
DataFrame-BUILD time races other operators in the same session: a media
DataFrame (~MB binary rows) executed after a narrow-row kernel raised
the cap to 8192 would allocate multi-GB Arrow batches per task — the
exact OOM the small cap exists to prevent.

Policy (round 3): the session default stays at the payload-safe 256
(`session.py`), nobody mutates it, and narrow-row kernels regain the
large-batch throughput INSIDE the kernel by concatenating incoming
pandas chunks up to a target row count with :func:`rebatch`. Batch
shape becomes a property of the kernel, not shared mutable state.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd


def rebatch(batches: Iterable[pd.DataFrame], target_rows: int = 8192) -> Iterator[pd.DataFrame]:
    """Coalesce an iterator of small pandas chunks into ~target_rows ones.

    The Arrow exchange hands mapInPandas kernels whatever batch size the
    session conf produced (256 rows with the payload-safe default); a
    compute-bound narrow-row kernel amortizes its per-batch fixed costs
    (DataFrame construction, BLAS call setup, output emission) by
    concatenating those chunks before processing. Memory stays bounded:
    at most target_rows narrow rows are buffered per task.
    """
    buf: list[pd.DataFrame] = []
    n = 0
    for pdf in batches:
        if not len(pdf):
            continue
        buf.append(pdf)
        n += len(pdf)
        if n >= target_rows:
            yield pd.concat(buf, ignore_index=True) if len(buf) > 1 else buf[0]
            buf, n = [], 0
    if buf:
        yield pd.concat(buf, ignore_index=True) if len(buf) > 1 else buf[0]
