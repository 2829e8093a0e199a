#!/usr/bin/env python
"""Multi-file PST scan scaling probe.

Mirrors the shape of the reference's headline benchmark — a count and a
scan over a 167-file corpus (/root/reference/README.md:8-56) — by
replicating the golden fixture N times and timing:

- ``stats_count``: planning-stats count(*) (A8 path — NBT crawl only,
  one task per file, no row data)
- ``scan_project``: full message scan with a 3-column projection
- ``read_limit_5``: limit pushed into planning (A6 — crawl stops early)

Usage: python tools/pst_scale_probe.py [N_FILES]
Prints one JSON line; numbers feed SCALE.md's scan-layer section.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

GOLD = "/root/reference/test/unittest.pst"


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 167
    from duckdb_pst_spark.session import get_spark
    from duckdb_pst_spark.sources.mspst.datasource import register
    from duckdb_pst_spark.sources.mspst.stats import pst_count

    spark = get_spark("pst-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    register(spark)

    with tempfile.TemporaryDirectory() as d:
        for i in range(n_files):
            shutil.copy(GOLD, os.path.join(d, f"archive_{i:04d}.pst"))
        glob = os.path.join(d, "*.pst")
        out: dict[str, float | int] = {"n_files": n_files}

        # Warm-up (same rationale as bench.py): the first Python
        # DataSource job spins up the executor-side Python worker pool
        # and pays module imports (~7 s one-time on 32 cores). A
        # long-running cluster amortizes that to zero; timing it would
        # measure process startup, not scan throughput.
        spark.read.format("pst").load(os.path.join(d, "archive_0000.pst")).count()

        t0 = time.perf_counter()
        out["rows_stats"] = pst_count(spark, glob)
        out["stats_count_s"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        df = (
            spark.read.format("pst")
            .load(glob)
            .select("pst_name", "subject", "message_class")
        )
        df.write.mode("overwrite").format("noop").save()
        out["scan_project_s"] = round(time.perf_counter() - t0, 3)

        # A7 pushdown: same projection via the `columns` scan option —
        # the reader never decodes bodies/recipients/attachments, vs the
        # Catalyst-only path above where pruning happens ABOVE the reader
        t0 = time.perf_counter()
        df2 = (
            spark.read.format("pst")
            .option("columns", "pst_name,subject,message_class")
            .load(glob)
        )
        df2.write.mode("overwrite").format("noop").save()
        out["scan_project_pushdown_s"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        lim = spark.read.format("pst").option("read_limit", 5).load(glob)
        out["rows_limit"] = lim.count()
        out["read_limit_5_s"] = round(time.perf_counter() - t0, 3)

        out["rows_per_s_scan"] = round(out["rows_stats"] / out["scan_project_s"])
        print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
