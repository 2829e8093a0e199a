"""Planning-stats ``count(*)`` — A8 parity.

The reference's headline number is a count over 72 GiB answered in half a
second because no row data is ever read: planning crawls each file's NBT,
partitions carry exact row counts, and DuckDB rewrites the aggregate to a
``COLUMN_DATA_SCAN`` over the stats (``PSTReadCardinality`` /
``PSTPartitionStats``, /root/reference/src/table_function.cpp:325-351;
README.md:8-20).

Spark's Python DataSource API has no aggregate-pushdown hook, so the same
capability is a first-class helper: :func:`pst_count` runs the NBT-only
crawl — one Spark task per file, the 167-file Enron corpus counts in
parallel — and never materializes a message row.  Typed tables probe only
the ``PR_MESSAGE_CLASS`` property per node, the reference's planning-time
class filter (A5, table_function.cpp:133-175; class reader
typed_bag.hpp:90-107).
"""

from __future__ import annotations

import sys

PR_MESSAGE_CLASS = 0x001A


def file_count(path: str, table: str = "messages") -> int:
    """Exact row count for one PST file without reading row data.

    ``messages``/``folders`` need only the NBT (node-id type bits);
    typed tables additionally probe the class property per node.  An
    unreadable file is logged and counted as 0 (A18 error tolerance,
    table_function.cpp:228-235).
    """
    from duckdb_pst_spark.sources.mspst import ltp
    from duckdb_pst_spark.sources.mspst.datasource import CLASS_FILTER
    from duckdb_pst_spark.sources.mspst.messaging import PstArchive

    try:
        a = PstArchive(path)
    except Exception as exc:
        print(f"pst: skipping unreadable file {path}: {exc}", file=sys.stderr)
        return 0
    try:
        if table == "folders":
            return len(a.folder_nids())
        nids = a.message_nids()
        want = CLASS_FILTER.get(table)
        if want is None:  # messages: NBT crawl alone is exact
            return len(nids)
        n = 0
        for nid in nids:
            try:
                e = a.pst.nbt[nid]
                pc = ltp.PropertyContext(a.pst, e.bid_data, e.bid_sub)
                cls = pc.get(PR_MESSAGE_CLASS) or ""
            except Exception:
                continue  # unparseable node → not counted (A18)
            if cls.startswith(want):
                n += 1
        return n
    finally:
        a.close()


def pst_count(spark, path: str, table: str = "messages") -> int:
    """``count(*)`` over a PST glob/URL from planning stats only.

    One task per file; each task walks btree pages, never message rows —
    the COLUMN_DATA_SCAN analog.  Runs driver-side for a single file to
    skip job-launch overhead (matching the reference, where planning is
    always in-process).
    """
    from duckdb_pst_spark.sources.mspst.fsio import expand_paths

    files = expand_paths(path)
    if not files:
        return 0
    if len(files) == 1:
        return file_count(files[0], table)
    sc = spark.sparkContext
    # cap slices so a 100k-file corpus doesn't become 100k tiny tasks;
    # each task then counts a run of files
    slices = min(len(files), 4 * sc.defaultParallelism)
    return (
        sc.parallelize(files, slices)
        .map(lambda f: file_count(f, table))
        .sum()
    )
