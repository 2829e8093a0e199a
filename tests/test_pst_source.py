"""PST source-layer behavior tests — mirrors the reference's
table_function_parameters.test / read_pst_folders.test /
read_unittest_pst.test assertions (SURVEY.md §5) against the fixture
parquet readers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_pst_spark.sources import fixtures, pst

N_FILES = fixtures.DEFAULT_N_FILES
N_MSGS = 12  # golden mix: 5 notes + 2 contacts + 1 dlist + 1 appt + 2 sticky + 1 task


def test_folder_golden_tree(spark):
    """16 folders per file; root is its own parent (read_unittest_pst.test:14-37)."""
    f = pst.read_pst_folders(spark, "fixtures/fix000.pst")
    assert f.count() == 16
    root = f.filter(F.col("node_id") == 290).collect()
    assert len(root) == 1 and root[0].parent_node_id == 290
    names = {r.display_name for r in f.collect()}
    assert {"Inbox", "Tasks", "Search Root", "Top of Outlook data file", ""} <= names


def test_glob_scan_covers_all_files(spark):
    """Glob expansion at bind (table_function.cpp:48-61)."""
    assert pst.read_pst_messages(spark, "fixtures/*.pst").count() == N_FILES * N_MSGS
    assert pst.read_pst_messages(spark, "fixtures/fix001.pst").count() == N_MSGS
    assert pst.read_pst_messages(spark).count() == N_FILES * N_MSGS


def test_class_filtered_readers(spark):
    """A5 planning-time class filter per typed function (README.md:25-37 mix)."""
    counts = {
        pst.read_pst_notes: 5,
        pst.read_pst_contacts: 2,
        pst.read_pst_appointments: 1,
        pst.read_pst_sticky_notes: 2,
        pst.read_pst_tasks: 1,
        pst.read_pst_distribution_lists: 1,
    }
    for reader, n in counts.items():
        assert reader(spark, "fixtures/fix000.pst").count() == n, reader.__name__


def test_body_truncation_byte_math(spark):
    """read_body_size_bytes=100 → exactly 50 chars of UTF-16
    (row_serializer.cpp:95-108; table_function_parameters.test:19-28)."""
    m = pst.read_pst_messages(spark, "fixtures/fix000.pst", read_body_size_bytes=100)
    lens = {
        r.n
        for r in m.filter(F.col("body_html").isNotNull())
        .select(F.length("body_html").alias("n"))
        .collect()
    }
    assert lens == {50}
    # 0 = unlimited (row_serializer.cpp:296-311)
    full = pst.read_pst_messages(spark, "fixtures/fix000.pst", read_body_size_bytes=0)
    assert (
        full.filter(F.col("body_html").isNotNull())
        .filter(F.length("body_html") > 50)
        .count()
        > 0
    )


def test_attachment_bytes_gating(spark):
    """A14: bytes NULL unless read_attachment_body=true
    (table_function_parameters.test:30-40)."""
    first = F.element_at(F.col("attachments"), 1)["bytes"]
    gated = pst.read_pst_messages(spark, "fixtures/fix000.pst")
    assert (
        gated.filter("has_attachments").filter(first.isNotNull()).count() == 0
    )
    opened = pst.read_pst_messages(
        spark, "fixtures/fix000.pst", read_attachment_body=True
    )
    assert (
        opened.filter("has_attachments").filter(first.isNotNull()).count() > 0
    )


def test_read_limit(spark):
    """A6: read_limit caps planned rows (table_function_parameters.test:13-17)."""
    assert pst.read_pst_messages(spark, read_limit=5).count() == 5
    assert pst.read_pst_messages(spark, read_limit=10_000).count() == N_FILES * N_MSGS


def test_one_pst_name_per_path(spark):
    """Invariant: one pst_name per pst_path (read_pst_folders.test:25-29)."""
    f = pst.read_pst_folders(spark)
    assert (
        f.groupBy("pst_path")
        .agg(F.countDistinct("pst_name").alias("n"))
        .filter(F.col("n") != 1)
        .count()
        == 0
    )


def test_schema_inheritance(spark):
    """Subtype schemas = PST block + NOTE block + subtype block
    (schema.hpp:254-260 composition rule)."""
    msg_cols = pst.read_pst_messages(spark).columns
    assert msg_cols[:5] == [
        "pst_path",
        "pst_name",
        "record_key",
        "node_id",
        "parent_node_id",
    ]
    for reader, extra in [
        (pst.read_pst_contacts, "given_name"),
        (pst.read_pst_appointments, "start_time"),
        (pst.read_pst_sticky_notes, "note_color"),
        (pst.read_pst_tasks, "due_date"),
        (pst.read_pst_distribution_lists, "member_node_ids"),
    ]:
        cols = reader(spark).columns
        assert cols[: len(msg_cols)] == msg_cols, reader.__name__
        assert extra in cols, reader.__name__


def test_projection_prunes_scan(spark):
    """A7: a 2-column projection must reach the parquet scan as a pruned
    ReadSchema (Catalyst column pruning — the reference's
    projection_pushdown flag, pst_extension.cpp:35)."""
    m = pst.read_pst_messages(spark).select("node_id", "subject")
    plan = m._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema" in plan
    schema_part = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "subject" in schema_part
    assert "body" not in schema_part and "attachments" not in schema_part


@pytest.mark.parametrize("bad", ["fixtures/nope*.pst", "no/such.pst"])
def test_empty_glob_is_empty_not_error(spark, bad):
    """Unmatched glob → empty result (reference skips bad files, A18)."""
    assert pst.read_pst_messages(spark, bad).count() == 0


def test_streaming_pst_ingest(spark, tmp_path):
    """spark.readStream.format("pst"): each newly arrived archive becomes
    a microbatch planned/read by the unchanged batch code path."""
    import shutil

    from duckdb_pst_spark.sources.mspst.datasource import register

    register(spark)
    gold = "/root/reference/test/unittest.pst"
    shutil.copy(gold, tmp_path / "a.pst")
    q = (
        spark.readStream.format("pst")
        .option("table", "messages")
        .load(str(tmp_path / "*.pst"))
        .groupBy("pst_path")
        .count()
        .writeStream.format("memory")
        .queryName("pst_stream")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("select sum(count) c from pst_stream").collect()[0].c == 12
        shutil.copy(gold, tmp_path / "b.pst")  # late-arriving archive
        q.processAllAvailable()
        got = spark.sql(
            "select pst_path, count from pst_stream order by pst_path"
        ).collect()
        assert [r["count"] for r in got] == [12, 12]
    finally:
        q.stop()


def test_streaming_restart_from_checkpoint_is_exactly_once(spark, tmp_path):
    """Kill the stream, add an archive, restart with the SAME checkpoint:
    already-ingested archives must not re-emit (offset log resume) and
    the new archive's rows appear exactly once."""
    import shutil

    from duckdb_pst_spark.sources.mspst.datasource import register

    register(spark)
    gold = "/root/reference/test/unittest.pst"
    land = tmp_path / "land"
    land.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    shutil.copy(gold, land / "a.pst")

    def run_once():
        q = (
            spark.readStream.format("pst")
            .option("table", "messages")
            .load(str(land / "*.pst"))
            .select("pst_path", "node_id")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    first = spark.read.parquet(out).count()
    assert first == 12
    shutil.copy(gold, land / "b.pst")
    run_once()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 24  # 12 old (not re-emitted) + 12 new
    by_file = {}
    for r in rows:
        by_file[r.pst_path] = by_file.get(r.pst_path, 0) + 1
    assert sorted(by_file.values()) == [12, 12]
