"""Remote IO (A2 parity) — the PST reader over http(s).

The reference streams PSTs through DuckDB's virtual FileSystem, httpfs
included (README https demo /root/reference/README.md:58-69; file shim
src/pst/duckdb_filesystem.cpp:12-36).  These tests serve the same
fixture PST from a local HTTP server — once with ``Range`` support
(object-store behavior) and once without (forces the whole-body
fallback) — and assert byte- and row-level equality with local reads.
"""

from __future__ import annotations

import functools
import http.server
import os
import re
import threading

import pytest

PST = "/root/reference/test/unittest.pst"
DOCROOT = os.path.dirname(PST)


class _RangeHandler(http.server.SimpleHTTPRequestHandler):
    """SimpleHTTPRequestHandler plus minimal single-range GET support."""

    def log_message(self, *a):  # keep pytest output clean
        pass

    def send_head(self):
        self.range = None
        m = re.match(r"bytes=(\d+)-(\d*)$", self.headers.get("Range", ""))
        if not m:
            return super().send_head()
        path = self.translate_path(self.path)
        try:
            f = open(path, "rb")
        except OSError:
            self.send_error(404)
            return None
        size = os.fstat(f.fileno()).st_size
        start = int(m.group(1))
        end = int(m.group(2)) if m.group(2) else size - 1
        end = min(end, size - 1)
        if start >= size:
            f.close()
            self.send_error(416)
            return None
        self.send_response(206)
        self.send_header("Content-Type", "application/octet-stream")
        self.send_header("Content-Range", f"bytes {start}-{end}/{size}")
        self.send_header("Content-Length", str(end - start + 1))
        self.end_headers()
        f.seek(start)
        data = f.read(end - start + 1)
        f.close()
        import io as _io

        return _io.BytesIO(data)


class _NoRangeHandler(http.server.SimpleHTTPRequestHandler):
    """Stock handler: ignores Range, always answers 200 full-body."""

    def log_message(self, *a):
        pass


def _serve(handler_cls):
    handler = functools.partial(handler_cls, directory=DOCROOT)
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}/unittest.pst"


@pytest.fixture(scope="module")
def range_url():
    srv, url = _serve(_RangeHandler)
    yield url
    srv.shutdown()


@pytest.fixture(scope="module")
def norange_url():
    srv, url = _serve(_NoRangeHandler)
    yield url
    srv.shutdown()


def test_http_range_file_random_access(range_url):
    from duckdb_pst_spark.sources.mspst.fsio import HttpRangeFile

    with open(PST, "rb") as f:
        gold = f.read()
    h = HttpRangeFile(range_url, block_size=4096, max_blocks=4)
    assert h._size == len(gold)
    # reads that hit one block, span blocks, start mid-block, and run
    # past EOF; interleaved seeks exercise the LRU cache
    for start, n in [(0, 16), (4090, 100), (1, 4095), (len(gold) - 7, 50), (100_000, 65536)]:
        h.seek(start)
        assert h.read(n) == gold[start : start + n]
    h.seek(-10, os.SEEK_END)
    assert h.read() == gold[-10:]
    assert h._whole is None  # ranged path stayed ranged


def test_http_whole_body_fallback(norange_url):
    from duckdb_pst_spark.sources.mspst.fsio import HttpRangeFile

    with open(PST, "rb") as f:
        gold = f.read()
    h = HttpRangeFile(norange_url)
    h.seek(1234)
    assert h.read(100) == gold[1234:1334]
    assert h._whole == gold  # server ignored Range → cached whole body


def test_pst_archive_over_http(range_url):
    """The full NDB/LTP/messaging stack runs unchanged over ranged http."""
    from duckdb_pst_spark.sources.mspst.messaging import PstArchive

    local = PstArchive(PST)
    remote = PstArchive(range_url)
    try:
        lf = sorted((f["node_id"], f["display_name"]) for f in local.folders())
        rf = sorted((f["node_id"], f["display_name"]) for f in remote.folders())
        assert rf == lf and len(rf) == 16
    finally:
        local.close()
        remote.close()


def test_spark_read_pst_over_http(spark, range_url):
    """spark.read.format("pst").load(<url>) matches the local read."""
    from duckdb_pst_spark.sources.mspst.datasource import register

    register(spark)
    gold = (
        spark.read.format("pst")
        .option("table", "messages")
        .load(PST)
        .selectExpr("node_id", "subject", "message_class")
    )
    got = (
        spark.read.format("pst")
        .option("table", "messages")
        .load(range_url)
        .selectExpr("node_id", "subject", "message_class")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, gold.collect()))


def test_expand_paths_local_glob_and_remote_verbatim():
    from duckdb_pst_spark.sources.mspst.fsio import expand_paths

    assert expand_paths(os.path.join(DOCROOT, "*.pst")) == [PST]
    assert expand_paths("http://x/y.pst") == ["http://x/y.pst"]
    assert expand_paths(f"file://{PST}") == [f"file://{PST}"]
