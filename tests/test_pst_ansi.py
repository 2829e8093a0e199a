"""ANSI (wVer 14/15) PST support at the NDB layer (VERDICT r8 item 7).

No public ANSI sample ships in this container and the reference's
golden unittest.pst is Unicode, so the fixture here is a minimal ANSI
file written from the [MS-PST] spec text with hardcoded byte offsets —
deliberately NOT importing ndb._FMT, so the writer and reader encode
the spec independently (a shared constant would make the test
self-validating). Coverage: header/ROOT parse (offset 164, 4-byte
BREFs), ANSI BTPAGE metadata at 496/trailer at 500, 12-byte BBTENTRY /
16-byte NBTENTRY leaves, 4-byte-BID XBLOCK fan-out, pad-free SLBLOCK.

Scope note (also in SURVEY §2.A): the LTP/messaging layers are
format-identical per [MS-PST] §2.3, so a full ANSI file reads end-to-end
through the same code; absent a real-world ANSI archive this NDB-layer
golden is the verifiable part, and per-file error tolerance (A18) skips
any file that still fails loudly.
"""

from __future__ import annotations

import struct

import pytest

from duckdb_pst_spark.sources.mspst.ndb import PstError, PstFile

PAGE = 512


def _page_ansi(entries: list[bytes], cb_ent: int, c_level: int, ptype: int) -> bytes:
    """ANSI BTPAGE: rgentries, then cEnt/cEntMax/cbEnt/cLevel at 496,
    PAGETRAILER (ptype, ptypeRepeat, wSig, bid, dwCRC) at 500."""
    body = b"".join(entries)
    assert len(body) <= 496
    page = bytearray(PAGE)
    page[: len(body)] = body
    struct.pack_into("<BBBB", page, 496, len(entries), 496 // cb_ent, cb_ent, c_level)
    struct.pack_into("<BBHII", page, 500, ptype, ptype, 0, 0, 0)
    return bytes(page)


@pytest.fixture(scope="module")
def ansi_pst(tmp_path_factory):
    """Minimal ANSI PST: one node (nid 0x21) whose data is an XBLOCK
    over two external blocks and whose subnode tree is one SLBLOCK."""
    # --- blocks (ANSI BIDs: bit1 set = internal) -------------------
    d1, d2 = b"HELLO-ANSI-1", b"-PART2"
    xblock = struct.pack("<BBHI", 0x01, 1, 2, len(d1) + len(d2)) + struct.pack(
        "<II", 4, 8
    )
    slblock = struct.pack("<BBH", 0x02, 0, 1) + struct.pack("<III", 0x2001, 4, 0)

    layout = {}  # bid -> (ib, payload)
    ib = 1024
    for bid, payload in ((4, d1), (8, d2), (6, xblock), (10, slblock)):
        layout[bid] = (ib, payload)
        ib += 256

    nbt_ib, bbt_ib = ib, ib + PAGE
    file_size = bbt_ib + PAGE

    # --- btree leaf pages ------------------------------------------
    nbt = _page_ansi(
        [struct.pack("<IIII", 0x21, 6, 10, 0)], cb_ent=16, c_level=0, ptype=0x81
    )
    bbt = _page_ansi(
        [
            struct.pack("<IIHH", bid, off, len(pl), 1)
            for bid, (off, pl) in sorted(layout.items())
        ],
        cb_ent=12,
        c_level=0,
        ptype=0x80,
    )

    # --- header ([MS-PST] §2.2.2.6 ANSI offsets, hardcoded) ---------
    hdr = bytearray(PAGE)
    hdr[0:4] = b"!BDN"
    struct.pack_into("<H", hdr, 10, 15)  # wVer: ANSI
    struct.pack_into("<I", hdr, 168, file_size)  # ROOT.ibFileEof
    struct.pack_into("<II", hdr, 184, 0, nbt_ib)  # ROOT.BREFNBT
    struct.pack_into("<II", hdr, 192, 0, bbt_ib)  # ROOT.BREFBBT
    hdr[461] = 0  # bCryptMethod = none

    buf = bytearray(file_size)
    buf[:PAGE] = hdr
    for bid, (off, pl) in layout.items():
        buf[off : off + len(pl)] = pl
    buf[nbt_ib : nbt_ib + PAGE] = nbt
    buf[bbt_ib : bbt_ib + PAGE] = bbt

    p = tmp_path_factory.mktemp("ansi") / "mini_ansi.pst"
    p.write_bytes(bytes(buf))
    return str(p)


def test_ansi_header_and_btrees(ansi_pst):
    with PstFile(ansi_pst) as f:
        assert f.unicode is False and f.w_ver == 15
        assert 0x21 in f.nbt
        e = f.nbt[0x21]
        assert (e.bid_data, e.bid_sub) == (6, 10)
        assert sorted(f.bbt) == [4, 6, 8, 10]
        assert f.bbt[8].cb == len(b"-PART2")


def test_ansi_xblock_data_tree(ansi_pst):
    with PstFile(ansi_pst) as f:
        assert f.node_bytes(0x21) == b"HELLO-ANSI-1-PART2"


def test_ansi_slblock_subnodes(ansi_pst):
    with PstFile(ansi_pst) as f:
        assert f.read_subnodes(10) == {0x2001: (4, 0)}


def test_unknown_wver_still_rejected(tmp_path):
    bad = bytearray(564)
    bad[0:4] = b"!BDN"
    struct.pack_into("<H", bad, 10, 20)  # neither ANSI nor Unicode
    p = tmp_path / "bad.pst"
    p.write_bytes(bytes(bad))
    with pytest.raises(PstError, match="unknown PST format"):
        PstFile(str(p))


def test_unicode_golden_still_reads():
    """The format branch must not disturb the Unicode path: the
    reference's golden file still parses with the pinned node count."""
    import os

    golden = "/root/reference/test/unittest.pst"
    if not os.path.exists(golden):
        pytest.skip("reference golden not present")
    with PstFile(golden) as f:
        assert f.unicode is True
        assert 0x21 in f.nbt  # message store
        assert len(f.nbt) > 16
