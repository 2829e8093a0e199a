"""[MS-PST] NDB (node database) layer — Unicode (wVer ≥ 23) and ANSI
(wVer 14/15) PST files.

Structures implemented from the public spec ([MS-PST] §2.2):
HEADER/ROOT, BTPAGE/PAGETRAILER (§2.2.2.7), BTENTRY/BBTENTRY/NBTENTRY,
BLOCKTRAILER (§2.2.2.8), XBLOCK/XXBLOCK data trees (§2.2.2.8.3.2),
SLBLOCK/SIBLOCK subnode trees (§2.2.2.8.3.3).

ANSI (pre-Outlook-2003) files differ from Unicode ONLY in integer
widths and offsets at this layer: 32-bit BIDs/IBs (4-byte BREFs), ROOT
at header offset 164 instead of 180, page metadata at 496 instead of
488, and no alignment padding in the S/X block headers. The LTP and
messaging layers above ([MS-PST] §2.3-2.4: HN/BTH/PC/TC) are
format-identical, so everything downstream of `node_bytes`/
`read_subnodes` works unchanged. The per-format struct layouts live in
one table (_FMT) so each read site branches on data, not code paths.

The reference reaches the same layer through its vendored SDK (which
reads both formats); parity citations: partition planning walks this
NBT (/root/reference/src/table_function.cpp:214-239), typed readers
filter node ids by type (table_function.cpp:133-175).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

MAGIC = b"!BDN"
PAGE_SIZE = 512
PTYPE_BBT = 0x80
PTYPE_NBT = 0x81

# nid types ([MS-PST] §2.2.2.1)
NID_TYPE_HID = 0x00
NID_TYPE_INTERNAL = 0x01
NID_TYPE_NORMAL_FOLDER = 0x02
NID_TYPE_SEARCH_FOLDER = 0x03
NID_TYPE_NORMAL_MESSAGE = 0x04
NID_TYPE_ATTACHMENT = 0x08
NID_TYPE_HIERARCHY_TABLE = 0x0D
NID_TYPE_CONTENTS_TABLE = 0x0E
NID_TYPE_ASSOC_CONTENTS_TABLE = 0x0F
NID_TYPE_RECIPIENT_TABLE = 0x12
NID_TYPE_ATTACHMENT_TABLE = 0x13

NID_MESSAGE_STORE = 0x21
NID_NAME_TO_ID_MAP = 0x61
NID_ROOT_FOLDER = 0x122
NID_RECIPIENT_TABLE = 0x692
NID_ATTACHMENT_TABLE = 0x671

CRYPT_NONE = 0
CRYPT_PERMUTE = 1
CRYPT_CYCLIC = 2

# Per-format NDB layouts ([MS-PST] §2.2.2.5-2.2.2.8): every value is
# (unicode, ansi), selected by PstFile.unicode. ANSI = 32-bit BIDs/IBs,
# ROOT at 164 vs 180, page metadata at 496 vs 488, no pad in SLBLOCK.
_FMT: dict[str, tuple] = {
    "ib_eof": (("<Q", 184), ("<I", 168)),        # ROOT.ibFileEof
    "bref_nbt": (("<QQ", 216), ("<II", 184)),    # ROOT.BREFNBT (bid, ib)
    "bref_bbt": (("<QQ", 232), ("<II", 192)),    # ROOT.BREFBBT
    "crypt_off": (513, 461),                     # HEADER.bCryptMethod
    "page_meta_off": (488, 496),                 # BTPAGE cEnt/cEntMax/cbEnt/cLevel
    "page_ptype_off": (496, 500),                # PAGETRAILER.ptype
    "btentry": ("<QQQ", "<III"),                 # btkey, BREF(bid, ib)
    "bbtentry": ("<QQHH", "<IIHH"),              # BREF(bid, ib), cb, cRef
    "nbtentry": ("<QQQI", "<IIII"),              # nid, bidData, bidSub, nidParent
    "bid_fmt": ("Q", "I"),                       # rgbid element in X/XX blocks
    "sl_entries_off": (8, 4),                    # SLBLOCK: Unicode pads 4 bytes
    "slentry": ("<QQQ", "<III"),                 # nid, bidData, bidSub
    "sientry": ("<QQ", "<II"),                   # nid, bid
}


def nid_type(nid: int) -> int:
    return nid & 0x1F


@dataclass(frozen=True)
class NbtEntry:
    nid: int
    bid_data: int
    bid_sub: int
    nid_parent: int


@dataclass(frozen=True)
class BbtEntry:
    bid: int
    ib: int
    cb: int
    cref: int


class PstError(ValueError):
    pass


class PstFile:
    """Random-access NDB reader over one PST file (Unicode or ANSI).

    Opens its own file handle — per-task instantiation, never shared
    across partitions (the reference's non-thread-safe-handle rule,
    /root/reference/src/function_state.cpp:59-71).
    """

    def __init__(self, path: str):
        from duckdb_pst_spark.sources.mspst.fsio import open_pst

        self.path = path
        self._f = open_pst(path)  # local, http(s) ranged, or pyarrow FS (A2)
        hdr = self._f.read(564)
        if hdr[:4] != MAGIC:
            raise PstError(f"{path}: not a PST file (bad magic {hdr[:4]!r})")
        (self.w_ver,) = struct.unpack_from("<H", hdr, 10)
        if self.w_ver not in (14, 15) and self.w_ver < 23:
            raise PstError(
                f"{path}: unknown PST format (wVer={self.w_ver}); "
                "expected ANSI (14/15) or Unicode (>=23)"
            )
        self.unicode = self.w_ver >= 23

        def fmt(key: str):
            v = _FMT[key]
            return v[0] if self.unicode else v[1]

        self._fmt = fmt
        # ROOT ([MS-PST] §2.2.2.5; offset 180 Unicode / 164 ANSI)
        f, off = fmt("ib_eof")
        (self.ib_file_eof,) = struct.unpack_from(f, hdr, off)
        f, off = fmt("bref_nbt")
        self.nbt_bref = struct.unpack_from(f, hdr, off)  # (bid, ib)
        f, off = fmt("bref_bbt")
        self.bbt_bref = struct.unpack_from(f, hdr, off)
        self.crypt_method = hdr[fmt("crypt_off")]
        if self.crypt_method == CRYPT_PERMUTE:
            from duckdb_pst_spark.sources.mspst.crypt import permute_decode

            self._decode = permute_decode
        elif self.crypt_method == CRYPT_NONE:
            self._decode = lambda b: b
        else:
            raise PstError(f"{path}: crypt method {self.crypt_method} not supported")
        self._bbt: dict[int, BbtEntry] | None = None
        self._nbt: dict[int, NbtEntry] | None = None

    def close(self) -> None:
        self._f.close()

    def __enter__(self) -> "PstFile":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # ---------------------------------------------------------------- pages

    def _read_page(self, ib: int) -> bytes:
        self._f.seek(ib)
        page = self._f.read(PAGE_SIZE)
        if len(page) != PAGE_SIZE:
            raise PstError(f"short page read at {ib}")
        return page

    def _walk_btree(
        self, ib: int, ptype: int, out: list[tuple], _seen: set[int] | None = None
    ) -> None:
        # corruption guard: a crafted/corrupt page graph must fail fast
        # with PstError (A18 skips the file), not recurse unboundedly —
        # a real BTPAGE tree never revisits a page
        seen = _seen if _seen is not None else set()
        if ib in seen:
            raise PstError(f"btree page cycle at ib {ib:#x}")
        seen.add(ib)
        page = self._read_page(ib)
        c_ent, c_ent_max, cb_ent, c_level = struct.unpack_from(
            "<BBBB", page, self._fmt("page_meta_off")
        )
        trailer_ptype = page[self._fmt("page_ptype_off")]
        if trailer_ptype != ptype:
            raise PstError(f"page at {ib}: ptype {trailer_ptype:#x} != {ptype:#x}")
        for i in range(c_ent):
            off = i * cb_ent
            if c_level > 0:  # BTENTRY → recurse
                _key, bid, child_ib = struct.unpack_from(
                    self._fmt("btentry"), page, off
                )
                self._walk_btree(child_ib, ptype, out, seen)
            elif ptype == PTYPE_BBT:
                bid, ib_blk, cb, cref = struct.unpack_from(
                    self._fmt("bbtentry"), page, off
                )
                out.append(BbtEntry(bid, ib_blk, cb, cref))
            else:
                nid, bid_data, bid_sub, nid_parent = struct.unpack_from(
                    self._fmt("nbtentry"), page, off
                )
                out.append(NbtEntry(int(nid), bid_data, bid_sub, nid_parent))

    @property
    def bbt(self) -> dict[int, BbtEntry]:
        if self._bbt is None:
            rows: list[BbtEntry] = []
            self._walk_btree(self.bbt_bref[1], PTYPE_BBT, rows)
            self._bbt = {e.bid: e for e in rows}
        return self._bbt

    @property
    def nbt(self) -> dict[int, NbtEntry]:
        if self._nbt is None:
            rows: list[NbtEntry] = []
            self._walk_btree(self.nbt_bref[1], PTYPE_NBT, rows)
            self._nbt = {e.nid: e for e in rows}
        return self._nbt

    # --------------------------------------------------------------- blocks

    @staticmethod
    def _bid_internal(bid: int) -> bool:
        return bool(bid & 2)

    def _read_block(self, bid: int) -> bytes:
        """Raw block payload (cb bytes; decoded iff external)."""
        e = self.bbt.get(bid) or self.bbt.get(bid & ~1)
        if e is None:
            raise PstError(f"bid {bid:#x} not in BBT")
        self._f.seek(e.ib)
        data = self._f.read(e.cb)
        if len(data) != e.cb:
            raise PstError(f"short block read bid {bid:#x}")
        if not self._bid_internal(bid):
            data = self._decode(data)
        return data

    def read_data(self, bid: int, _depth: int = 0) -> list[bytes]:
        """Data-tree expansion: external bid → [payload]; internal bid →
        XBLOCK/XXBLOCK fan-out, in order ([MS-PST] §2.2.2.8.3.2)."""
        if _depth > 3:  # spec tree is XXBLOCK→XBLOCK→data: depth ≤ 2;
            raise PstError(f"data tree too deep at bid {bid:#x}")  # cycle guard
        if bid == 0:
            return []
        if not self._bid_internal(bid):
            return [self._read_block(bid)]
        blk = self._read_block(bid)
        btype, c_level, c_ent = struct.unpack_from("<BBH", blk, 0)
        if btype != 0x01:
            raise PstError(f"bid {bid:#x}: expected XBLOCK btype 0x01, got {btype:#x}")
        bids = struct.unpack_from(f"<{c_ent}{self._fmt('bid_fmt')}", blk, 8)
        out: list[bytes] = []
        for b in bids:
            if c_level == 1:
                out.append(self._read_block(b))
            else:  # XXBLOCK → XBLOCKs
                out.extend(self.read_data(b, _depth + 1))
        return out

    def read_subnodes(self, bid_sub: int, _depth: int = 0) -> dict[int, tuple[int, int]]:
        """Subnode tree → {nid: (bidData, bidSub)} ([MS-PST] §2.2.2.8.3.3)."""
        out: dict[int, tuple[int, int]] = {}
        if _depth > 2:  # spec: SIBLOCK→SLBLOCK, 2 levels; cycle guard
            raise PstError(f"subnode tree too deep at bid {bid_sub:#x}")
        if bid_sub == 0:
            return out
        blk = self._read_block(bid_sub)
        btype, c_level, c_ent = struct.unpack_from("<BBH", blk, 0)
        if btype != 0x02:
            raise PstError(f"bid {bid_sub:#x}: expected SLBLOCK btype 0x02, got {btype:#x}")
        base = self._fmt("sl_entries_off")  # Unicode pads 4 bytes, ANSI none
        if c_level == 0:
            f = self._fmt("slentry")
            step = struct.calcsize(f)
            for i in range(c_ent):
                nid, bd, bs = struct.unpack_from(f, blk, base + step * i)
                # SLENTRY.nid is NID-sized (4 bytes) padded to 8 in Unicode
                # files; the upper DWORD is undefined and MUST be ignored
                # ([MS-PST] §2.2.2.8.3.3.1.1)
                out[int(nid) & 0xFFFFFFFF] = (bd, bs)
        else:  # SIENTRY → nested SLBLOCKs
            f = self._fmt("sientry")
            step = struct.calcsize(f)
            for i in range(c_ent):
                _nid, b = struct.unpack_from(f, blk, base + step * i)
                out.update(self.read_subnodes(b, _depth + 1))
        return out

    def node_bytes(self, nid: int) -> bytes:
        """Concatenated data payload of a top-level node."""
        e = self.nbt.get(nid)
        if e is None:
            raise PstError(f"nid {nid} not in NBT")
        return b"".join(self.read_data(e.bid_data))
