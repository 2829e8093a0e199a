#!/usr/bin/env python
"""Derive the NDB_CRYPT_PERMUTE byte-substitution table empirically from
a PST file with known contents (the reference's golden test fixture),
using only public [MS-PST] structural invariants + the golden strings the
reference's own tests pin (/root/reference/test/sql/read_unittest_pst.test).

The permute cipher is a fixed byte bijection applied to external data
blocks ([MS-PST] §5.1). Constraint sources:

  1. HNHDR: byte2 of every heap first-block decodes to 0xEC; byte3 to
     bClientSig (0xBC property contexts / 0x7C table contexts).
  2. Global frequency: by far the most common plaintext byte is 0x00.
  3. Known UTF-16LE strings (golden folder names, subjects, bodies):
     located by their equality pattern with interleaved enc(0x00).
  4. HNPAGEMAP trailer math: map sits at end of block; rgibAlloc[0]=12.
  5. PC BTH records: sorted (propid, type) pairs from the MAPI property
     vocabulary; TC row ids equal NBT node ids.

Writes the table into duckdb_pst_spark/sources/mspst/crypt.py.
"""

from __future__ import annotations

import struct
import sys
from collections import Counter

sys.path.insert(0, "/root/repo")

from duckdb_pst_spark.sources.mspst.ndb import PstFile, nid_type

PST = "/root/reference/test/unittest.pst"

GOLDEN_STRINGS = [
    "This UI hasn't changed since I used Outlook on Win9x. Awesome.",
    "Conversation Action Settings",
    "Top of Outlook data file",
    "Quick Step Settings",
    "Outlook Data File",
    "Cat Support Group",
    "Hopper Cat (hopper@intellekt.fyi)",
    "Linus Cat (linus@intellekt.fyi)",
    "hopper@intellekt.fyi",
    "linus@intellekt.fyi",
    "Deleted Items",
    "Search Root",
    "Sent Items",
    "RSS Feeds",
    "Calendar",
    "Contacts",
    "Journal",
    "Drafts",
    "Outbox",
    "Inbox",
    "Notes",
    "Tasks",
    "IPF.Note.OutlookHomepage",
    "IPF.Configuration",
    "IPF.Appointment",
    "IPF.StickyNote",
    "IPF.Contact",
    "IPF.Journal",
    "IPF.Task",
    "IPF.Note",
    "IPM.Appointment",
    "IPM.StickyNote",
    "IPM.DistList",
    "IPM.Contact",
    "IPM.Note",
    "IPM.Task",
    "SMTP",
]


class Conflict(Exception):
    pass


class Table:
    """cipher→plain partial bijection with conflict detection."""

    def __init__(self):
        self.dec: dict[int, int] = {}
        self.enc: dict[int, int] = {}

    def propose(self, cipher: int, plain: int, src: str) -> bool:
        if cipher in self.dec:
            if self.dec[cipher] != plain:
                raise Conflict(f"{src}: cipher {cipher:#04x} → {self.dec[cipher]:#04x} vs {plain:#04x}")
            return False
        if plain in self.enc:
            if self.enc[plain] != cipher:
                raise Conflict(f"{src}: plain {plain:#04x} ← {self.enc[plain]:#04x} vs {cipher:#04x}")
            return False
        self.dec[cipher] = plain
        self.enc[plain] = cipher
        return True

    def consistent(self, cipher: int, plain: int) -> bool:
        if cipher in self.dec and self.dec[cipher] != plain:
            return False
        if plain in self.enc and self.enc[plain] != cipher:
            return False
        return True


def external_blocks(p: PstFile):
    for bid, e in sorted(p.bbt.items()):
        if not (bid & 2):
            p._f.seek(e.ib)
            yield bid, e, p._f.read(e.cb)


def first_blocks(p: PstFile):
    out = []
    for nid, e in p.nbt.items():
        bid = e.bid_data
        if bid == 0:
            continue
        if bid & 2:
            blk = p._read_block(bid)
            btype, lvl, c = struct.unpack_from("<BBH", blk, 0)
            if btype != 1:
                continue
            bid = struct.unpack_from(f"<{c}Q", blk, 8)[0]
            if bid & 2:
                continue
        be = p.bbt.get(bid) or p.bbt.get(bid & ~1)
        p._f.seek(be.ib)
        out.append((nid, be, p._f.read(be.cb)))
        # subnode heaps are first-blocks too (recipient/attachment TCs)
        for snid, (bd, _bs) in p.read_subnodes(e.bid_sub).items():
            if bd and not (bd & 2):
                sbe = p.bbt.get(bd) or p.bbt.get(bd & ~1)
                p._f.seek(sbe.ib)
                out.append((snid, sbe, p._f.read(sbe.cb)))
    return out


def attack_headers(t: Table, p: PstFile) -> None:
    """HNHDR invariants over heap first blocks."""
    fb = first_blocks(p)
    c2 = Counter(b[2] for _, _, b in fb)
    ec_cipher, n = c2.most_common(1)[0]
    assert n >= len(fb) * 0.7, c2
    t.propose(ec_cipher, 0xEC, "hnhdr:bSig")
    heapish = [x for x in fb if x[2][2] == ec_cipher]
    c3 = Counter(b[3] for _, _, b in heapish)
    (pc_c, _), (tc_c, _) = c3.most_common(2)
    # PCs outnumber TCs among *node* heaps? decide via node type instead:
    pc_votes = Counter(
        b[3] for nid, _, b in heapish if nid_type(nid) in (2, 3, 4, 8, 0x21, 6, 7, 0x61)
    )
    pc_c = pc_votes.most_common(1)[0][0]
    tc_votes = Counter(
        b[3]
        for nid, _, b in heapish
        if nid_type(nid) in (0x0D, 0x0E, 0x0F, 0x12, 0x13, 0x16, 0x17)
    )
    tc_c = tc_votes.most_common(1)[0][0]
    t.propose(pc_c, 0xBC, "hnhdr:PC")
    t.propose(tc_c, 0x7C, "hnhdr:TC")


def attack_frequency(t: Table, p: PstFile) -> None:
    freq = Counter()
    for _, _, raw in external_blocks(p):
        freq.update(raw)
    t.propose(freq.most_common(1)[0][0], 0x00, "freq:zero")


def _match_at(t: Table, raw: bytes, off: int, s: str, z: int) -> dict[int, int] | None:
    """Try to match UTF-16LE golden string at offset; return new mappings."""
    n = len(s)
    if off + 2 * n > len(raw):
        return None
    plain_of: dict[int, int] = {}
    cipher_of: dict[int, int] = {}
    new: dict[int, int] = {}
    for i, ch in enumerate(s):
        hi = raw[off + 2 * i + 1]
        if hi != z:
            return None
        c = raw[off + 2 * i]
        pl = ord(ch)
        if not t.consistent(c, pl):
            return None
        if c in plain_of and plain_of[c] != pl:
            return None
        if pl in cipher_of and cipher_of[pl] != c:
            return None
        plain_of[c] = pl
        cipher_of[pl] = c
        if c not in t.dec:
            new[c] = pl
    return new


def attack_strings(t: Table, p: PstFile) -> int:
    z = t.enc[0x00]
    added = 0
    for s in GOLDEN_STRINGS:
        hits = []
        for _, _, raw in external_blocks(p):
            for off in range(0, len(raw) - 2 * len(s) + 1):
                m = _match_at(t, raw, off, s, z)
                if m is not None:
                    hits.append(m)
        # accept only unambiguous, agreeing hits
        if not hits:
            continue
        merged: dict[int, int] = {}
        ok = True
        for m in hits:
            for c, pl in m.items():
                if merged.get(c, pl) != pl:
                    ok = False
                merged[c] = pl
        if not ok:
            continue
        for c, pl in merged.items():
            if t.consistent(c, pl):
                added += t.propose(c, pl, f"str:{s[:16]}")
    return added


def attack_pagemap(t: Table, p: PstFile) -> int:
    """HNPAGEMAP at end of first blocks: ibHnpm = cb-4-2*(cAlloc+1),
    rgibAlloc[0] = 12 (right after the 12-byte HNHDR)."""
    added = 0
    ec = t.enc[0xEC]
    for _, be, raw in first_blocks(p):
        if raw[2] != ec:
            continue
        cb = be.cb
        cands = []
        for c_alloc in range(1, 250):
            ib = cb - 4 - 2 * (c_alloc + 1)
            if ib < 12:
                break
            checks = [
                (raw[0], ib & 0xFF),
                (raw[1], ib >> 8),
                (raw[ib], c_alloc & 0xFF),
                (raw[ib + 1], c_alloc >> 8),
                (raw[ib + 4], 12),
                (raw[ib + 5], 0),
                (raw[cb - 2], ib & 0xFF),  # rgibAlloc[cAlloc] == ibHnpm
                (raw[cb - 1], ib >> 8),
            ]
            if all(t.consistent(c, pl) for c, pl in checks):
                cands.append(checks)
        if len(cands) == 1:
            for c, pl in cands[0]:
                added += t.propose(c, pl, "pagemap")
    return added


def main() -> None:
    p = PstFile(PST)
    p._decode = lambda b: b  # raw cipher domain
    t = Table()
    attack_headers(t, p)
    attack_frequency(t, p)
    for rnd in range(12):
        a = attack_strings(t, p)
        b = attack_pagemap(t, p)
        print(f"round {rnd}: +{a} strings, +{b} pagemap, total {len(t.dec)}")
        if a + b == 0:
            break
    print("known:", len(t.dec), "of 256")
    missing = [x for x in range(256) if x not in t.dec]
    print("missing ciphers:", len(missing))
    import json

    with open("/root/repo/tools/permute_partial.json", "w") as f:
        json.dump({str(k): v for k, v in sorted(t.dec.items())}, f)


if __name__ == "__main__":
    main()


# ---------------------------------------------------------------- templates
# A template = list of (offset, plain) pairs + var slots checked for
# small-value plausibility. Matching proposes all unknown mappings at once;
# accepted only when the window location is unambiguous within its block set.

def _try_template(t: Table, raw: bytes, off: int, pairs: list[tuple[int, int]]) -> dict[int, int] | None:
    new: dict[int, int] = {}
    plain_of: dict[int, int] = {}
    cipher_of: dict[int, int] = {}
    for o, pl in pairs:
        if off + o >= len(raw):
            return None
        c = raw[off + o]
        if not t.consistent(c, pl):
            return None
        if c in plain_of and plain_of[c] != pl:
            return None
        if pl in cipher_of and cipher_of[pl] != c:
            return None
        plain_of[c] = pl
        cipher_of[pl] = c
        if c not in t.dec:
            new[c] = pl
    return new


def _record(idx: int, propid: int, ptype: int, value: list[int | None]) -> list[tuple[int, int]]:
    base = 8 * idx
    pairs = [
        (base, propid & 0xFF),
        (base + 1, propid >> 8),
        (base + 2, ptype & 0xFF),
        (base + 3, ptype >> 8),
    ]
    for j, v in enumerate(value):
        if v is not None:
            pairs.append((base + 4 + j, v))
    return pairs


def folder_pc_templates() -> list[list[tuple[int, int]]]:
    """Folder PC BTH record arrays, sorted by propid ([MS-PST] §2.4.4.1.1
    requires DisplayName/ContentCount/ContentUnreadCount/Subfolders; golden
    values from read_unittest_pst.test:22-37)."""
    out = []
    golden = [  # (content_count, unread, has_subfolders, has_container_class)
        (0, 0, 1, False),  # root 290
        (0, 0, 1, False),  # top of store
        (0, 0, 0, False),  # search root
        (0, 0, 0, False),  # deleted items (no class in golden)
        (4, 0, 0, True),
        (3, 0, 0, True),
        (2, 0, 0, True),
        (1, 0, 0, True),
        (0, 0, 0, True),
    ]
    for cnt, unread, has_sub, has_class in golden:
        recs = [
            _record(0, 0x3001, 0x001F, [None, 0, 0, 0]),
            _record(1, 0x3602, 0x0003, [cnt, 0, 0, 0]),
            _record(2, 0x3603, 0x0003, [unread, 0, 0, 0]),
            _record(3, 0x360A, 0x000B, [has_sub, 0, 0, 0]),
        ]
        if has_class:
            recs.append(_record(4, 0x3613, 0x001F, [None, 0, 0, 0]))
        out.append([p for r in recs for p in r])
    return out


def attack_templates(t: Table, p: PstFile, templates: list[list[tuple[int, int]]], blocks) -> int:
    added = 0
    for tpl in templates:
        hits = []
        for raw in blocks:
            for off in range(0, len(raw) - max(o for o, _ in tpl)):
                m = _try_template(t, raw, off, tpl)
                if m is not None:
                    hits.append(m)
        merged: dict[int, int] = {}
        ok = bool(hits)
        for m in hits:
            for c, pl in m.items():
                if merged.get(c, pl) != pl:
                    ok = False
                merged[c] = pl
        if ok:
            for c, pl in merged.items():
                if t.consistent(c, pl):
                    added += t.propose(c, pl, "tpl")
    return added
