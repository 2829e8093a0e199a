#!/usr/bin/env python
"""Structural mining pass for the permute table: parse every PC/TC with
the partial table and propose mappings for cipher bytes in *structural*
slots whose plain value is forced ([MS-PST] invariants):

- HID/HNID dwords: plain must be (allocIndex<<5 | block<<16) for a live
  allocation (or a subnode NID present in this node's subnode tree).
- HNPAGEMAP stragglers: ibHnpm/cAlloc/alloc-offset bytes, validated by
  monotone alloc arrays ending at ibHnpm.
- TCINFO: rgib monotone u16s; column descriptors from the MAPI tag
  vocabulary with ibData < row width, cbData ∈ {1,2,4,8}, iBit < cCols.

Run after tools/derive_permute.py; iterates to fixpoint and rewrites
tools/permute_partial.json.
"""

from __future__ import annotations

import json
import struct
import sys

sys.path.insert(0, "/root/repo")

from tools.derive_permute import PST, Table, first_blocks
from duckdb_pst_spark.sources.mspst.ndb import PstFile

UNK = -1


def load_table() -> Table:
    t = Table()
    t.dec = {int(k): v for k, v in json.load(open("/root/repo/tools/permute_partial.json")).items()}
    t.enc = {v: k for k, v in t.dec.items()}
    return t


def save_table(t: Table) -> None:
    json.dump(
        {str(k): v for k, v in sorted(t.dec.items())},
        open("/root/repo/tools/permute_partial.json", "w"),
    )


def dec_seq(t: Table, raw: bytes) -> list[int]:
    return [t.dec.get(b, UNK) for b in raw]


def u16(v: list[int], off: int) -> int | None:
    if v[off] == UNK or v[off + 1] == UNK:
        return None
    return v[off] | (v[off + 1] << 8)


def u32(v: list[int], off: int) -> int | None:
    parts = v[off : off + 4]
    if UNK in parts:
        return None
    return parts[0] | parts[1] << 8 | parts[2] << 16 | parts[3] << 24


def parse_pagemap(t: Table, raw: bytes) -> tuple[int, list[int]] | None:
    v = dec_seq(t, raw)
    ib = u16(v, 0)
    if ib is None or not (12 <= ib < len(raw) - 4):
        return None
    ca = u16(v, ib)
    if ca is None:
        return None
    allocs = []
    for i in range(ca + 1):
        a = u16(v, ib + 4 + 2 * i)
        if a is None:
            return None
        allocs.append(a)
    return ib, allocs


def propose_hid(t: Table, raw: bytes, off: int, allocs: list[int], sub_nids: set[int], src: str) -> int:
    """Force the 4 bytes at off to decode to a valid HID (block 0) or a
    subnode NID; propose iff exactly one candidate fits."""
    v = dec_seq(t, raw)
    if UNK not in v[off : off + 4]:
        return 0
    cands = []
    n_alloc = len(allocs) - 1
    for k in range(0, n_alloc + 1):
        plain = struct.pack("<I", k << 5)
        if all(
            v[off + j] in (UNK, plain[j]) and t.consistent(raw[off + j], plain[j])
            for j in range(4)
        ):
            # bijection within the dword
            seen: dict[int, int] = {}
            ok = True
            for j in range(4):
                c, pl = raw[off + j], plain[j]
                if seen.get(c, pl) != pl or (pl in {x for x in seen.values()} and seen.get(c) != pl and c not in seen):
                    ok = ok and seen.get(c, pl) == pl
                seen[c] = pl
            if ok:
                cands.append(plain)
    for nid in sub_nids:
        if not (0 <= nid <= 0xFFFFFFFF):
            continue
        plain = struct.pack("<I", nid)
        if all(
            v[off + j] in (UNK, plain[j]) and t.consistent(raw[off + j], plain[j])
            for j in range(4)
        ):
            cands.append(plain)
    uniq = {bytes(c) for c in cands}
    if len(uniq) != 1:
        return 0
    plain = uniq.pop()
    added = 0
    for j in range(4):
        if v[off + j] == UNK:
            added += t.propose(raw[off + j], plain[j], src)
    return added


def mine_once(t: Table, p: PstFile) -> int:
    added = 0
    for nid, be, raw in first_blocks(p):
        if raw[2] != t.enc.get(0xEC):
            continue
        pm = parse_pagemap(t, raw)
        if pm is None:
            continue
        ib, allocs = pm
        e = p.nbt.get(nid)
        sub_nids = set()
        if e is not None and e.bid_sub:
            sub_nids = set(p.read_subnodes(e.bid_sub))
        sig = t.dec.get(raw[3])
        # hidUserRoot dword at 4
        added += propose_hid(t, raw, 4, allocs, set(), f"userroot:{nid}")
        v = dec_seq(t, raw)
        root = u32(v, 4)
        if root is None or (root >> 16) != 0 or root == 0:
            continue
        idx = root >> 5
        if idx <= 0 or idx >= len(allocs):
            continue
        start, end = allocs[idx - 1], allocs[idx]
        if sig == 0xBC:
            # BTH header: hidRoot dword at start+4
            if v[start] == 0xB5:
                added += propose_hid(t, raw, start + 4, allocs, set(), f"bthroot:{nid}")
                v = dec_seq(t, raw)
                rr = u32(v, start + 4)
                if rr and (rr >> 16) == 0 and 0 < (rr >> 5) < len(allocs):
                    rs, re_ = allocs[(rr >> 5) - 1], allocs[rr >> 5]
                    # records: [pid u16][type u16][hnid u32]; var-size types
                    # point at allocations or subnodes
                    for roff in range(rs, re_ - 7, 8):
                        ptype = u16(v, roff + 2)
                        if ptype is None:
                            continue
                        if ptype in (0x001F, 0x001E, 0x0102, 0x0040, 0x0048, 0x0014, 0x0005, 0x1003, 0x101F, 0x1102):
                            added += propose_hid(t, raw, roff + 4, allocs, sub_nids, f"pcval:{nid}")
        elif sig == 0x7C:
            # TCINFO at user root: [7C][cCols][rgib 4xu16][hidRowIndex][hnidRows]
            if v[start] == 0x7C:
                added += propose_hid(t, raw, start + 10, allocs, set(), f"tcrowidx:{nid}")
                added += propose_hid(t, raw, start + 14, allocs, sub_nids, f"tcrows:{nid}")
    return added


def main() -> None:
    p = PstFile(PST)
    p._decode = lambda b: b
    t = load_table()
    total = 0
    for rnd in range(20):
        a = mine_once(t, p)
        total += a
        print(f"mine round {rnd}: +{a} (total known {len(t.dec)})")
        if a == 0:
            break
    save_table(t)


if __name__ == "__main__":
    main()
