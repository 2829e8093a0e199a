"""Pure-numpy JPEG codec (ITU-T T.81, public spec).

Decoder: baseline sequential DCT (SOF0/SOF1) AND progressive DCT
(SOF2 — the dominant web encoding: spectral selection, successive
approximation, EOB runs, per T.81 Annex G), 8-bit, grayscale or YCbCr,
arbitrary sampling factors (4:4:4 / 4:2:2 / 4:2:0 replicate-upsampled),
restart markers, multi-table DQT/DHT, 0xFF00 byte unstuffing, IDCT as an
orthonormal 8×8 matrix sandwich. Arithmetic coding, lossless/hierarchical
SOFs, and 12-bit precision raise ``NotImplementedError``.

Encoder: baseline 4:4:4 (or grayscale) with the Annex-K example
quantization (quality-scaled, IJG formula) and Huffman tables, plus a
progressive encoder (``jpeg_encode_progressive``) emitting a
libjpeg-style scan script (DC first+refine, spectral-selection AC
bands, successive-approximation AC refines) — they exist so tests can
round-trip KNOWN pixels: JPEG is lossy, so the baseline assertion is a
quantization-error bound, while the progressive assertion is EXACT
pixel equality against the baseline decode of the same coefficients
(both encoders share one coefficient pass, so any decode divergence is
a real scan-path bug, not quantization noise). The transform pair is
additionally pinned by exact DCT/IDCT matrix identities and a
hand-built Huffman stream test (tests/test_multimodal.py).

Everything here derives from the published standard; no codec library
is involved anywhere.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- DCT
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
        )
# orthonormal: block_freq = _C @ block @ _C.T ; inverse = _C.T @ F @ _C

_ZIGZAG = np.array(
    [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
     12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
     35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
     58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]
)

# Annex K.1 example luminance / chrominance quantization tables
_QL = np.array(
    [16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
     14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
     18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
     49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99]
)
_QC = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99]
)

# Annex K.3 typical Huffman tables: (bits[1..16], huffval)
_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
         list(range(12)))
_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
         list(range(12)))
_AC_L = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_C = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Canonical Huffman per T.81 C.2: {(length, code) -> symbol}."""
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    return {v: (ln, c) for (ln, c), v in _huff_decode_table(bits, vals).items()}


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing
    and restart-marker awareness."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.buf[self.pos]
        if b == 0xFF:
            nxt = self.buf[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:  # EOI or other marker: pad with 1-bits per spec
                self.bits = (self.bits << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.bits = (self.bits << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_restart(self) -> None:
        """Consume a restart marker at the current byte boundary."""
        self.bits = 0
        self.nbits = 0
        while self.buf[self.pos] != 0xFF or self.buf[self.pos + 1] == 0x00:
            self.pos += 1
        if 0xD0 <= self.buf[self.pos + 1] <= 0xD7:
            self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _extend(v: int, t: int) -> int:
    """T.81 F.12: map t-bit magnitude to signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _decode_huff(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | r.read_bit()
        s = table.get((ln, code))
        if s is not None:
            return s
    raise ValueError("invalid Huffman code")


def jpeg_salvage(raw: bytes) -> tuple[np.ndarray, int, int]:
    """Error-tolerant decode for the corrupt JPEGs every web/mail crawl
    contains: returns (image, mcus_decoded, mcus_total). Decoding stops
    at the first entropy error (baseline streams without restart markers
    cannot resync) and the undecoded remainder stays mid-gray — the
    salvage behavior a training-data pipeline wants instead of dropping
    the whole asset. A clean stream returns mcus_decoded == mcus_total
    and the identical pixels to ``jpeg_decode``."""
    return _jpeg_decode_impl(raw, tolerant=True)


def jpeg_decode(raw: bytes) -> np.ndarray:
    """Baseline JPEG bytes → (h, w, 3) uint8 RGB (grayscale replicated)."""
    img, done, total = _jpeg_decode_impl(raw, tolerant=False)
    return img


def _next_marker(raw: bytes, pos: int) -> int:
    """Skip entropy-coded data: first 0xFF followed by a real marker
    byte (not 0x00 stuffing, not RST)."""
    n = len(raw)
    while pos < n - 1:
        if raw[pos] == 0xFF and raw[pos + 1] != 0x00 and not (
            0xD0 <= raw[pos + 1] <= 0xD7
        ):
            return pos
        pos += 1
    return n


def _jpeg_decode_impl(raw: bytes, *, tolerant: bool) -> tuple[np.ndarray, int, int]:
    if raw[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    comps = None  # list of (cid, hs, vs, tq)
    h = w = None
    restart_interval = 0
    progressive = False
    coef = None  # progressive: per-component zigzag coefficient planes
    scan_fracs: list[float] = []  # progressive salvage: per-scan progress
    while pos < len(raw):
        if raw[pos] != 0xFF:
            pos += 1
            continue
        marker = raw[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack(">H", raw[pos : pos + 2])
        seg = raw[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq:
                    tab = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                else:
                    tab = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                qt[tq] = tab
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                huff[(tc, th)] = _huff_decode_table(bits, vals)
                p += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec}")
            progressive = marker == 0xC2
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            if progressive:
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mcux = (w + 8 * hmax - 1) // (8 * hmax)
                mcuy = (h + 8 * vmax - 1) // (8 * vmax)
                coef = [
                    np.zeros((mcuy * vs, mcux * hs, 64), dtype=np.int32)
                    for _cid, hs, vs, _tq in comps
                ]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0x{marker:02x}: only baseline sequential "
                "(SOF0/SOF1) and progressive (SOF2) are decoded here"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            smap = {}
            scan_cids = []
            for i in range(ns):
                cs, tds = seg[1 + 2 * i], seg[2 + 2 * i]
                smap[cs] = (tds >> 4, tds & 0xF)
                scan_cids.append(cs)
            pos += seglen
            if not progressive:
                return _decode_scan(raw, pos, comps, smap, qt, huff, h, w,
                                    restart_interval, tolerant)
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            progress = [0.0]  # fraction applied, survives an entropy error
            try:
                pos = _decode_prog_scan(
                    raw, pos, comps, scan_cids, smap, huff, coef,
                    h, w, ss, se, ahal >> 4, ahal & 0xF, restart_interval,
                    progress,
                )
                scan_fracs.append(progress[0])
            except Exception:
                if not tolerant:
                    raise
                # a progressive stream RESYNCS at the next marker: later
                # scans refine whatever this one managed to deliver
                scan_fracs.append(progress[0])
                pos = _next_marker(raw, pos)
            continue
        pos += seglen
    if progressive and comps is not None:
        if not scan_fracs:
            raise ValueError("JPEG contains no scan")
        return _render_progressive(comps, coef, qt, h, w, scan_fracs)
    raise ValueError("JPEG contains no scan")


def _decode_scan(raw, pos, comps, smap, qt, huff, h, w, restart_interval,
                 tolerant=False):
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for _cid, hs, vs, _tq in comps:
        # mid-gray default: in tolerant mode undecoded MCUs stay neutral
        planes.append(np.full((mcuy * vs * 8, mcux * hs * 8), 128.0))
    pred = [0] * len(comps)
    r = _BitReader(raw, pos)
    mcu_count = 0
    mcus_done = 0
    try:
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                    r.align_restart()
                    pred = [0] * len(comps)
                mcu_count += 1
                for ci, (cid, hs, vs, tq) in enumerate(comps):
                    dct, act = smap[cid]
                    for by in range(vs):
                        for bx in range(hs):
                            try:
                                blk = _decode_block(r, huff[(0, dct)], huff[(1, act)])
                            except _RestartMarker:
                                # tolerate encoders whose RST cadence differs
                                r.align_restart()
                                pred = [0] * len(comps)
                                blk = _decode_block(r, huff[(0, dct)], huff[(1, act)])
                            blk[0] += pred[ci]
                            pred[ci] = blk[0]
                            z = np.zeros(64)
                            z[_ZIGZAG] = blk * qt[tq]
                            px = _C.T @ z.reshape(8, 8) @ _C + 128
                            y0 = (my * vs + by) * 8
                            x0 = (mx * hs + bx) * 8
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
                mcus_done += 1
    except Exception:
        if not tolerant:
            raise
        # baseline streams without restart markers cannot resync after an
        # entropy error — salvage what decoded, leave the rest mid-gray
    # upsample to full res and convert
    full = []
    for ci, (_cid, hs, vs, _tq) in enumerate(comps):
        p = planes[ci]
        if hs != hmax or vs != vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2), mcus_done, mcux * mcuy
    y, cb, cr = full[0], full[1] - 128, full[2] - 128
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=2,
    )
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8), mcus_done, mcux * mcuy


# ------------------------------------------------- progressive (T.81 G)
def _decode_prog_scan(raw, pos, comps, scan_cids, smap, huff, coef,
                      h, w, ss, se, ah, al, restart_interval, progress):
    """Decode ONE progressive scan into the per-component zigzag
    coefficient planes (in place). Returns the byte position after the
    scan's entropy data; ``progress[0]`` tracks the applied fraction so
    salvage keeps partial scans. Spectral selection + successive
    approximation per T.81 G.1.2 (EOB runs, correction bits)."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    r = _BitReader(raw, pos)
    cidx = {c[0]: i for i, c in enumerate(comps)}

    if ss == 0:  # DC scan (may be interleaved)
        if se != 0:
            raise ValueError("DC scan with Se != 0")
        members = [cidx[cs] for cs in scan_cids]
        pred = [0] * len(comps)
        if len(members) == 1:
            # non-interleaved DC scan: raster over the component's blocks
            ci = members[0]
            _cid, hs, vs, _tq = comps[ci]
            cbw = (-(-(w * hs) // hmax) + 7) // 8
            cbh = (-(-(h * vs) // vmax) + 7) // 8
            units = [(ci, by, bx) for by in range(cbh) for bx in range(cbw)]
        else:
            units = []
            for my in range(mcuy):
                for mx in range(mcux):
                    for ci in members:
                        _cid, hs, vs, _tq = comps[ci]
                        for by in range(vs):
                            for bx in range(hs):
                                units.append((ci, my * vs + by, mx * hs + bx))
        # restart cadence counts MCUs (interleaved) / blocks (single)
        per_mcu = 1 if len(members) == 1 else sum(
            comps[ci][1] * comps[ci][2] for ci in members
        )
        n_mcus = len(units) // per_mcu
        done = 0
        for u in range(n_mcus):
            if restart_interval and done and done % restart_interval == 0:
                r.align_restart()
                pred = [0] * len(comps)
            for ci, by, bx in units[u * per_mcu : (u + 1) * per_mcu]:
                blk = coef[cidx[comps[ci][0]]][by, bx]
                if ah == 0:
                    dct = smap[comps[ci][0]][0]
                    try:
                        t = _decode_huff(r, huff[(0, dct)])
                    except _RestartMarker:
                        r.align_restart()
                        pred = [0] * len(comps)
                        t = _decode_huff(r, huff[(0, dct)])
                    diff = _extend(r.read_bits(t), t) if t else 0
                    pred[ci] += diff
                    blk[0] = pred[ci] << al
                else:  # DC refinement: one bit per block
                    if r.read_bit():
                        blk[0] |= 1 << al
            done += 1
            progress[0] = done / n_mcus
        return _next_marker(raw, r.pos)

    # AC scan: always single-component, non-interleaved
    if len(scan_cids) != 1:
        raise ValueError("progressive AC scan must be single-component")
    ci = cidx[scan_cids[0]]
    _cid, hs, vs, _tq = comps[ci]
    act = smap[scan_cids[0]][1]
    tab = huff[(1, act)]
    cbw = (-(-(w * hs) // hmax) + 7) // 8
    cbh = (-(-(h * vs) // vmax) + 7) // 8
    plane = coef[ci]
    eobrun = 0
    done = 0
    total = cbh * cbw
    for by in range(cbh):
        for bx in range(cbw):
            if restart_interval and done and done % restart_interval == 0:
                r.align_restart()
                eobrun = 0
            blk = plane[by, bx]
            try:
                eobrun = (
                    _ac_first(r, tab, blk, ss, se, al, eobrun)
                    if ah == 0
                    else _ac_refine(r, tab, blk, ss, se, al, eobrun)
                )
            except _RestartMarker:
                r.align_restart()
                eobrun = 0
                eobrun = (
                    _ac_first(r, tab, blk, ss, se, al, eobrun)
                    if ah == 0
                    else _ac_refine(r, tab, blk, ss, se, al, eobrun)
                )
            done += 1
            progress[0] = done / total
    return _next_marker(raw, r.pos)


def _ac_first(r, tab, blk, ss, se, al, eobrun):
    """First AC scan for a band (Ah == 0): T.81 G.1.2.2."""
    if eobrun:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_huff(r, tab)
        rr, s = rs >> 4, rs & 0xF
        if s == 0:
            if rr < 15:  # EOBn: run of blocks ending here
                eobrun = (1 << rr) - 1
                if rr:
                    eobrun += r.read_bits(rr)
                break
            k += 16  # ZRL
            continue
        k += rr
        if k > se:
            raise ValueError("AC run past band end")
        blk[k] = _extend(r.read_bits(s), s) << al
        k += 1
    return eobrun


def _ac_refine(r, tab, blk, ss, se, al, eobrun):
    """AC refinement scan (Ah == Al + 1): T.81 G.1.2.3 — newly
    significant coefficients arrive as ±1<<Al; every already-nonzero
    coefficient crossed emits a correction bit."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_huff(r, tab)
            rr, s = rs >> 4, rs & 0xF
            if s == 0:
                if rr < 15:  # EOBn
                    eobrun = (1 << rr)
                    if rr:
                        eobrun += r.read_bits(rr)
                    break
                val = 0  # ZRL: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("refinement magnitude must be 1")
                val = p1 if r.read_bit() else m1
            while k <= se:
                if blk[k]:
                    if r.read_bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] > 0 else m1
                else:
                    if rr == 0:
                        break
                    rr -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if eobrun:
        while k <= se:
            if blk[k]:
                if r.read_bit() and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] > 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _render_progressive(comps, coef, qt, h, w, scan_fracs):
    """Dequantize + IDCT the accumulated coefficient planes (vectorized
    per component), upsample, color-convert. The salvage counters map
    scan progress onto the MCU contract: a clean stream (every scan
    fully applied) reports mcus_done == mcus_total; a damaged one
    reports the worst scan's applied share (progressive damage is
    spectral, not spatial, so this is the honest scalar)."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    full = []
    for ci, (_cid, hs, vs, tq) in enumerate(comps):
        bh, bw, _ = coef[ci].shape
        z = np.zeros((bh * bw, 64))
        z[:, _ZIGZAG] = coef[ci].reshape(bh * bw, 64) * qt[tq]
        px = np.einsum("kn,bnm,ml->bkl", _C.T, z.reshape(-1, 8, 8), _C) + 128
        plane = (
            px.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        if hs != hmax or vs != vmax:
            plane = np.repeat(np.repeat(plane, vmax // vs, axis=0),
                              hmax // hs, axis=1)
        full.append(plane[:h, :w])
    total = mcux * mcuy
    done = int(np.floor(total * min(scan_fracs)))
    if len(full) == 1:
        g = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2), done, total
    y, cb, cr = full[0], full[1] - 128, full[2] - 128
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=2,
    )
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8), done, total


def _decode_block(r: _BitReader, dc_tab, ac_tab) -> np.ndarray:
    blk = np.zeros(64)
    t = _decode_huff(r, dc_tab)
    blk[0] = _extend(r.read_bits(t), t) if t else 0
    k = 1
    while k < 64:
        rs = _decode_huff(r, ac_tab)
        rr, ss = rs >> 4, rs & 0xF
        if ss == 0:
            if rr == 15:
                k += 16  # ZRL
                continue
            break  # EOB
        k += rr
        if k > 63:
            raise ValueError("AC run past block end")
        blk[k] = _extend(r.read_bits(ss), ss)
        k += 1
    return blk


# Progressive AC alphabet: the Annex-K AC tables carry only EOB(0x00)
# and ZRL(0xF0) for size-0 symbols, but progressive scans need EOBn
# (0x10..0xE0) for EOB runs — so the progressive encoder ships its own
# flat canonical table covering the full alphabet (15 EOBn + ZRL +
# run/size pairs s=1..10): all 176 symbols at 9 bits (2^9 = 512 code
# space, all-ones code left unused per T.81 C.2). Compression is poor,
# which is irrelevant for test fixtures; DECODING handles any DHT.
_AC_PROG = (
    [0, 0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0],
    [rr << 4 for rr in range(15)]            # EOB1..EOB32767
    + [0xF0]                                 # ZRL
    + [(rr << 4) | s for rr in range(16) for s in range(1, 11)],
)


# ---------------------------------------------------------------- encoder
class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0


def _quality_scale(tab: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of a base table (public libjpeg formula)."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((tab * s + 50) // 100, 1, 255).astype(np.int32)


def _mag(v: int) -> tuple[int, int]:
    """signed value → (category, magnitude bits) per T.81 F.1.2.1."""
    t = int(v).bit_length() if v > 0 else int(-v).bit_length()
    bits = v if v >= 0 else v + (1 << t) - 1
    return t, bits


def jpeg_encode(px: np.ndarray, quality: int = 90) -> bytes:
    """(h, w, 3) RGB or (h, w) gray uint8 → baseline JFIF bytes
    (4:4:4, Annex-K tables quality-scaled)."""
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        ycc = [px.astype(np.float64) - 128]
        qts = [_quality_scale(_QL, quality)]
        comps = [(1, 0)]  # (component id, qt id)
    else:
        p = px.astype(np.float64)
        y = 0.299 * p[:, :, 0] + 0.587 * p[:, :, 1] + 0.114 * p[:, :, 2]
        cb = -0.168736 * p[:, :, 0] - 0.331264 * p[:, :, 1] + 0.5 * p[:, :, 2]
        cr = 0.5 * p[:, :, 0] - 0.418688 * p[:, :, 1] - 0.081312 * p[:, :, 2]
        ycc = [y - 128, cb, cr]
        qts = [_quality_scale(_QL, quality), _quality_scale(_QC, quality)]
        comps = [(1, 0), (2, 1), (3, 1)]
    dc_enc = [_huff_encode_table(*_DC_L), _huff_encode_table(*_DC_C)]
    ac_enc = [_huff_encode_table(*_AC_L), _huff_encode_table(*_AC_C)]
    qz = [q[_ZIGZAG] for q in qts]  # zigzag-ordered quant divisors

    bw = _BitWriter()
    pred = [0] * len(comps)
    by = (h + 7) // 8
    bx = (w + 7) // 8
    padded = []
    for plane in ycc:
        pp = np.zeros((by * 8, bx * 8))
        pp[:h, :w] = plane
        pp[h:, :w] = plane[-1:, :]
        pp[:, w:] = pp[:, w - 1 : w]
        padded.append(pp)
    for yb in range(by):
        for xb in range(bx):
            for ci, (_cid, tq) in enumerate(comps):
                blk = padded[ci][yb * 8 : yb * 8 + 8, xb * 8 : xb * 8 + 8]
                f = _C @ blk @ _C.T
                q = np.rint(f.reshape(-1)[_ZIGZAG] / qz[tq]).astype(int)
                hsel = 0 if tq == 0 else 1
                d = int(q[0]) - pred[ci]
                pred[ci] = int(q[0])
                t, bits = _mag(d) if d else (0, 0)
                ln, code = dc_enc[hsel][t]
                bw.write(code, ln)
                if t:
                    bw.write(bits, t)
                run = 0
                last_nz = max(np.nonzero(q[1:])[0]) + 1 if np.any(q[1:]) else 0
                for k in range(1, last_nz + 1):
                    v = int(q[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        ln, code = ac_enc[hsel][0xF0]
                        bw.write(code, ln)
                        run -= 16
                    t, bits = _mag(v)
                    ln, code = ac_enc[hsel][(run << 4) | t]
                    bw.write(code, ln)
                    bw.write(bits, t)
                    run = 0
                if last_nz < 63:
                    ln, code = ac_enc[hsel][0x00]
                    bw.write(code, ln)
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for i, q in enumerate(qts):
        out += seg(0xDB, bytes([i]) + bytes(q.reshape(-1)[_ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, tq in comps:
        sof += bytes([cid, 0x11, tq])
    out += seg(0xC0, sof)
    for tc, tabs in ((0, (_DC_L, _DC_C)), (1, (_AC_L, _AC_C))):
        for th in range(2 if not gray else 1):
            bits, vals = tabs[th]
            out += seg(0xC4, bytes([tc << 4 | th]) + bytes(bits) + bytes(vals))
    sos = bytes([len(comps)])
    for i, (cid, tq) in enumerate(comps):
        hsel = 0 if tq == 0 else 1
        sos += bytes([cid, hsel << 4 | hsel])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ------------------------------------------------- progressive encoder
def _enc_eobrun(bw, enc, eobrun: int, pend: list[int]) -> int:
    """Flush an EOB run (T.81 G.1.2.2 EOBn symbol + extension bits),
    then any buffered correction bits (refinement scans)."""
    if eobrun:
        nb = eobrun.bit_length() - 1
        ln, code = enc[nb << 4]
        bw.write(code, ln)
        if nb:
            bw.write(eobrun - (1 << nb), nb)
    for b in pend:
        bw.write(b, 1)
    pend.clear()
    return 0


def _enc_ac_first(bw, enc, blocks, ss: int, se: int, al: int) -> None:
    """First AC scan for a band: values point-transformed toward zero
    (T.81 G.1.2.2 — floor shift would break the refinement algebra on
    negatives), EOB runs across blocks."""
    eobrun = 0
    for blk in blocks:
        vals = []
        for k in range(ss, se + 1):
            c = int(blk[k])
            a = abs(c) >> al
            vals.append(a if c >= 0 else -a)
        last_nz = -1
        for i, v in enumerate(vals):
            if v:
                last_nz = i
        if last_nz < 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                eobrun = _enc_eobrun(bw, enc, eobrun, [])
            continue
        eobrun = _enc_eobrun(bw, enc, eobrun, [])
        run = 0
        for i in range(last_nz + 1):
            v = vals[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                ln, code = enc[0xF0]
                bw.write(code, ln)
                run -= 16
            t, bits = _mag(v)
            ln, code = enc[(run << 4) | t]
            bw.write(code, ln)
            bw.write(bits, t)
            run = 0
        if last_nz < se - ss:
            eobrun += 1
            if eobrun == 0x7FFF:
                eobrun = _enc_eobrun(bw, enc, eobrun, [])
    _enc_eobrun(bw, enc, eobrun, [])


def _enc_ac_refine(bw, enc, blocks, ss: int, se: int, al: int) -> None:
    """AC refinement scan (T.81 G.1.2.3): newly significant coefficients
    (|v|>>Al == 1) as run/1 symbols + sign bit; already-significant ones
    as buffered correction bits flushed after each emitted symbol."""
    eobrun = 0
    pend: list[int] = []
    for blk in blocks:
        absv = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
        sign = [1 if int(blk[k]) > 0 else 0 for k in range(ss, se + 1)]
        eob = -1
        for i, a in enumerate(absv):
            if a == 1:
                eob = i
        run = 0
        br: list[int] = []
        for i, a in enumerate(absv):
            if a == 0:
                run += 1
                continue
            while run > 15 and i <= eob:
                eobrun = _enc_eobrun(bw, enc, eobrun, pend)
                ln, code = enc[0xF0]
                bw.write(code, ln)
                run -= 16
                for b in br:
                    bw.write(b, 1)
                br = []
            if a > 1:
                br.append(a & 1)
                continue
            eobrun = _enc_eobrun(bw, enc, eobrun, pend)
            ln, code = enc[(run << 4) | 1]
            bw.write(code, ln)
            bw.write(sign[i], 1)
            for b in br:
                bw.write(b, 1)
            br = []
            run = 0
        if run > 0 or br:
            eobrun += 1
            pend.extend(br)
            if eobrun == 0x7FFF:
                eobrun = _enc_eobrun(bw, enc, eobrun, pend)
    _enc_eobrun(bw, enc, eobrun, pend)


def jpeg_encode_progressive(px: np.ndarray, quality: int = 90) -> bytes:
    """(h, w, 3) RGB or (h, w) gray uint8 → progressive (SOF2) JFIF
    bytes, 4:4:4, with a libjpeg-style scan script: DC first (Al=1),
    spectral-selection AC bands (Al=1), DC refine, AC refines (Al=0).
    The coefficient math is IDENTICAL to ``jpeg_encode`` (same padding,
    DCT, quantization), so decoding this stream must reproduce the
    baseline decode bit-for-bit — the exactness tests rely on it."""
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        ycc = [px.astype(np.float64) - 128]
        qts = [_quality_scale(_QL, quality)]
        comps = [(1, 0)]
    else:
        p = px.astype(np.float64)
        y = 0.299 * p[:, :, 0] + 0.587 * p[:, :, 1] + 0.114 * p[:, :, 2]
        cb = -0.168736 * p[:, :, 0] - 0.331264 * p[:, :, 1] + 0.5 * p[:, :, 2]
        cr = 0.5 * p[:, :, 0] - 0.418688 * p[:, :, 1] - 0.081312 * p[:, :, 2]
        ycc = [y - 128, cb, cr]
        qts = [_quality_scale(_QL, quality), _quality_scale(_QC, quality)]
        comps = [(1, 0), (2, 1), (3, 1)]
    qz = [q[_ZIGZAG] for q in qts]
    by = (h + 7) // 8
    bx = (w + 7) // 8
    coefs = []
    for ci, (_cid, tq) in enumerate(comps):
        pp = np.zeros((by * 8, bx * 8))
        plane = ycc[ci]
        pp[:h, :w] = plane
        pp[h:, :w] = plane[-1:, :]
        pp[:, w:] = pp[:, w - 1 : w]
        carr = np.zeros((by, bx, 64), dtype=np.int64)
        for yb in range(by):
            for xb in range(bx):
                blk = pp[yb * 8 : yb * 8 + 8, xb * 8 : xb * 8 + 8]
                f = _C @ blk @ _C.T
                carr[yb, xb] = np.rint(f.reshape(-1)[_ZIGZAG] / qz[tq]).astype(
                    np.int64
                )
        coefs.append(carr)

    dc_enc = [_huff_encode_table(*_DC_L), _huff_encode_table(*_DC_C)]
    ac_enc = _huff_encode_table(*_AC_PROG)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for i, q in enumerate(qts):
        out += seg(0xDB, bytes([i]) + bytes(q.reshape(-1)[_ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, tq in comps:
        sof += bytes([cid, 0x11, tq])
    out += seg(0xC2, sof)
    for th in range(1 if gray else 2):
        bits, vals = (_DC_L, _DC_C)[th]
        out += seg(0xC4, bytes([th]) + bytes(bits) + bytes(vals))
    out += seg(0xC4, bytes([0x10]) + bytes(_AC_PROG[0]) + bytes(_AC_PROG[1]))

    def sos(members: list[int], ss: int, se: int, ah: int, al: int,
            body: bytes) -> bytes:
        hdr = bytes([len(members)])
        for ci in members:
            cid, tq = comps[ci]
            td = 0 if tq == 0 else 1
            hdr += bytes([cid, (td << 4) | 0])  # ta=0: the shared AC table
        hdr += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, hdr) + body

    all_ci = list(range(len(comps)))

    def blocks(ci: int):
        return (coefs[ci][yb, xb] for yb in range(by) for xb in range(bx))

    # --- scan 1: DC first, interleaved (4:4:4 → one block per comp/MCU)
    bw = _BitWriter()
    pred = [0] * len(comps)
    for yb in range(by):
        for xb in range(bx):
            for ci, (_cid, tq) in enumerate(comps):
                v = int(coefs[ci][yb, xb, 0]) >> 1  # Al=1, arithmetic shift
                d = v - pred[ci]
                pred[ci] = v
                t, bits = _mag(d) if d else (0, 0)
                ln, code = dc_enc[0 if tq == 0 else 1][t]
                bw.write(code, ln)
                if t:
                    bw.write(bits, t)
    bw.flush()
    out += sos(all_ci, 0, 0, 0, 1, bytes(bw.out))

    # --- AC first scans (Al=1): Y split into two spectral bands,
    # chroma full-band — exercises band stitching AND full-band EOB runs
    ac_scans_first = (
        [(0, 1, 5), (0, 6, 63)]
        if gray
        else [(0, 1, 5), (1, 1, 63), (2, 1, 63), (0, 6, 63)]
    )
    for ci, ss_, se_ in ac_scans_first:
        bw = _BitWriter()
        _enc_ac_first(bw, ac_enc, blocks(ci), ss_, se_, 1)
        bw.flush()
        out += sos([ci], ss_, se_, 0, 1, bytes(bw.out))

    # --- DC refinement (Ah=1, Al=0): one bit per block
    bw = _BitWriter()
    for yb in range(by):
        for xb in range(bx):
            for ci in all_ci:
                bw.write(int(coefs[ci][yb, xb, 0]) & 1, 1)
    bw.flush()
    out += sos(all_ci, 0, 0, 1, 0, bytes(bw.out))

    # --- AC refinement scans (Ah=1, Al=0)
    for ci in all_ci:
        bw = _BitWriter()
        _enc_ac_refine(bw, ac_enc, blocks(ci), 1, 63, 0)
        bw.flush()
        out += sos([ci], 1, 63, 1, 0, bytes(bw.out))

    out += b"\xff\xd9"
    return bytes(out)
