"""Pure-Python container-format header parsing (JPEG/PNG/WAV/GIF/BMP).

The full pixel/sample decode of real container formats needs codec
libraries (PIL/soundfile) that are optional here — but the header
metadata a pipeline filters and routes on (format, dimensions, channel
count, sample rate, duration) is a few dozen bytes of well-documented
public structure per file, parseable with no dependency:

- JPEG: scan the marker stream for an SOFn frame header (ITU T.81 §B.2.2
  — height/width/components live there); works on baseline (SOF0) and
  progressive (SOF2) files alike.
- PNG: the IHDR chunk is mandatory-first (RFC 2083 §4.1.1).
- WAV: RIFF 'fmt ' chunk carries channels/sample-rate/bits; 'data'
  chunk size gives the sample count (and so duration).
- GIF/BMP: fixed-offset logical screen descriptor / BITMAPINFOHEADER.

This closes the "real bytes" half of the multimodal surface: a PST
attachment's actual JPEG is probed for real dimensions in-container,
while pixel-level ops stay behind the explicit codec gate
(`ops._require_raw`). Returned dicts use None for fields a format does
not carry.
"""

from __future__ import annotations

import struct

# SOFn markers that carry frame geometry: C0-CF minus C4 (DHT), C8 (JPG
# extension), CC (DAC) — ITU T.81 table B.1
_JPEG_SOF_MARKERS = {
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC)
}


def sniff_format(raw: bytes) -> str | None:
    """Magic-number sniff; None when no known container matches."""
    if raw[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if raw[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if raw[:4] == b"RIFF" and raw[8:12] == b"WAVE":
        return "wav"
    if raw[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if raw[:2] == b"BM":
        return "bmp"
    return None


def jpeg_dimensions(raw: bytes) -> tuple[int, int, int] | None:
    """(width, height, channels) from the first SOFn marker, or None."""
    i = 2  # past FFD8
    n = len(raw)
    while i + 4 <= n:
        # resync: markers may be preceded by fill bytes (T.81 §B.1.1.2)
        if raw[i] != 0xFF:
            i += 1
            continue
        marker = raw[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2  # standalone markers carry no length
            continue
        if i + 4 > n:
            return None
        seg_len = struct.unpack_from(">H", raw, i + 2)[0]
        if marker in _JPEG_SOF_MARKERS:
            if i + 2 + seg_len > n or seg_len < 8:
                return None
            _prec, h, w, comps = struct.unpack_from(">BHHB", raw, i + 4)
            return (w, h, comps)
        if marker == 0xD9 or marker == 0xDA:  # EOI / SOS: no SOF found
            return None
        i += 2 + seg_len
    return None


def png_dimensions(raw: bytes) -> tuple[int, int, int] | None:
    """(width, height, channels) from IHDR, or None."""
    if len(raw) < 33 or raw[12:16] != b"IHDR":
        return None
    w, h = struct.unpack_from(">II", raw, 16)
    color_type = raw[25]
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        return None
    return (w, h, channels)


def wav_info(raw: bytes) -> dict | None:
    """{channels, sample_rate, bits, n_samples} from fmt /data chunks."""
    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        return None
    i = 12
    n = len(raw)
    out: dict = {}
    while i + 8 <= n:
        cid = raw[i : i + 4]
        size = struct.unpack_from("<I", raw, i + 4)[0]
        if cid == b"fmt " and size >= 16 and i + 8 + 16 <= n:
            _fmt, ch, sr, _br, block, bits = struct.unpack_from("<HHIIHH", raw, i + 8)
            out.update(channels=ch, sample_rate=sr, bits=bits, _block=block)
        elif cid == b"data":
            out["_data_size"] = size
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if "channels" not in out or "_data_size" not in out:
        return None
    block = out.pop("_block") or 1
    out["n_samples"] = out.pop("_data_size") // block
    return out


def gif_dimensions(raw: bytes) -> tuple[int, int, int] | None:
    if len(raw) < 10:
        return None
    w, h = struct.unpack_from("<HH", raw, 6)
    return (w, h, 3)


def bmp_dimensions(raw: bytes) -> tuple[int, int, int] | None:
    if len(raw) < 30:
        return None
    w, h = struct.unpack_from("<ii", raw, 18)
    bits = struct.unpack_from("<H", raw, 28)[0]
    return (w, abs(h), max(1, bits // 8))


def probe_bytes(raw: bytes) -> dict:
    """One-stop header probe → dict with format/width/height/channels/
    sample_rate/bits/n_samples (None where not applicable/parseable)."""
    out = {
        "format": sniff_format(raw),
        "width": None,
        "height": None,
        "channels": None,
        "sample_rate": None,
        "bits": None,
        "n_samples": None,
    }
    dims = None
    if out["format"] == "jpeg":
        dims = jpeg_dimensions(raw)
    elif out["format"] == "png":
        dims = png_dimensions(raw)
    elif out["format"] == "gif":
        dims = gif_dimensions(raw)
    elif out["format"] == "bmp":
        dims = bmp_dimensions(raw)
    elif out["format"] == "wav":
        info = wav_info(raw)
        if info:
            out.update(info)
    if dims:
        out["width"], out["height"], out["channels"] = dims
    return out
