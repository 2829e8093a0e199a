"""Deterministic multimodal fixture table (north-star extension; the
reference has no media path — this is the LLM-pipeline surface the build
brief adds on top of SURVEY.md §2).

One parquet table ``media`` holding image/audio/video payloads as opaque
``binary`` columns with a typed metadata struct — the pattern a 100 TB
training-data lake uses: bytes stay opaque to the engine, metadata is
columnar and prunable, decode happens in Arrow-batched Python only for the
rows/columns that survive pushdown.

Payloads use trivial RAW codecs (dtype-packed numpy buffers, no container
format) so decode/resize/frame-sample are REAL, deterministic numeric
code testable without image/audio libraries:

- image: row-major uint8 RGB, ``len = width*height*3``
- audio: mono PCM16LE, ``len = 2*n_samples``
- video: ``n_frames`` concatenated RAW images, ``len = n*w*h*3``

Real PNG/BMP/GIF/WAV containers are fully decodable via the pure-stdlib codecs
(``multimodal.codecs``) and live in the separate ``media_real`` fixture
below; JPEG — baseline and progressive (SOF2) — is decoded by the
pure-numpy ``multimodal.jpegc`` decoder. Only MP4 remains gated
(import-guarded optional libraries in ``multimodal.ops``,
``NotImplementedError`` when absent — this container ships none).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MEDIA_VERSION = "v1"
DEFAULT_N_MEDIA = 240  # divisible by 3 kinds

_CACHE_ROOT = Path(__file__).resolve().parent.parent.parent / ".cache" / "media"

_META_T = pa.struct(
    [
        ("format", pa.string()),  # 'raw-rgb8' | 'raw-pcm16' | 'raw-vid8'
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("channels", pa.int32()),
        ("sample_rate", pa.int32()),
        ("n_samples", pa.int64()),
        ("n_frames", pa.int32()),
    ]
)

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("doc_id", pa.int64()),
        ("kind", pa.string()),  # 'image' | 'audio' | 'video'
        ("bytes", pa.binary()),
        ("meta", _META_T),
    ]
)


def _image(rng: np.random.Generator, w: int, h: int) -> bytes:
    return rng.integers(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()


def _audio(rng: np.random.Generator, n: int) -> bytes:
    t = np.arange(n, dtype=np.float64)
    f = rng.uniform(100, 2000)
    wave = (np.sin(2 * np.pi * f * t / 16_000) * 12_000).astype("<i2")
    return wave.tobytes()


def media_dir(n_media: int = DEFAULT_N_MEDIA) -> str:
    return str(_CACHE_ROOT / f"{MEDIA_VERSION}_{n_media}")


def generate(n_media: int = DEFAULT_N_MEDIA, *, force: bool = False) -> str:
    """Write the media parquet; idempotent per (version, n). Returns dir."""
    out = Path(media_dir(n_media))
    marker = out / "_SUCCESS"
    if marker.exists() and not force:
        return str(out)
    out.mkdir(parents=True, exist_ok=True)

    rows = []
    for mid in range(n_media):
        rng = np.random.default_rng(mid)  # per-row seed → order-independent
        kind = ("image", "audio", "video")[mid % 3]
        meta = {
            "format": None,
            "width": None,
            "height": None,
            "channels": None,
            "sample_rate": None,
            "n_samples": None,
            "n_frames": None,
        }
        if kind == "image":
            w, h = 16 + (mid % 5) * 8, 12 + (mid % 7) * 4
            payload = _image(rng, w, h)
            meta.update(format="raw-rgb8", width=w, height=h, channels=3)
        elif kind == "audio":
            n = 4_000 + (mid % 11) * 800
            payload = _audio(rng, n)
            meta.update(format="raw-pcm16", sample_rate=16_000, n_samples=n)
        else:
            w, h, nf = 16, 12, 4 + (mid % 5)
            payload = b"".join(_image(rng, w, h) for _ in range(nf))
            meta.update(format="raw-vid8", width=w, height=h, channels=3, n_frames=nf)
        rows.append(
            {
                "media_id": mid,
                "doc_id": mid % 100,  # joinable to documents.doc_id
                "kind": kind,
                "bytes": payload,
                "meta": meta,
            }
        )

    pq.write_table(pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA), out / "media.parquet")
    marker.touch()
    return str(out)


# --------------------------------------------- REAL container fixtures
# A second table, `media_real`, holds REAL PNG/BMP/GIF/WAV container bytes
# produced by the pure-stdlib codecs (multimodal/codecs.py) from
# deterministic per-id arrays — so full pixel/sample decode of real
# container formats is exercised AND oracle-checkable: the golden stats
# are recomputed from the pre-encode arrays at registration time, which
# makes the driver's hash compare verify encoder → bytes → decoder →
# stats end to end. Kept separate from `media` so the RAW-codec oracle
# queries keep their pinned values.

# v6: image cycle = PNG gray/RGB/RGBA (Adam7-interlaced on every other
# PNG item), BMP, GIF, baseline JPEG, progressive JPEG (SOF2 — spectral
# selection + successive approximation through the same pure-numpy
# decoder; fmt stays 'jpeg'/'png', the container probe and decode route
# are header-driven)
REAL_VERSION = "v6"
DEFAULT_N_REAL = 80

REAL_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # 'image' | 'audio'
        ("fmt", pa.string()),  # 'png' | 'bmp' | 'gif' | 'jpeg' | 'wav'
        ("bytes", pa.binary()),
    ]
)


def real_items(n: int = DEFAULT_N_REAL):
    """Yield (media_id, kind, fmt, payload_array, sample_rate, container
    bytes); deterministic per id. PNGs sweep 1/3/4 channels and all five
    scanline filters; BMP is 24-bpp; GIFs sweep palette sizes through
    real LZW; WAVs sweep mono/stereo."""
    from duckdb_pst_spark.multimodal import codecs

    for mid in range(n):
        rng = np.random.default_rng(10_000 + mid)
        if mid % 2 == 0:
            w = 12 + (mid % 6) * 7
            h = 10 + (mid % 5) * 5
            idx = (mid // 2) % 7
            if idx in (5, 6):  # JPEG (lossy: golden pins the decode);
                # idx 6 emits the SAME pixel recipe as PROGRESSIVE (SOF2)
                # bytes, so the executor path exercises the Annex-G scan
                # machinery on real container rows
                from duckdb_pst_spark.multimodal import jpegc

                base = np.mgrid[0:h, 0:w][1] * 255.0 / w
                px = np.clip(
                    np.stack([base, 255 - base, (base + 3 * mid) % 256], axis=2)
                    + rng.normal(0, 4, (h, w, 3)),
                    0, 255,
                ).astype(np.uint8)
                enc = (
                    jpegc.jpeg_encode(px, 90)
                    if idx == 5
                    else jpegc.jpeg_encode_progressive(px, 90)
                )
                yield mid, "image", "jpeg", px, None, enc
            elif idx == 3:  # 24-bpp BMP (RGB by format definition)
                px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                yield mid, "image", "bmp", px, None, codecs.bmp_encode(px)
            elif idx == 4:  # GIF: palette indices, real LZW
                npal = 8 + (mid % 4) * 32
                pal = rng.integers(0, 256, size=(npal, 3), dtype=np.uint8)
                ind = rng.integers(0, npal, size=(h, w), dtype=np.uint8)
                yield mid, "image", "gif", pal[ind], None, codecs.gif_encode(ind, pal)
            else:
                c = (1, 3, 4)[idx]
                px = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
                yield mid, "image", "png", px, None, codecs.png_encode(
                    px, filter_type=mid % 5, interlace=bool((mid // 2) % 2)
                )
        else:
            ch = 1 if mid % 4 == 1 else 2
            n_s = 3_000 + (mid % 7) * 500
            shape = (n_s,) if ch == 1 else (n_s, ch)
            s = rng.integers(-32768, 32768, size=shape).astype(np.int16)
            rate = 16_000 if mid % 3 else 8_000
            yield mid, "audio", "wav", s, rate, codecs.wav_encode(s, rate)


def real_media_dir(n: int = DEFAULT_N_REAL) -> str:
    return str(_CACHE_ROOT / f"real_{REAL_VERSION}_{n}")


def generate_real(n: int = DEFAULT_N_REAL, *, force: bool = False) -> str:
    out = Path(real_media_dir(n))
    marker = out / "_SUCCESS"
    if marker.exists() and not force:
        return str(out)
    out.mkdir(parents=True, exist_ok=True)
    rows = [
        {"media_id": mid, "kind": kind, "fmt": fmt, "bytes": raw}
        for mid, kind, fmt, _arr, _rate, raw in real_items(n)
    ]
    pq.write_table(pa.Table.from_pylist(rows, schema=REAL_SCHEMA), out / "media_real.parquet")
    marker.touch()
    return str(out)


def real_golden_rows(n: int = DEFAULT_N_REAL) -> list[tuple]:
    """Expected decode stats per item, computed from the PRE-ENCODE
    arrays (integer-exact): (media_id, fmt, width, height, channels,
    n_samples, sample_rate, sum_v, min_v, max_v); None where a field
    does not apply to the modality."""
    rows = []
    for mid, _kind, fmt, arr, rate, _raw in real_items(n):
        if fmt == "jpeg":
            # lossy codec: the golden pins the DETERMINISTIC decode (the
            # codec pair's fidelity is bounded by the round-trip test);
            # the query then proves the executor path reproduces the
            # local decode bit-for-bit
            from duckdb_pst_spark.multimodal import jpegc

            arr = jpegc.jpeg_decode(_raw)
        if fmt in ("png", "bmp", "gif", "jpeg"):
            h, w, c = arr.shape
            rows.append(
                (mid, fmt, w, h, c, None, None,
                 int(arr.sum(dtype=np.int64)), int(arr.min()), int(arr.max()))
            )
        else:
            ch = 1 if arr.ndim == 1 else arr.shape[1]
            n_s = arr.shape[0]
            rows.append(
                (mid, fmt, None, None, ch, n_s, rate,
                 int(np.abs(arr.astype(np.int64)).sum()), int(arr.min()), int(arr.max()))
            )
    return rows
