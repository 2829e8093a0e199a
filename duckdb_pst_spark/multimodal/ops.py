"""Multimodal operators — Arrow-batched Pandas transforms over opaque
binary media columns (north-star extension; no reference counterpart —
the build brief's LLM-training-pipeline surface).

Execution model (the 100 TB design):

- Bytes never leave the executors — every operator is ``mapInPandas``
  over a *pre-pruned* projection, so Parquet column pruning keeps
  un-needed heavy columns (the payload when only metadata is asked for)
  out of IO entirely, and Arrow moves each batch JVM→Python exactly once.
- Decode/resize/frame-sample are pure numpy over the RAW codecs written
  by ``multimodal.fixtures`` (vectorized per batch, no per-row Python in
  the loop body beyond the unavoidable ragged-buffer iteration).
- Batches of wide binary rows are kept small via
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` (the payload-safe 256
  is the session default in ``session.get_spark``; ``media_table`` also
  one-way-lowers a vanilla session's 10k default — with ~1 MB payloads
  10k rows/batch would be a 10 GB Arrow allocation per task).
- Real PNG/BMP/GIF/WAV containers decode fully via the pure-stdlib
  codecs in ``multimodal.codecs``, and JPEG — baseline AND progressive
  (SOF2) — via the pure-numpy codec in ``multimodal.jpegc`` (Huffman +
  IDCT + the Annex-G progressive scan machinery; ``jpeg_salvage`` for
  the corrupt streams crawls contain) — no image/audio library needed
  anywhere. Remaining formats (MP4, ...) stay behind the
  optional-import gate and raise ``NotImplementedError`` (libs absent
  in this container). The RAW path remains the simplest fully-real
  implementation.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    import pandas as pd

try:  # optional real-codec backends — none are shipped in this container
    from PIL import Image as _PIL_Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def _require_raw(fmt: str, expected: str) -> None:
    if fmt == expected:
        return
    if not _HAS_PIL:
        raise NotImplementedError(
            f"container format {fmt!r} is not decodable here: RAW formats "
            "('raw-rgb8', 'raw-pcm16', 'raw-vid8') plus real PNG/BMP/GIF/"
            "WAV (multimodal/codecs.py) and JPEG, baseline and "
            "progressive (multimodal/jpegc.py, incl. jpeg_salvage for "
            "corrupt streams) are built in; anything else (MP4, ...) "
            "needs a codec library, which is not installed"
        )


DECODE_IMAGE_SCHEMA = (
    "media_id long, width int, height int, channels int, mean_luma double, "
    "min_px int, max_px int"
)


def decode_image(images: DataFrame) -> DataFrame:
    """bytes → per-image stats (width/height/channels/BT.601 mean luma).

    Input needs columns (media_id, bytes, meta); everything else is
    dropped *before* the Arrow hop so the scan only reads what decoding
    needs.
    """
    src = images.select("media_id", "bytes", "meta")

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for b in it:
            out = []
            for mid, raw, meta in zip(b["media_id"], b["bytes"], b["meta"]):
                if meta["format"] in ("png", "bmp", "gif", "jpeg"):
                    # real container: geometry comes from the bytes
                    from duckdb_pst_spark.multimodal import codecs, jpegc

                    decode = {"png": codecs.png_decode,
                              "bmp": codecs.bmp_decode,
                              "gif": codecs.gif_decode,
                              "jpeg": jpegc.jpeg_decode}[meta["format"]]
                    px = decode(bytes(raw))
                    if px.shape[2] < 3:  # gray / gray+alpha → replicate
                        px = np.repeat(px[:, :, :1], 3, axis=2)
                    px = px[:, :, :3]
                    h, w, c = px.shape
                else:
                    _require_raw(meta["format"], "raw-rgb8")
                    w, h, c = int(meta["width"]), int(meta["height"]), int(meta["channels"])
                    px = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, c)
                # Exact integer channel sums + one fixed scalar combine:
                # mean(px @ [cr,cg,cb]) == (cr*ΣR + cg*ΣG + cb*ΣB)/n in
                # exact arithmetic, but the BLAS matvec's accumulation
                # order varies with runtime blocking across hosts (~1e-9
                # drift — enough to flip the 9-decimal rounding used for
                # the pinned golden). Integer sums are exact and the
                # 5-op scalar tail is one fixed IEEE sequence, so the
                # result is bit-identical on every host.
                ch = px.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                mean_luma = (
                    0.299 * float(ch[0]) + 0.587 * float(ch[1]) + 0.114 * float(ch[2])
                ) / float(h * w)
                out.append((mid, w, h, c, mean_luma, int(px.min()), int(px.max())))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "width",
                    "height",
                    "channels",
                    "mean_luma",
                    "min_px",
                    "max_px",
                ],
            )

    return src.mapInPandas(batches, schema=DECODE_IMAGE_SCHEMA)


RESIZE_SCHEMA = "media_id long, width int, height int, bytes binary"


def resize_image(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize of RAW RGB payloads to (out_w, out_h).

    Pure index-gather numpy — the same kernel shape a real thumbnailing
    pass has, minus the codec. Output is again RAW RGB, so resizes chain.
    """
    src = images.select("media_id", "bytes", "meta")

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        # per-(w,h) gather indices, cached across rows in a batch
        cache: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
        for b in it:
            out = []
            for mid, raw, meta in zip(b["media_id"], b["bytes"], b["meta"]):
                _require_raw(meta["format"], "raw-rgb8")
                w, h, c = int(meta["width"]), int(meta["height"]), int(meta["channels"])
                if (w, h) not in cache:
                    cache[(w, h)] = (
                        (np.arange(out_h) * h) // out_h,
                        (np.arange(out_w) * w) // out_w,
                    )
                ys, xs = cache[(w, h)]
                px = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, c)
                small = px[ys][:, xs]
                out.append((mid, out_w, out_h, small.tobytes()))
            yield pd.DataFrame(out, columns=["media_id", "width", "height", "bytes"])

    return src.mapInPandas(batches, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "media_id long, frame_idx int, width int, height int, frame_bytes binary"


def sample_frames(videos: DataFrame, every_k: int = 1) -> DataFrame:
    """RAW video → one row per k-th frame (a flatMap: rows out ≥ rows in).

    ``mapInPandas`` is Spark's batch-level flatMap, so emitting multiple
    frame rows per video row needs no explode shuffle — frames land in the
    same partition as their video, and downstream repartitioning is the
    caller's choice.
    """
    src = videos.select("media_id", "bytes", "meta")

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for b in it:
            out = []
            for mid, raw, meta in zip(b["media_id"], b["bytes"], b["meta"]):
                _require_raw(meta["format"], "raw-vid8")
                w, h, c = int(meta["width"]), int(meta["height"]), int(meta["channels"])
                nf = int(meta["n_frames"])
                frame_len = w * h * c
                for fi in range(0, nf, every_k):
                    out.append((mid, fi, w, h, raw[fi * frame_len : (fi + 1) * frame_len]))
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "width", "height", "frame_bytes"]
            )

    return src.mapInPandas(batches, schema=FRAME_SCHEMA)


PROBE_SCHEMA = (
    "media_id long, format string, width int, height int, channels int, "
    "sample_rate int, bits int, n_samples long"
)


def probe_media(media: DataFrame) -> DataFrame:
    """Header-only container probe over real JPEG/PNG/WAV/GIF/BMP bytes —
    no codec library needed (multimodal/container.py parses the public
    header structures directly). This is the routing/filtering step of a
    real media pipeline (drop tiny images, bucket by aspect ratio, split
    audio by sample rate) and runs on actual attachment payloads from
    the PST bridge; pixel/sample decode stays behind the codec gate."""
    src = media.select("media_id", "bytes")

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from duckdb_pst_spark.multimodal.container import probe_bytes

        cols = [
            "media_id", "format", "width", "height", "channels",
            "sample_rate", "bits", "n_samples",
        ]
        for b in it:
            out = []
            for mid, raw in zip(b["media_id"], b["bytes"]):
                p = probe_bytes(bytes(raw))
                out.append((mid, p["format"], p["width"], p["height"],
                            p["channels"], p["sample_rate"], p["bits"],
                            p["n_samples"]))
            yield pd.DataFrame(out, columns=cols)

    return src.mapInPandas(batches, schema=PROBE_SCHEMA)


AUDIO_SCHEMA = "media_id long, duration_s double, rms double, peak int"


def audio_features(audio: DataFrame) -> DataFrame:
    """PCM16 → duration / RMS / peak amplitude, vectorized per payload."""
    src = audio.select("media_id", "bytes", "meta")

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for b in it:
            out = []
            for mid, raw, meta in zip(b["media_id"], b["bytes"], b["meta"]):
                if meta["format"] == "wav":
                    # real container: rate/width come from the bytes
                    from duckdb_pst_spark.multimodal import codecs

                    samples, sr = codecs.wav_decode(bytes(raw))
                    frames = samples.shape[0]  # stereo: frames, not values
                    wave = samples.astype(np.float64).reshape(-1)
                else:
                    _require_raw(meta["format"], "raw-pcm16")
                    wave = np.frombuffer(raw, dtype="<i2").astype(np.float64)
                    sr = int(meta["sample_rate"])
                    frames = len(wave)
                out.append(
                    (
                        mid,
                        frames / sr,
                        float(np.sqrt((wave**2).mean())) if len(wave) else 0.0,
                        int(np.abs(wave).max()) if len(wave) else 0,
                    )
                )
            yield pd.DataFrame(out, columns=["media_id", "duration_s", "rms", "peak"])

    return src.mapInPandas(batches, schema=AUDIO_SCHEMA)


def media_table(spark, n_media: int | None = None) -> DataFrame:
    """Load the fixture media table (generating it on first use).

    Lowers the Arrow exchange batch-size cap to the payload-safe 256 if
    the session is above it (a vanilla session defaults to 10k rows per
    batch — a multi-GB allocation with ~MB payload rows). This is a
    one-way LOWER: nothing in the repo ever raises the conf back, so
    there is no build-time/execution-time race — narrow-row kernels get
    their throughput by rebatching inside the kernel instead
    (functions/batches.rebatch)."""
    from duckdb_pst_spark.multimodal import fixtures

    cap = int(spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000"))
    if cap > 256:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
    d = fixtures.generate(n_media or fixtures.DEFAULT_N_MEDIA)
    return spark.read.parquet(f"{d}/media.parquet")


def of_kind(media: DataFrame, kind: str) -> DataFrame:
    """Kind filter — an equality predicate Catalyst pushes to the scan, so
    e.g. an image-only pipeline never reads audio/video payload bytes
    (row-group pruning on the dictionary-encoded ``kind`` column)."""
    return media.filter(F.col("kind") == kind)


PHASH_SCHEMA = "media_id long, phash long"


def phash_image(images: DataFrame, brightness_shift: int = 0) -> DataFrame:
    """bytes → 64-bit dHash perceptual hash (difference hash).

    Integer pipeline end to end, so the hash is bit-deterministic:
    BT.601 luma in scaled integers (Σ px·[299,587,114] // 1000), 8×9
    block-MEAN downsample (integer division), then one bit per
    horizontal neighbor pair (left < right) packed row-major into a
    two's-complement BIGINT. dHash is invariant to uniform brightness
    shifts (gradients are unchanged) — the property that catches the
    re-encoded / re-leveled near-duplicates a content digest cannot
    (q_media_phash_pairs exercises exactly that with
    ``brightness_shift``).
    """
    src = images.select("media_id", "bytes", "meta")

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for b in it:
            out = []
            for mid, raw, meta in zip(b["media_id"], b["bytes"], b["meta"]):
                _require_raw(meta["format"], "raw-rgb8")
                w, h, c = int(meta["width"]), int(meta["height"]), int(meta["channels"])
                px = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, c).astype(np.int64)
                if brightness_shift:
                    px = np.clip(px + brightness_shift, 0, 255)
                luma = (px @ np.array([299, 587, 114], dtype=np.int64)) // 1000
                # 8 rows x 9 cols of integer block means (boundaries in
                # integer arithmetic -> identical on every platform)
                ys = [(i * h) // 8 for i in range(9)]
                xs = [(j * w) // 9 for j in range(10)]
                g = np.empty((8, 9), dtype=np.int64)
                for i in range(8):
                    for j in range(9):
                        blk = luma[ys[i]:ys[i + 1], xs[j]:xs[j + 1]]
                        g[i, j] = int(blk.sum()) // blk.size
                bits = (g[:, 1:] < g[:, :-1]).flatten()
                ph = 0
                for bit in bits:
                    ph = (ph << 1) | int(bit)
                if ph >= 1 << 63:  # wrap to two's-complement BIGINT
                    ph -= 1 << 64
                out.append((mid, ph))
            yield pd.DataFrame(out, columns=["media_id", "phash"])

    return src.mapInPandas(batches, schema=PHASH_SCHEMA)


SCENE_SCHEMA = "media_id long, frame_idx int, mad_u long, is_cut boolean"


def scene_cuts(videos: DataFrame, threshold_u: int = 40_000) -> DataFrame:
    """RAW video → per-frame-transition mean absolute pixel difference
    (scaled to micro-units of the 0..255 range) + cut flag — shot/scene
    boundary detection, the frame-dedup/keyframe-selection primitive a
    video training pipeline runs before sampling frames (sampling
    UNIFORMLY from a mostly-static video wastes the token budget on
    near-identical frames; sampling at cuts doesn't).

    Integer-exact: mad_u = (Σ|px_t − px_{t−1}|) · 10⁶ // (n_px · 255),
    so the flag is deterministic everywhere. One Arrow hop per video;
    the per-transition loop is numpy over whole frames.
    """
    src = videos.select("media_id", "bytes", "meta")

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for b in it:
            out = []
            for mid, raw, meta in zip(b["media_id"], b["bytes"], b["meta"]):
                _require_raw(meta["format"], "raw-vid8")
                w, h, c = int(meta["width"]), int(meta["height"]), int(meta["channels"])
                nf = int(meta["n_frames"])
                fl = w * h * c
                frames = np.frombuffer(raw[: nf * fl], dtype=np.uint8).reshape(nf, fl)
                d = np.abs(frames[1:].astype(np.int64) - frames[:-1].astype(np.int64))
                sums = d.sum(axis=1)
                for fi in range(1, nf):
                    mad_u = int(sums[fi - 1]) * 1_000_000 // (fl * 255)
                    out.append((mid, fi, mad_u, mad_u >= threshold_u))
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "mad_u", "is_cut"]
            )

    return src.mapInPandas(batches, schema=SCENE_SCHEMA)


SHIFT_SCHEMA = "media_id long, kind string, bytes binary, meta struct<" \
    "format string, width int, height int, channels int, " \
    "sample_rate int, n_samples long, n_frames int>"


def shift_brightness(images: DataFrame, delta: int) -> DataFrame:
    """RAW RGB payload → clip(px + delta) payload, same shape/meta —
    the re-encoded-copy generator: every byte of the payload changes
    (so content digests differ) while the image is visually the same
    (so perceptual hashes agree). Used by q_pipeline_media's probe
    re-crawl."""
    src = images.select("media_id", "kind", "bytes", "meta")

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for b in it:
            out = []
            for mid, kind, raw, meta in zip(
                b["media_id"], b["kind"], b["bytes"], b["meta"]
            ):
                _require_raw(meta["format"], "raw-rgb8")
                px = np.frombuffer(raw, dtype=np.uint8).astype(np.int16)
                shifted = np.clip(px + delta, 0, 255).astype(np.uint8)
                out.append((mid, kind, shifted.tobytes(), meta))
            yield pd.DataFrame(out, columns=["media_id", "kind", "bytes", "meta"])

    return src.mapInPandas(batches, schema=SHIFT_SCHEMA)


AUDIO_FP_SCHEMA = "media_id long, afp long"


def audio_fingerprint(audio: DataFrame, gain_num: int = 1, gain_den: int = 1) -> DataFrame:
    """PCM16 → 64-bit energy-envelope fingerprint (dHash for audio):
    the signal splits into 65 equal windows; one bit per adjacent
    window pair, set where energy INCREASES. Loudness-invariant by
    construction — scaling every sample by a constant gain scales all
    window energies equally and leaves every comparison unchanged —
    which is what catches the re-encoded / re-normalized copy whose
    bytes (and content digest) all differ. Integer energies
    (Σ sample², exact), so the hash is bit-deterministic.

    ``gain_num/gain_den`` applies a gain (floor division, int16
    clipping) before hashing — the probe knob q_media_audio_dup uses
    to build re-normalized copies. Invariance is EXACT for integer
    gains below clipping (energies scale by gain² uniformly);
    fractional gains floor per sample and are only approximately
    invariant — near-tied window energies can flip a bit, which is the
    realistic lossy-re-encode regime a Hamming-tolerant match absorbs."""
    src = audio.select("media_id", "bytes", "meta")

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for b in it:
            out = []
            for mid, raw, meta in zip(b["media_id"], b["bytes"], b["meta"]):
                _require_raw(meta["format"], "raw-pcm16")
                x = np.frombuffer(raw, dtype="<i2").astype(np.int64)
                if (gain_num, gain_den) != (1, 1):
                    x = np.clip(x * gain_num // gain_den, -32768, 32767)
                n = x.shape[0]
                bounds = [(i * n) // 65 for i in range(66)]
                e = np.array(
                    [int((x[bounds[i]:bounds[i + 1]] ** 2).sum()) for i in range(65)],
                    dtype=object,  # exact python ints: sums exceed int64 at high gain
                )
                ph = 0
                for i in range(64):
                    ph = (ph << 1) | int(e[i + 1] > e[i])
                if ph >= 1 << 63:
                    ph -= 1 << 64
                out.append((mid, ph))
            yield pd.DataFrame(out, columns=["media_id", "afp"])

    return src.mapInPandas(batches, schema=AUDIO_FP_SCHEMA)


VIDEO_PHASH_SCHEMA = "media_id long, frame_idx int, phash long"


def video_frame_phashes(
    videos: DataFrame, every_k: int = 2, brightness_shift: int = 0
) -> DataFrame:
    """RAW video → 64-bit dHash per k-th frame (the image kernel's bit
    math applied per frame) — the per-frame signature set that makes
    video near-dup detection a frame-level join instead of a payload
    comparison. Integer-exact; ``brightness_shift`` is the re-encoded-
    copy probe knob (clip(px + delta) per frame)."""
    src = videos.select("media_id", "bytes", "meta")

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for b in it:
            out = []
            for mid, raw, meta in zip(b["media_id"], b["bytes"], b["meta"]):
                _require_raw(meta["format"], "raw-vid8")
                w, h, c = int(meta["width"]), int(meta["height"]), int(meta["channels"])
                nf = int(meta["n_frames"])
                fl = w * h * c
                ys = [(i * h) // 8 for i in range(9)]
                xs = [(j * w) // 9 for j in range(10)]
                for fi in range(0, nf, every_k):
                    px = np.frombuffer(
                        raw[fi * fl : (fi + 1) * fl], dtype=np.uint8
                    ).reshape(h, w, c).astype(np.int64)
                    if brightness_shift:
                        px = np.clip(px + brightness_shift, 0, 255)
                    luma = (px @ np.array([299, 587, 114], dtype=np.int64)) // 1000
                    g = np.empty((8, 9), dtype=np.int64)
                    for i in range(8):
                        for j in range(9):
                            blk = luma[ys[i]:ys[i + 1], xs[j]:xs[j + 1]]
                            g[i, j] = int(blk.sum()) // blk.size
                    bits = (g[:, 1:] < g[:, :-1]).flatten()
                    ph = 0
                    for bit in bits:
                        ph = (ph << 1) | int(bit)
                    if ph >= 1 << 63:
                        ph -= 1 << 64
                    out.append((mid, fi, ph))
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "phash"])

    return src.mapInPandas(batches, schema=VIDEO_PHASH_SCHEMA)
