"""Golden numeric tests for the multimodal operators — these pin the
numpy decode/resize/frame/audio kernels that the oracle can't express in
SQL (the registered queries pin the structural outputs)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from duckdb_pst_spark.multimodal import fixtures, ops


@pytest.fixture(scope="module")
def media(spark):
    return ops.media_table(spark)


def test_fixture_shape(media):
    n = media.count()
    assert n == fixtures.DEFAULT_N_MEDIA
    kinds = dict(media.groupBy("kind").count().collect())
    assert kinds == {k: n // 3 for k in ("image", "audio", "video")}


def test_decode_image_golden(spark, media):
    """Recompute mean luma for one image driver-side and match exactly."""
    row = ops.of_kind(media, "image").filter(F.col("media_id") == 0).collect()[0]
    w, h, c = row.meta.width, row.meta.height, row.meta.channels
    px = np.frombuffer(row.bytes, dtype=np.uint8).reshape(h, w, c)
    expect = float((px @ np.array([0.299, 0.587, 0.114])).mean())

    got = {r.media_id: r for r in ops.decode_image(ops.of_kind(media, "image")).collect()}
    assert got[0].width == w and got[0].height == h and got[0].channels == c
    assert got[0].mean_luma == pytest.approx(expect, abs=1e-9)
    assert 0 <= got[0].min_px <= got[0].max_px <= 255
    assert len(got) == fixtures.DEFAULT_N_MEDIA // 3


def test_resize_golden(spark, media):
    """Nearest-neighbor 2x2 resize picks exactly the gathered pixels."""
    one = ops.of_kind(media, "image").filter(F.col("media_id") == 3)
    src = one.collect()[0]
    w, h = src.meta.width, src.meta.height
    px = np.frombuffer(src.bytes, dtype=np.uint8).reshape(h, w, 3)
    ys, xs = (np.arange(2) * h) // 2, (np.arange(2) * w) // 2
    expect = px[ys][:, xs].tobytes()

    got = ops.resize_image(one, 2, 2).collect()[0]
    assert bytes(got.bytes) == expect
    assert (got.width, got.height) == (2, 2)


def test_resize_chains(spark, media):
    """RAW output of resize is decodable input for a second resize —
    requires re-attaching a meta column, as a pipeline would."""
    step1 = ops.resize_image(ops.of_kind(media, "image"), 8, 8)
    step1 = step1.withColumn(
        "meta",
        F.struct(
            F.lit("raw-rgb8").alias("format"),
            F.col("width"),
            F.col("height"),
            F.lit(3).alias("channels"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("long").alias("n_samples"),
            F.lit(None).cast("int").alias("n_frames"),
        ),
    )
    step2 = ops.resize_image(step1, 4, 4)
    lens = {r.n for r in step2.select(F.octet_length("bytes").alias("n")).collect()}
    assert lens == {4 * 4 * 3}


def test_frame_sampling_every_k(spark, media):
    vids = ops.of_kind(media, "video")
    meta = {r.media_id: r.meta.n_frames for r in vids.select("media_id", "meta").collect()}
    all_frames = dict(
        ops.sample_frames(vids, every_k=1).groupBy("media_id").count().collect()
    )
    assert all_frames == meta
    halved = dict(
        ops.sample_frames(vids, every_k=2).groupBy("media_id").count().collect()
    )
    assert halved == {k: (v + 1) // 2 for k, v in meta.items()}
    # frame payloads are full images
    f = ops.sample_frames(vids.limit(1), every_k=1).collect()
    assert all(len(bytes(r.frame_bytes)) == r.width * r.height * 3 for r in f)


def test_audio_features_golden(spark, media):
    clip = ops.of_kind(media, "audio").filter(F.col("media_id") == 1)
    src = clip.collect()[0]
    wave = np.frombuffer(src.bytes, dtype="<i2").astype(np.float64)
    got = ops.audio_features(clip).collect()[0]
    assert got.duration_s == pytest.approx(len(wave) / src.meta.sample_rate)
    assert got.rms == pytest.approx(float(np.sqrt((wave**2).mean())), rel=1e-12)
    assert got.peak == int(np.abs(wave).max())


def test_container_formats_are_stubbed(spark, media):
    """Formats outside the built-in codec set must fail loudly at the
    optional-import gate, and mislabeled real-container formats must
    fail in their decoder — never silently mis-decode."""
    bad = media.filter(F.col("kind") == "image").withColumn(
        "meta",
        F.struct(
            F.lit("mp4").alias("format"),
            F.col("meta.width").alias("width"),
            F.col("meta.height").alias("height"),
            F.col("meta.channels").alias("channels"),
            F.col("meta.sample_rate").alias("sample_rate"),
            F.col("meta.n_samples").alias("n_samples"),
            F.col("meta.n_frames").alias("n_frames"),
        ),
    )
    with pytest.raises(Exception, match="(?i)codec|NotImplemented"):
        ops.decode_image(bad).collect()
    mislabeled = bad.withColumn(
        "meta",
        F.struct(
            F.lit("jpeg").alias("format"),
            F.col("meta.width").alias("width"),
            F.col("meta.height").alias("height"),
            F.col("meta.channels").alias("channels"),
            F.col("meta.sample_rate").alias("sample_rate"),
            F.col("meta.n_samples").alias("n_samples"),
            F.col("meta.n_frames").alias("n_frames"),
        ),
    )
    with pytest.raises(Exception, match="(?i)jpeg"):
        ops.decode_image(mislabeled).collect()


def test_decode_prunes_payloadless_columns(spark, media):
    """Kind filter + projection reach the parquet scan: an image pipeline
    must not read other modalities' payloads (pushed filter on kind)."""
    df = ops.decode_image(ops.of_kind(media, "image"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "kind" in plan.split("PushedFilters:", 1)[1].splitlines()[0]


def test_pst_attachment_media_bridge(spark):
    """Mail → multimodal: attachments from the golden archive land in
    the kernels' (media_id, bytes, meta) shape; the real JPEG payload
    round-trips, and the container-format decode stub gates cleanly."""
    from duckdb_pst_spark.multimodal.ops import decode_image
    from duckdb_pst_spark.multimodal.pst_bridge import pst_attachments

    media = pst_attachments(spark, "/root/reference/test/unittest.pst")
    rows = media.collect()
    assert rows, "fixture has at least one by-value attachment"
    ids = [r.media_id for r in rows]
    assert len(ids) == len(set(ids))  # stable distinct media ids
    jpg = [r for r in rows if (r.filename or "").upper().endswith(("JPG", "JPEG"))]
    # PR_ATTACH_SIZE counts payload + MAPI property overhead, so the
    # raw payload is non-empty and bounded by it
    assert jpg and all(0 < len(r.bytes) <= r.size for r in jpg)
    assert all(r.meta["format"] for r in rows)
    # the real JPEG attachment now routes to the pure-numpy baseline
    # decoder; its stored stream is corrupt mid-entropy (see
    # test_real_pst_jpeg_pixel_decode), so STRICT decode must fail
    # loudly — never emit garbage — while salvage mode recovers a prefix
    import pytest as _pytest

    with _pytest.raises(Exception, match="(?i)AC run|huffman|jpeg|codec"):
        decode_image(media).collect()


def test_container_header_parsers():
    """Pure-Python header parsers against hand-built minimal containers
    (public structures: ITU T.81, RFC 2083, RIFF/WAVE)."""
    import struct

    from duckdb_pst_spark.multimodal import container as C

    # minimal JPEG: SOI, APP0 stub, SOF0 (h=10, w=20, 3 comps), EOI
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 4) + b"\x00\x00"
        + b"\xff\xc0" + struct.pack(">H", 11) + struct.pack(">BHHB", 8, 10, 20, 3)
        + b"\x00\x00\x00"
        + b"\xff\xd9"
    )
    assert C.sniff_format(jpeg) == "jpeg"
    assert C.jpeg_dimensions(jpeg) == (20, 10, 3)

    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR"
        + struct.pack(">IIBB", 64, 48, 8, 6) + b"\x00\x00\x00"
        + b"\x00\x00\x00\x00"
    )
    assert C.sniff_format(png) == "png"
    assert C.png_dimensions(png) == (64, 48, 4)  # RGBA

    data = b"\x00\x01" * 8000  # 8000 mono 16-bit samples
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    assert C.sniff_format(wav) == "wav"
    info = C.wav_info(wav)
    assert info == {"channels": 1, "sample_rate": 16000, "bits": 16, "n_samples": 8000}

    assert C.sniff_format(b"\x00" * 32) is None
    assert C.probe_bytes(jpeg)["width"] == 20
    assert C.probe_bytes(wav)["sample_rate"] == 16000


def test_probe_real_pst_jpeg(spark):
    """Real container bytes end-to-end: the golden archive's actual JPEG
    attachment probed for its true geometry (200x150x3) with no codec
    library — the decode-adjacent multimodal path on real payloads."""
    from duckdb_pst_spark.multimodal.ops import probe_media
    from duckdb_pst_spark.multimodal.pst_bridge import pst_attachments

    att = pst_attachments(spark, "/root/reference/test/unittest.pst")
    probed = {r.media_id: r for r in probe_media(att).collect()}
    jpg = [r for r in att.collect() if (r.filename or "").upper().endswith("JPG")]
    assert jpg
    p = probed[jpg[0].media_id]
    assert (p.format, p.width, p.height, p.channels) == ("jpeg", 200, 150, 3)


def test_phash_pairs_golden(spark, media):
    """dHash near-dup: every brightness-shifted re-ingest pairs with its
    original within the Hamming threshold (digests all differ — this is
    the case content-digest dedup cannot catch), most at exactly 0."""
    from duckdb_pst_spark.registry import load_all

    rows = load_all()["q_media_phash_pairs"].builder(spark, "unused").collect()
    n_imgs = media.filter("kind = 'image'").count()
    self_pairs = {(r.id_a, r.id_b) for r in rows if r.id_b == r.id_a + 200_000}
    assert len(self_pairs) == n_imgs  # every copy found
    assert all(r.hamming <= 6 for r in rows)
    assert sum(1 for r in rows if r.hamming == 0) >= n_imgs // 4


def test_phash_brightness_invariance(spark, media):
    """The hash itself: unshifted vs +16-shifted hashes agree on most
    bits per image (saturation clipping may flip a few), and identical
    inputs produce identical hashes (determinism)."""
    from duckdb_pst_spark.multimodal import ops

    imgs = ops.of_kind(media, "image")
    a = {r.media_id: r.phash for r in ops.phash_image(imgs).collect()}
    b = {r.media_id: r.phash for r in ops.phash_image(imgs).collect()}
    assert a == b  # bit-deterministic
    s = {r.media_id: r.phash for r in ops.phash_image(imgs, brightness_shift=16).collect()}
    assert all(bin((a[m] ^ s[m]) & (2**64 - 1)).count("1") <= 6 for m in a)


def test_scene_cuts_golden(spark, media):
    """Frame-diff kernel vs an in-process numpy recompute on one video:
    identical mad_u for every transition, deterministic across runs,
    and the rollup counts match the raw kernel output."""
    from duckdb_pst_spark.multimodal import ops
    from duckdb_pst_spark.registry import load_all

    vids = ops.of_kind(media, "video")
    one = vids.orderBy("media_id").limit(1)
    row = one.collect()[0]
    meta, raw = row.meta, bytes(row.bytes)
    w, h, c, nf = (int(meta["width"]), int(meta["height"]),
                   int(meta["channels"]), int(meta["n_frames"]))
    fl = w * h * c
    frames = np.frombuffer(raw[: nf * fl], dtype=np.uint8).reshape(nf, fl)
    expect = {}
    for fi in range(1, nf):
        s = int(np.abs(frames[fi].astype(np.int64) - frames[fi - 1].astype(np.int64)).sum())
        expect[fi] = s * 1_000_000 // (fl * 255)
    got = {r.frame_idx: r.mad_u for r in ops.scene_cuts(one).collect()}
    assert got == expect
    agg = {r.media_id: r for r in
           load_all()["q_media_scene_cuts"].builder(spark, "unused").collect()}
    assert agg[row.media_id].n_transitions == nf - 1
    assert agg[row.media_id].max_mad_u == max(expect.values())


def test_pipeline_media_golden(spark, media):
    """The media pipeline end to end: the brightness-shifted re-crawl
    is removed entirely by the perceptual stage (digests all differ, so
    stage 1 keeps them), audio/video pass through untouched, and the
    survivor set equals the original corpus."""
    from duckdb_pst_spark.registry import load_all

    rows = {r.kind: r for r in
            load_all()["q_pipeline_media"].builder(spark, "unused").collect()}
    orig = {k: (n, b) for k, n, b in
            media.groupBy("kind").agg(F.count(F.lit(1)), F.sum(F.octet_length("bytes")))
                 .collect()}
    for kind, (n, b) in orig.items():
        assert rows[kind].n == n, (kind, rows[kind].n, n)
        assert rows[kind].total_bytes == b

    # the re-crawl's bytes genuinely differ (stage 1 digest CANNOT have
    # removed the copies — only the perceptual stage can have)
    from duckdb_pst_spark.multimodal import ops as _ops

    one = _ops.of_kind(media, "image").orderBy("media_id").limit(1)
    raw = bytes(one.collect()[0].bytes)
    shifted = bytes(_ops.shift_brightness(one, 16).collect()[0].bytes)
    assert shifted != raw and len(shifted) == len(raw)


def test_audio_fingerprint_gain_invariance(spark, media):
    """The envelope hash is loudness-invariant: a clip-free x2-gain
    copy (all bytes differ) produces the identical fingerprint for
    every audio, and q_media_audio_dup matches every copy to its
    original. (Integer gain => exact invariance; fractional gains
    floor per sample and may flip near-tied windows.)"""
    from duckdb_pst_spark.multimodal import ops
    from duckdb_pst_spark.registry import load_all

    aud = ops.of_kind(media, "audio")
    n = aud.count()
    a = {r.media_id: r.afp for r in ops.audio_fingerprint(aud).collect()}
    g = {r.media_id: r.afp for r in
         ops.audio_fingerprint(aud, gain_num=2, gain_den=1).collect()}
    assert a == g  # exact invariance (peak 11999 < 16384: no clipping)
    rows = load_all()["q_media_audio_dup"].builder(spark, "unused").collect()
    self_pairs = {(r.orig_id, r.copy_id) for r in rows
                  if r.copy_id == r.orig_id + 300_000}
    assert len(self_pairs) == n


def test_video_dup_golden(spark, media):
    """Every brightness-shifted video re-ingest matches its original
    with >=80% of sampled frames (usually all), and no cross-video
    false pairs survive the frame-vote threshold."""
    from duckdb_pst_spark.registry import load_all

    rows = load_all()["q_media_video_dup"].builder(spark, "unused").collect()
    vids = media.filter("kind = 'video'").count()
    self_pairs = {(r.orig_id, r.copy_id) for r in rows
                  if r.copy_id == r.orig_id + 400_000}
    assert len(self_pairs) == vids
    cross = [r for r in rows if r.copy_id != r.orig_id + 400_000]
    assert cross == [], cross


def test_png_wav_codecs_roundtrip():
    """Pure-stdlib codecs: every PNG scanline filter × channel count and
    WAV mono/stereo must round-trip pixel/sample-exact, including a
    multi-IDAT-chunk stream (real encoders split IDAT freely)."""
    import struct
    import zlib

    import numpy as np

    from duckdb_pst_spark.multimodal import codecs as C

    rng = np.random.default_rng(7)
    for c in (1, 2, 3, 4):
        for f in range(5):
            px = rng.integers(0, 256, size=(13, 17, c), dtype=np.uint8)
            assert np.array_equal(C.png_decode(C.png_encode(px, filter_type=f)), px)
    s = rng.integers(-32768, 32768, size=4001).astype(np.int16)
    d, r = C.wav_decode(C.wav_encode(s, 16000))
    assert r == 16000 and np.array_equal(d, s)
    st = rng.integers(-32768, 32768, size=(1000, 2)).astype(np.int16)
    d2, r2 = C.wav_decode(C.wav_encode(st, 44100))
    assert r2 == 44100 and np.array_equal(d2, st)
    # split the IDAT into two chunks; decoder must concatenate
    px = rng.integers(0, 256, size=(9, 11, 3), dtype=np.uint8)
    raw = C.png_encode(px, 2)
    sig, rest = raw[:8], raw[8:]
    chunks, pos = [], 0
    while pos < len(rest):
        (ln,) = struct.unpack(">I", rest[pos:pos + 4])
        chunks.append((rest[pos + 4:pos + 8], rest[pos + 8:pos + 8 + ln]))
        pos += 12 + ln
    idat = dict(chunks)[b"IDAT"]

    def mk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    two = (sig + mk(b"IHDR", dict(chunks)[b"IHDR"]) + mk(b"IDAT", idat[:10])
           + mk(b"IDAT", idat[10:]) + mk(b"IEND", b""))
    assert np.array_equal(C.png_decode(two), px)
    # BMP: round-trip with non-multiple-of-4 stride, plus top-down form
    bpx = rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    braw = C.bmp_encode(bpx)
    assert np.array_equal(C.bmp_decode(braw), bpx)
    neg = bytearray(braw)
    neg[22:26] = struct.pack("<i", -7)  # top-down: negate height
    rows_td = C.bmp_decode(bytes(neg))
    assert np.array_equal(rows_td, bpx[::-1])


def test_media_decode_real_matches_golden(spark):
    """q_media_decode_real's Spark output must equal the pre-encode
    golden stats row-for-row (the registered oracle pins the same)."""
    from duckdb_pst_spark.multimodal import fixtures
    from duckdb_pst_spark.registry import load_all

    rows = load_all()["q_media_decode_real"].builder(spark, "unused").collect()
    got = {
        r.media_id: (r.fmt, r.width, r.height, r.channels, r.n_samples,
                     r.sample_rate, r.sum_v, r.min_v, r.max_v)
        for r in rows
    }
    want = {
        mid: (fmt, w, h, c, ns, sr, sv, mn, mx)
        for mid, fmt, w, h, c, ns, sr, sv, mn, mx in fixtures.real_golden_rows()
    }
    assert got == want


def test_ops_decode_real_containers(spark, media):
    """The generic decode_image / audio_features operators accept real
    PNG/WAV payloads (meta.format routed to the stdlib codecs), with
    geometry derived from the CONTAINER bytes."""
    import numpy as np

    from duckdb_pst_spark.multimodal import codecs

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(10, 8, 3), dtype=np.uint8)
    s = rng.integers(-32768, 32768, size=1600).astype(np.int16)
    rows = [
        (1, 0, "image", bytearray(codecs.png_encode(px, 4)),
         {"format": "png", "width": None, "height": None, "channels": None,
          "sample_rate": None, "n_samples": None, "n_frames": None}),
        (2, 0, "audio", bytearray(codecs.wav_encode(s, 8000)),
         {"format": "wav", "width": None, "height": None, "channels": None,
          "sample_rate": None, "n_samples": None, "n_frames": None}),
    ]
    df = spark.createDataFrame(rows, media.schema)
    img = ops.decode_image(df.filter(F.col("kind") == "image")).collect()[0]
    assert (img.width, img.height, img.channels) == (8, 10, 3)
    luma = px @ np.array([0.299, 0.587, 0.114])
    assert abs(img.mean_luma - float(luma.mean())) < 1e-9
    aud = ops.audio_features(df.filter(F.col("kind") == "audio")).collect()[0]
    assert abs(aud.duration_s - 1600 / 8000) < 1e-9
    assert aud.peak == int(np.abs(s.astype(np.int64)).max())


def test_gif_codec_roundtrip():
    """GIF89a round trip: palette sizes sweep code widths; repetitive
    data exercises KwKwK and width growth; a large random image forces
    the 4096-entry table reset."""
    import numpy as np

    from duckdb_pst_spark.multimodal import codecs as C

    rng = np.random.default_rng(5)
    for npal in (4, 17, 64, 256):
        pal = rng.integers(0, 256, size=(npal, 3), dtype=np.uint8)
        idx = rng.integers(0, npal, size=(23, 31), dtype=np.uint8)
        assert np.array_equal(C.gif_decode(C.gif_encode(idx, pal)), pal[idx])
        rep = np.tile(np.arange(min(npal, 7), dtype=np.uint8), 300)[:1024].reshape(32, 32)
        assert np.array_equal(C.gif_decode(C.gif_encode(rep, pal)), pal[rep])
    pal = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    big = rng.integers(0, 256, size=(200, 300), dtype=np.uint8)
    assert np.array_equal(C.gif_decode(C.gif_encode(big, pal)), pal[big])


def test_jpeg_codec_roundtrip():
    """Pure-numpy baseline JPEG: encoder→decoder round trip stays within
    quantization error on smooth-ish content (JPEG is lossy by design);
    DCT/IDCT matrices are exact inverses; gray and color paths both
    work, and salvage mode equals strict mode on clean streams."""
    import numpy as np

    from duckdb_pst_spark.multimodal import jpegc as J

    assert np.allclose(J._C @ J._C.T, np.eye(8), atol=1e-12)
    rng = np.random.default_rng(11)
    h, w = 40, 56
    base = np.mgrid[0:h, 0:w][1] * 255 / w
    px = np.clip(
        np.stack([base, 255 - base, (base + 64) % 256], axis=2)
        + rng.normal(0, 4, (h, w, 3)),
        0, 255,
    ).astype(np.uint8)
    back = J.jpeg_decode(J.jpeg_encode(px, quality=92))
    err = np.abs(back.astype(int) - px.astype(int))
    assert err.mean() < 5 and err.max() < 48, (err.mean(), err.max())
    g = np.clip(base + rng.normal(0, 3, base.shape), 0, 255).astype(np.uint8)
    bg = J.jpeg_decode(J.jpeg_encode(g, quality=92))
    eg = np.abs(bg[:, :, 0].astype(int) - g.astype(int))
    assert eg.mean() < 3 and eg.max() < 24
    img, done, total = J.jpeg_salvage(J.jpeg_encode(px, quality=92))
    assert done == total and np.array_equal(img, back)


def test_real_pst_jpeg_pixel_decode():
    """The golden archive's REAL camera JPEG (baseline 4:2:0) through the
    pure-numpy decoder. The stored stream carries in-file corruption
    (repairable only per-position, NOT expressible as any byte
    substitution — evidence the permute table itself is now correct):
    strict decode raises at the corrupt byte, salvage mode recovers a
    prefix of MCUs with the true 200×150 geometry and photo-plausible
    statistics."""
    import numpy as np
    import pytest as _pytest

    from duckdb_pst_spark.multimodal import jpegc as J
    from duckdb_pst_spark.sources.mspst.messaging import PstArchive

    a = PstArchive("/root/reference/test/unittest.pst")
    jpg = None
    for row in a.messages(read_attachment_body=True):
        for att in row.get("attachments") or []:
            if (att.get("filename") or "").upper().endswith("JPG"):
                jpg = bytes(att["bytes"])
    assert jpg and len(jpg) == 11960
    with _pytest.raises(ValueError):
        J.jpeg_decode(jpg)
    img, done, total = J.jpeg_salvage(jpg)
    assert img.shape == (150, 200, 3)
    assert total == 130 and done >= 16, (done, total)
    # decoded region is photo-like, not noise: smooth local gradients
    top = img[: (done // 13) * 16]  # fully-decoded MCU rows
    grad = float(np.abs(np.diff(top.astype(int), axis=1)).mean())
    assert grad < 20, grad


def test_jpeg_progressive_exact_vs_baseline():
    """Progressive (SOF2) decode must be EXACTLY the baseline decode of
    the same image: both encoders share the identical coefficient math
    (padding, DCT, quantization), so the progressive scan machinery
    (spectral selection, successive approximation, EOB runs, correction
    bits) is pinned bit-for-bit — any divergence is a scan-path bug,
    never quantization noise."""
    import numpy as np

    from duckdb_pst_spark.multimodal import jpegc as J

    rng = np.random.default_rng(7)
    # noisy color (dense AC activity: run/size + refinement sign paths)
    px = np.clip(
        np.linspace(0, 255, 40 * 56 * 3).reshape(40, 56, 3)
        + rng.normal(0, 40, (40, 56, 3)),
        0, 255,
    ).astype(np.uint8)
    assert np.array_equal(
        J.jpeg_decode(J.jpeg_encode_progressive(px, 85)),
        J.jpeg_decode(J.jpeg_encode(px, 85)),
    )
    # grayscale, non-multiple-of-8 dims (single-component DC scan path)
    g = np.clip(
        np.linspace(0, 255, 33 * 41).reshape(33, 41)
        + rng.normal(0, 30, (33, 41)),
        0, 255,
    ).astype(np.uint8)
    assert np.array_equal(
        J.jpeg_decode(J.jpeg_encode_progressive(g, 85)),
        J.jpeg_decode(J.jpeg_encode(g, 85)),
    )
    # flat image with one feature: long EOBn runs (rr > 0) both scans
    flat = np.full((128, 160, 3), 130, dtype=np.uint8)
    flat[:8, :8] = 240
    assert np.array_equal(
        J.jpeg_decode(J.jpeg_encode_progressive(flat, 85)),
        J.jpeg_decode(J.jpeg_encode(flat, 85)),
    )


def test_jpeg_progressive_salvage():
    """Progressive salvage: a clean stream reports mcus_done ==
    mcus_total with pixels identical to strict decode; a truncated
    stream keeps the scans that landed (partial fraction, no raise) —
    progressive damage is spectral, so the image stays viewable."""
    import numpy as np

    from duckdb_pst_spark.multimodal import jpegc as J

    rng = np.random.default_rng(3)
    px = np.clip(
        np.linspace(0, 255, 48 * 64 * 3).reshape(48, 64, 3)
        + rng.normal(0, 25, (48, 64, 3)),
        0, 255,
    ).astype(np.uint8)
    raw = J.jpeg_encode_progressive(px, 85)
    strict = J.jpeg_decode(raw)
    img, done, total = J.jpeg_salvage(raw)
    assert done == total and np.array_equal(img, strict)
    img2, done2, total2 = J.jpeg_salvage(raw[: len(raw) // 2])
    assert 0 < done2 < total2 == total
    assert img2.shape == strict.shape
    # truncating only the final refinement scan must still be close to
    # the full decode (successive approximation converges per scan)
    img3, done3, _ = J.jpeg_salvage(raw[: len(raw) - 8])
    assert np.abs(img3.astype(int) - strict.astype(int)).mean() < 8


def test_png_adam7_roundtrip():
    """Adam7-interlaced PNG: seven independently-filtered pass
    sub-images through the real encoder/decoder pair — exact pixel
    equality across every channel count, all five scanline filters,
    and geometries that leave some passes empty (spec §8.2)."""
    import numpy as np

    from duckdb_pst_spark.multimodal import codecs as C

    rng = np.random.default_rng(5)
    for c in (1, 3, 4):
        for ft in range(5):
            for (h, w) in [(1, 1), (2, 3), (7, 5), (16, 16), (1, 9), (40, 33)]:
                shape = (h, w) if c == 1 else (h, w, c)
                px = rng.integers(0, 256, size=shape, dtype=np.uint8)
                want = px if c > 1 else px[:, :, None]
                got = C.png_decode(C.png_encode(px, filter_type=ft, interlace=True))
                assert np.array_equal(got, want), (c, ft, h, w)


def test_gif_interlace_roundtrip():
    """Interlaced GIF (appendix-E four-pass row order) through the real
    encoder/decoder pair — exact palette-index recovery on geometries
    that leave passes empty."""
    import numpy as np

    from duckdb_pst_spark.multimodal import codecs as C

    rng = np.random.default_rng(9)
    for (h, w) in [(1, 1), (2, 3), (7, 5), (9, 4), (16, 16), (33, 7)]:
        pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
        idx = rng.integers(0, 16, size=(h, w), dtype=np.uint8)
        got = C.gif_decode(C.gif_encode(idx, pal, interlace=True))
        assert np.array_equal(got, pal[idx]), (h, w)


def test_png_16bit_and_palette_roundtrip():
    """16-bit PNG (filters run byte-wise at bpp = 2c, decoded bytes
    reinterpret as big-endian uint16) and color-type-3 palette PNG
    (PLTE resolved to RGB) — exact round trips across all five filters,
    sequential and Adam7."""
    import numpy as np

    from duckdb_pst_spark.multimodal import codecs as C

    rng = np.random.default_rng(13)
    for c in (1, 3, 4):
        for ft in range(5):
            for il in (False, True):
                shape = (9, 7) if c == 1 else (9, 7, c)
                px = rng.integers(0, 65536, size=shape, dtype=np.uint16)
                want = px if c > 1 else px[:, :, None]
                got = C.png_decode(C.png_encode(px, filter_type=ft, interlace=il))
                assert got.dtype == np.uint16 and np.array_equal(got, want)
    for ft in range(5):
        for il in (False, True):
            pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
            idx = rng.integers(0, 16, size=(11, 6), dtype=np.uint8)
            got = C.png_decode(
                C.png_encode_palette(idx, pal, filter_type=ft, interlace=il)
            )
            assert np.array_equal(got, pal[idx])


def test_wav_extended_formats():
    """WAV beyond PCM16: unsigned 8-bit, signed 24-bit (3-byte triplets
    sign-extended into int32), signed 32-bit, IEEE float32, and
    WAVE_FORMAT_EXTENSIBLE resolving PCM through its SubFormat GUID —
    all against hand-built container bytes."""
    import struct

    import numpy as np

    from duckdb_pst_spark.multimodal import codecs as C

    def wav_bytes(fmt, bits, ch, rate, payload, extensible=False):
        if extensible:
            fmtc = (
                struct.pack("<HHIIHH", 0xFFFE, ch, rate, rate * ch * bits // 8,
                            ch * bits // 8, bits)
                + struct.pack("<HHI", 22, bits, 1)
                + struct.pack("<H", fmt) + b"\x00" * 14
            )
        else:
            fmtc = struct.pack("<HHIIHH", fmt, ch, rate, rate * ch * bits // 8,
                               ch * bits // 8, bits)
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmtc)) + fmtc
                + b"data" + struct.pack("<I", len(payload)) + payload)
        return b"RIFF" + struct.pack("<I", len(body)) + body

    rng = np.random.default_rng(3)
    s8 = rng.integers(0, 256, size=50, dtype=np.uint8)
    got, _ = C.wav_decode(wav_bytes(1, 8, 1, 8000, s8.tobytes()))
    assert np.array_equal(got, s8)
    vals = rng.integers(-(1 << 23), 1 << 23, size=60).astype(np.int32)
    u = vals & 0xFFFFFF
    b = np.stack([u & 0xFF, (u >> 8) & 0xFF, (u >> 16) & 0xFF], axis=1).astype(np.uint8)
    got, _ = C.wav_decode(wav_bytes(1, 24, 1, 44100, b.tobytes()))
    assert np.array_equal(got, vals)
    s32 = rng.integers(-2**31, 2**31 - 1, size=(40, 2)).astype(np.int32)
    got, _ = C.wav_decode(wav_bytes(1, 32, 2, 48000, s32.astype("<i4").tobytes()))
    assert np.array_equal(got, s32)
    f32 = rng.normal(size=70).astype(np.float32)
    got, _ = C.wav_decode(wav_bytes(3, 32, 1, 48000, f32.astype("<f4").tobytes()))
    assert np.array_equal(got, f32)
    s16 = rng.integers(-32768, 32768, size=90).astype(np.int16)
    got, r = C.wav_decode(wav_bytes(1, 16, 1, 16000, s16.astype("<i2").tobytes(),
                                    extensible=True))
    assert np.array_equal(got, s16) and r == 16000
    import pytest as _pytest
    with _pytest.raises(NotImplementedError):  # µ-law stays gated
        C.wav_decode(wav_bytes(7, 8, 1, 8000, s8.tobytes()))


def test_png_sub_byte_roundtrip():
    """1/2/4-bit PNG (the last PNG envelope gap): gray and palette,
    all five filters, sequential and Adam7. Filters run on the PACKED
    bytes (bpp=1), so odd widths exercise the row-padding path; gray
    decode scales by the exact 255/(2^d−1) factor of spec §12.5."""
    import numpy as np

    from duckdb_pst_spark.multimodal import codecs as C

    rng = np.random.default_rng(11)
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    for depth in (1, 2, 4):
        for h, w in ((1, 1), (5, 7), (16, 33)):
            s = rng.integers(0, 1 << depth, size=(h, w), dtype=np.uint8)
            scale = 255 // ((1 << depth) - 1)
            for ft in range(5):
                for il in (False, True):
                    gray = C.png_decode(
                        C.png_encode_sub(s, depth, filter_type=ft, interlace=il)
                    )
                    assert gray.shape == (h, w, 1)
                    assert np.array_equal(gray[:, :, 0], s * scale), (depth, ft, il)
                    got = C.png_decode(
                        C.png_encode_sub(
                            s, depth, palette=pal, filter_type=ft, interlace=il
                        )
                    )
                    assert np.array_equal(got, pal[s]), (depth, ft, il)


def test_png_sub_byte_matches_eight_bit_twin():
    """The same image content encoded at 4-bit and at 8-bit (values
    pre-scaled) must decode to identical pixels — cross-checks the
    packed-byte filter path against the long-proven byte path."""
    import numpy as np

    from duckdb_pst_spark.multimodal import codecs as C

    rng = np.random.default_rng(12)
    s = rng.integers(0, 16, size=(9, 14), dtype=np.uint8)
    four = C.png_decode(C.png_encode_sub(s, 4, filter_type=3))
    eight = C.png_decode(C.png_encode((s * 17).astype(np.uint8), filter_type=3))
    assert np.array_equal(four, eight)
