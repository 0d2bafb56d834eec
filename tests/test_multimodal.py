"""Multimodal operator tests: binary payload contract, mapInPandas feature
extraction (deterministic fake encoder), and the codec gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rtdl_spark.catalog import table
from rtdl_spark.operators.multimodal import (
    FEATURE_DIM,
    _fake_features,
    attach_binary_payload,
    extract_features,
)


def test_attach_binary_payload_contract(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(5)
    mm = attach_binary_payload(docs)
    assert dict(mm.dtypes) == {
        "doc_id": "bigint",
        "payload": "binary",
        "meta": "struct<modality:string,mime:string,n_chars:int>",
    }
    row = mm.filter(F.col("doc_id") == 0).collect()[0]
    assert bytes(row["payload"]).decode("utf-8").startswith("the fast")
    assert row["meta"]["modality"] == "text"


def test_extract_features_deterministic(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    out = extract_features(attach_binary_payload(docs), fake_decode=True)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 20
    # pin one feature vector against the pure-python encoder
    src = docs.filter(F.col("doc_id") == 0).collect()[0]["text"].encode()
    expected = _fake_features(src)
    got = rows[0]["features"]
    assert len(got) == FEATURE_DIM
    assert got == pytest.approx(expected, abs=1e-6)
    assert rows[0]["n_bytes"] == len(src)
    assert rows[0]["modality"] == "text"


def test_decode_gate_raises_without_codec(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(1)
    out = extract_features(attach_binary_payload(docs), fake_decode=False)
    with pytest.raises(Exception, match="NotImplementedError|media codecs"):
        out.collect()


def test_resize_media_contract(spark, sf_dir):
    from rtdl_spark.operators.multimodal import resize_media

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 10)
    out = resize_media(attach_binary_payload(docs), 8, 4, fake_decode=True)
    rows = out.collect()
    assert len(rows) == 10
    for r in rows:
        assert len(bytes(r["payload"])) == 8 * 4
        assert (r["meta"]["width"], r["meta"]["height"]) == (8, 4)


def test_resize_media_codec_gate(spark, sf_dir):
    from rtdl_spark.operators.multimodal import resize_media

    docs = table(spark, sf_dir, "documents").limit(1)
    out = resize_media(attach_binary_payload(docs), 8, 4)
    with pytest.raises(Exception, match="NotImplementedError|media codecs"):
        out.collect()


def test_sample_frames_fanout(spark, sf_dir):
    from rtdl_spark.operators.multimodal import sample_frames

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 6)
    out = sample_frames(attach_binary_payload(docs), n_frames=4, fake_decode=True)
    rows = out.collect()
    assert len(rows) == 6 * 4
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    src = {
        r["doc_id"]: bytes(r["payload"])
        for r in attach_binary_payload(docs).collect()
    }
    for doc_id, frames in by_doc.items():
        assert sorted(f["frame_idx"] for f in frames) == [0, 1, 2, 3]
        # frames are contiguous non-overlapping slices of the source bytes
        step = max(len(src[doc_id]) // 4, 1)
        for f in frames:
            i = f["frame_idx"]
            assert bytes(f["frame"]) == src[doc_id][i * step : (i + 1) * step]


def test_frames_then_features_composes(spark, sf_dir):
    """Frame sampling composes with feature extraction (per-frame vectors),
    the full video → frames → embeddings pipeline shape."""
    from rtdl_spark.operators.multimodal import sample_frames

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 3)
    frames = sample_frames(
        attach_binary_payload(docs), n_frames=2, fake_decode=True
    ).select(
        (F.col("doc_id") * 10 + F.col("frame_idx")).alias("doc_id"),
        F.col("frame").alias("payload"),
        F.lit(None)
        .cast("struct<modality:string,mime:string,n_chars:int>")
        .alias("meta"),
    )
    feats = extract_features(frames, fake_decode=True)
    assert feats.count() == 6
    assert all(len(r["features"]) == FEATURE_DIM for r in feats.collect())


def test_phash_banding_is_lossless_below_n_bands(spark):
    """A pair at hamming = n_bands-1 with its flipped bits spread across
    DIFFERENT bands must still be found (pigeonhole: 3 flips cannot touch
    all 4 bands), and the real-decode path fails loudly where a codec
    would plug in."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from rtdl_spark.operators.multimodal import (
        perceptual_hash,
        phash_near_dup_pairs,
    )

    base = 0x0123456789ABCDE  # 60-bit
    # flip one bit in bands 0, 1 and 2 — bands 3 stays identical
    perturbed = base ^ (1 << 2) ^ (1 << 17) ^ (1 << 32)
    far = base ^ 0xFF  # hamming 8 > max_hamming, must be filtered
    hashed = spark.createDataFrame(
        [(1, base), (2, perturbed), (3, far)], "doc_id long, phash long"
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_near_dup_pairs(
            hashed, n_bands=4, max_hamming=3
        ).collect()
    }
    assert got == {(1, 2): 3}

    docs = spark.createDataFrame([(1, b"xx")], "doc_id long, payload binary")
    with _pytest.raises(NotImplementedError):
        perceptual_hash(docs)
    # fake path is deterministic and 60-bit-positive
    h = perceptual_hash(docs, fake_decode=True).collect()[0]["phash"]
    h2 = perceptual_hash(docs, fake_decode=True).collect()[0]["phash"]
    assert h == h2 and 0 <= h < (1 << 60)


def test_segment_audio_fanout_and_boundaries(spark, sf_dir):
    """segment_audio: segment count/offsets/durations reconstruct the
    payload exactly; a short tail segment keeps its true duration; the
    codec-gated path raises NotImplementedError."""
    import pytest as _pt

    from rtdl_spark.operators.multimodal import attach_binary_payload, segment_audio

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    mm = attach_binary_payload(docs)
    segs = segment_audio(
        mm, seg_ms=10, bytes_per_ms=3, fake_decode=True
    ).collect()

    payloads = {
        r.doc_id: bytes(r.payload) for r in mm.select("doc_id", "payload").collect()
    }
    by_doc: dict[int, list] = {}
    for r in segs:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(payloads)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.seg_idx)
        joined = b"".join(bytes(r.segment) for r in rows)
        assert joined == payloads[doc_id]
        for i, r in enumerate(rows):
            assert r.seg_idx == i and r.offset_ms == i * 10
            if i < len(rows) - 1:
                assert r.dur_ms == 10
            else:
                assert 0 < r.dur_ms <= 10

    with _pt.raises(Exception, match="codecs not available"):
        segment_audio(mm, fake_decode=False).collect()


def test_segment_audio_wav_codec_real_decode_roundtrip(spark):
    """codec="wav" is a REAL decode path: the RIFF header is parsed
    (stdlib wave), segments are sample-accurate, each segment is itself a
    playable WAV, and reassembling the segments' frames reproduces the
    original sample stream byte-exactly."""
    import io
    import wave

    import numpy as np

    from rtdl_spark.operators.multimodal import make_wav, segment_audio

    fr, nch, sw = 8000, 1, 2
    # 2.6 s of a deterministic int16 ramp -> 3 segments (last one short)
    n = int(fr * 2.6)
    samples = (np.arange(n, dtype=np.int64) % 20011 - 10000).astype("<i2")
    payload = make_wav(samples.tobytes(), fr, nch, sw)

    df = spark.createDataFrame(
        [(1, payload)], "doc_id long, payload binary"
    ).repartition(2)
    rows = sorted(
        segment_audio(df, seg_ms=1000, codec="wav").collect(),
        key=lambda r: r.seg_idx,
    )
    assert [r.seg_idx for r in rows] == [0, 1, 2]
    assert [r.offset_ms for r in rows] == [0, 1000, 2000]
    assert [r.dur_ms for r in rows] == [1000, 1000, 600]

    rebuilt = b""
    for r in rows:
        with wave.open(io.BytesIO(bytes(r.segment)), "rb") as w:
            assert (w.getframerate(), w.getnchannels(), w.getsampwidth()) \
                == (fr, nch, sw)
            rebuilt += w.readframes(w.getnframes())
    assert rebuilt == samples.tobytes()

    # default (no codec) still raises at the plug point
    import pytest

    with pytest.raises(Exception, match="codec"):
        segment_audio(df, seg_ms=1000).collect()


def test_image_codec_roundtrips():
    """PPM (P5/P6) and BMP (8-bit palette / 24-bit) encode→parse are the
    identity on (width, height, channels, pixels) — including BMP's
    bottom-up row order, 4-byte row padding, and BGR channel swap, and
    PPM's comment/whitespace header grammar."""
    import pytest

    from rtdl_spark.functions.imagecodec import (
        make_bmp,
        make_ppm,
        parse_bmp,
        parse_ppm,
    )

    gray = bytes((x * 7 + y * 31) % 256 for y in range(5) for x in range(7))
    rgb = bytes(
        v
        for y in range(5)
        for x in range(7)
        for v in ((x * 3) % 256, (y * 5) % 256, (x + y) % 256)
    )
    assert parse_ppm(make_ppm(gray, 7, 5, 1)) == (7, 5, 1, gray)
    assert parse_ppm(make_ppm(rgb, 7, 5, 3)) == (7, 5, 3, rgb)
    assert parse_bmp(make_bmp(gray, 7, 5, 1)) == (7, 5, 1, gray)
    assert parse_bmp(make_bmp(rgb, 7, 5, 3)) == (7, 5, 3, rgb)
    # header grammar: comments + arbitrary whitespace between tokens
    hdr = b"P5 # comment\n# another\n 7\t5 #x\n255\n" + gray
    assert parse_ppm(hdr) == (7, 5, 1, gray)
    # short input zero-pads, oversize truncates
    assert parse_ppm(make_ppm(gray[:10], 7, 5, 1))[3] == gray[:10] + bytes(25)
    with pytest.raises(ValueError, match="magic"):
        parse_ppm(b"JUNKDATA")
    with pytest.raises(ValueError, match="truncated"):
        parse_ppm(b"P5\n7 5\n255\n" + gray[:10])


def test_resize_media_real_codec_nearest_neighbor(spark):
    """codec="ppm" is a REAL decode→resample→re-encode path: output
    payloads are valid PPMs whose pixels equal the floor-division
    nearest-neighbor mapping of the input pixels (checked against an
    independent numpy computation)."""
    import numpy as np

    from rtdl_spark.functions.imagecodec import make_ppm, parse_ppm
    from rtdl_spark.operators.multimodal import resize_media

    w0, h0 = 13, 9
    pix = bytes((x * 17 + y * 53) % 256 for y in range(h0) for x in range(w0))
    df = spark.createDataFrame(
        [(1, make_ppm(pix, w0, h0, 1))], "doc_id long, payload binary"
    )
    out = resize_media(df, 8, 8, codec="ppm").collect()[0]
    assert (out.meta["width"], out.meta["height"]) == (8, 8)
    ow, oh, och, opix = parse_ppm(bytes(out.payload))
    assert (ow, oh, och) == (8, 8, 1)
    src = np.frombuffer(pix, dtype=np.uint8).reshape(h0, w0)
    ys = (np.arange(8) * h0) // 8
    xs = (np.arange(8) * w0) // 8
    assert opix == src[np.ix_(ys, xs)].tobytes()


def test_image_ahash_real_decode_properties(spark):
    """The real perceptual-hash path (codec="ppm", ahash): identical
    images collide at hamming 0, a lightly-noised copy stays within a
    small hamming distance, an unrelated image lands far away — and the
    Spark column equals the pure-Python kernel bit for bit."""
    from rtdl_spark.functions.imagecodec import make_ppm
    from rtdl_spark.operators.multimodal import (
        image_hash_bits,
        perceptual_hash,
    )

    w, h = 40, 30
    base = bytearray(
        ((x // 5) * 40 + (y // 6) * 17) % 256
        for y in range(h)
        for x in range(w)
    )
    noisy = bytearray(base)
    for i in range(0, len(noisy), 97):  # sparse ±2 perturbation
        noisy[i] = min(255, noisy[i] + 2)
    other = bytes((x * 91 + y * 13) % 256 for y in range(h) for x in range(w))
    imgs = {
        1: make_ppm(bytes(base), w, h, 1),
        2: make_ppm(bytes(base), w, h, 1),
        3: make_ppm(bytes(noisy), w, h, 1),
        4: make_ppm(other, w, h, 1),
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in imgs.items()], "doc_id long, payload binary"
    )
    got = {
        r.doc_id: r.phash
        for r in perceptual_hash(df, codec="ppm").collect()
    }
    for k, v in imgs.items():
        assert got[k] == image_hash_bits(v, "ppm", "ahash")
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(got[1], got[2]) == 0
    assert ham(got[1], got[3]) <= 6
    assert ham(got[1], got[4]) >= 15


def test_image_dct_phash_real_decode(spark):
    """method="dct" (classic pHash) on the real decode path: noise-robust
    (lightly-noised copy within small hamming) and discriminative, and
    deterministic across Spark and the pure-Python kernel."""
    from rtdl_spark.functions.imagecodec import make_bmp
    from rtdl_spark.operators.multimodal import (
        image_hash_bits,
        perceptual_hash,
    )

    w, h = 40, 30
    base = bytearray(
        ((x // 5) * 40 + (y // 6) * 17) % 256
        for y in range(h)
        for x in range(w)
    )
    noisy = bytearray(base)
    for i in range(0, len(noisy), 53):
        noisy[i] = max(0, noisy[i] - 3)
    other = bytes((x * 91 + y * 13) % 256 for y in range(h) for x in range(w))
    imgs = {
        1: make_bmp(bytes(base), w, h, 1),
        2: make_bmp(bytes(noisy), w, h, 1),
        3: make_bmp(other, w, h, 1),
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in imgs.items()], "doc_id long, payload binary"
    )
    got = {
        r.doc_id: r.phash
        for r in perceptual_hash(df, codec="bmp", method="dct").collect()
    }
    for k, v in imgs.items():
        assert got[k] == image_hash_bits(v, "bmp", "dct")
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(got[1], got[2]) <= 8
    assert ham(got[1], got[3]) >= 15


def test_sample_frames_ppm_stream_real_decode(spark):
    """codec="ppm-stream" walks a REAL multi-image container: frame
    headers (with mixed sizes) locate each next frame, grabs are evenly
    spaced over the true frame count — (i*total)//n, repeating frames
    when total < n — and every sampled frame round-trips as a standalone
    image with the right pixels."""
    import pytest

    from rtdl_spark.functions.imagecodec import (
        make_ppm,
        parse_ppm,
        parse_ppm_stream,
    )
    from rtdl_spark.operators.multimodal import sample_frames

    # 7 frames with DIFFERENT dims (header walking must use each
    # frame's own pixel-block length)
    frames = [
        bytes((f * 31 + i) % 256 for i in range((4 + f % 3) * 3))
        for f in range(7)
    ]
    dims = [(4 + f % 3, 3) for f in range(7)]
    stream = b"".join(
        make_ppm(p, w, h, 1) for p, (w, h) in zip(frames, dims)
    )
    assert [f[:3] for f in parse_ppm_stream(stream)] == [
        (w, h, 1) for w, h in dims
    ]

    short = make_ppm(bytes(range(12)), 4, 3, 1)  # 1-frame "video"
    df = spark.createDataFrame(
        [(1, stream), (2, short)], "doc_id long, payload binary"
    )
    out = sorted(
        sample_frames(df, n_frames=4, codec="ppm-stream").collect(),
        key=lambda r: (r.doc_id, r.frame_idx),
    )
    d1 = [r for r in out if r.doc_id == 1]
    assert [r.frame_idx for r in d1] == [0, 1, 2, 3]
    assert all(r.n_frames == 7 for r in d1)
    for r in d1:
        want = (r.frame_idx * 7) // 4
        w, h, ch, pix = parse_ppm(bytes(r.frame))
        assert (w, h) == dims[want] and pix == frames[want]
    d2 = [r for r in out if r.doc_id == 2]
    # total(1) < n(4): the single frame repeats in every grab slot
    assert [r.frame_idx for r in d2] == [0, 1, 2, 3]
    assert all(
        r.n_frames == 1 and parse_ppm(bytes(r.frame))[3] == bytes(range(12))
        for r in d2
    )
    # default (no codec) still raises at the plug point
    with pytest.raises(Exception, match="codec"):
        sample_frames(df, n_frames=2).collect()


def test_png_codec_real_compressed_roundtrip(spark):
    """PNG is a REAL compressed-format decode (stdlib zlib): encode→parse
    is the identity under EVERY spec scanline filter (None/Sub/Up/
    Average/Paeth), multi-IDAT streams and ancillary chunks parse, CRC
    corruption and Adam7 interlace are rejected loudly, paletted files
    resolve through PLTE, and the decoded pixels agree byte-for-byte
    with the uncompressed PPM/BMP codecs on the same image. The full
    resize_media / perceptual_hash lanes run on codec='png'."""
    import struct
    import zlib

    import pytest

    from rtdl_spark.functions.imagecodec import (
        _png_chunk,
        _PNG_SIG,
        make_bmp,
        make_png,
        make_ppm,
        parse_bmp,
        parse_png,
        parse_ppm,
    )
    from rtdl_spark.operators.multimodal import perceptual_hash, resize_media

    w, h = 13, 9
    gray = bytes((x * 17 + y * 53) % 256 for y in range(h) for x in range(w))
    rgb = bytes(
        v
        for y in range(h)
        for x in range(w)
        for v in ((x * 3) % 256, (y * 5) % 256, (x * x + y) % 256)
    )
    for ft in range(5):
        assert parse_png(make_png(gray, w, h, 1, filter_type=ft)) == (
            w, h, 1, gray,
        ), f"filter {ft} gray"
        assert parse_png(make_png(rgb, w, h, 3, filter_type=ft)) == (
            w, h, 3, rgb,
        ), f"filter {ft} rgb"
    # compression is real: Sub-filtered gradient deflates well below raw
    assert len(make_png(bytes(range(256)) * 8, 64, 32, 1, filter_type=1)) < (
        64 * 32 // 2
    )
    # cross-codec agreement on identical pixels
    assert (
        parse_png(make_png(rgb, w, h, 3))
        == parse_ppm(make_ppm(rgb, w, h, 3))
        == parse_bmp(make_bmp(rgb, w, h, 3))
    )
    # multi-IDAT + ancillary chunk tolerance
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + gray[y * w : (y + 1) * w] for y in range(h))
    z = zlib.compress(raw)
    multi = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"tEXt", b"Comment\x00hi")
        + _png_chunk(b"IDAT", z[: len(z) // 2])
        + _png_chunk(b"IDAT", z[len(z) // 2 :])
        + _png_chunk(b"IEND", b"")
    )
    assert parse_png(multi) == (w, h, 1, gray)
    # paletted: grayscale palette collapses to 1 channel, colored expands
    plte_gray = b"".join(bytes((i, i, i)) for i in range(256))
    pal_png = (
        _PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
        + _png_chunk(b"PLTE", plte_gray)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    assert parse_png(pal_png) == (w, h, 1, gray)
    # rejections: CRC corruption, interlace, junk signature
    good = make_png(gray, w, h, 1)
    corrupt = bytearray(good)
    corrupt[-5] ^= 0xFF  # inside IEND CRC
    with pytest.raises(ValueError, match="CRC"):
        parse_png(bytes(corrupt))
    inter = (
        _PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 1))
    )
    with pytest.raises(ValueError, match="interlace"):
        parse_png(inter)
    with pytest.raises(ValueError, match="signature"):
        parse_png(b"JUNKJUNKJUNK")

    # Spark lanes: resize + perceptual hash through the compressed codec
    df = spark.createDataFrame(
        [(1, make_png(gray, w, h, 1, filter_type=4))],
        "doc_id long, payload binary",
    )
    out = resize_media(df, 8, 8, codec="png").collect()[0]
    ow, oh, och, opix = parse_png(bytes(out.payload))
    assert (ow, oh, och) == (8, 8, 1)
    # pixel values must equal the PPM lane's resize of the same image
    ppm_df = spark.createDataFrame(
        [(1, make_ppm(gray, w, h, 1))], "doc_id long, payload binary"
    )
    ppm_out = resize_media(ppm_df, 8, 8, codec="ppm").collect()[0]
    assert opix == parse_ppm(bytes(ppm_out.payload))[3]
    ph_png = perceptual_hash(df, codec="png").collect()[0]["phash"]
    ph_ppm = perceptual_hash(ppm_df, codec="ppm").collect()[0]["phash"]
    assert ph_png == ph_ppm
