"""Multimodal column handling (north-star extension, SURVEY.md §2C).

Pattern: media travels through the lake as an opaque ``binary`` column plus
a typed metadata struct (modality, mime, width/height/duration, …).
Decode / feature-extraction / resize / frame-sampling run as Arrow-batched
``mapInPandas`` stages — Python touches each batch once, columnar in and
columnar out, so the plumbing scales exactly like any other narrow
transform (no shuffle, pipeline-parallel per input split).

The actual media codecs (PIL/ffmpeg/torchaudio) are NOT in this
environment; ``decode`` is therefore stubbed: passing
``fake_decode=True`` produces deterministic pseudo-features derived from
the bytes (so the full pipeline is testable end-to-end), while the default
raises NotImplementedError at the exact point a codec would plug in.
The Spark-side contract — schemas, batch iteration, partitioning — is
real and tested (tests/test_multimodal.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Materialize the multimodal column contract from a text fixture:
    (id, payload: binary, meta: struct). In production the binary comes from
    the source (image/audio bytes); deriving it from text keeps the
    contract testable in this environment."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text").alias("modality"),
            F.lit("text/plain; charset=utf-8").alias("mime"),
            F.length(F.col(text_col)).alias("n_chars"),
        ).alias("meta"),
    )


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real encoder: a 16-bin byte histogram,
    L1-normalized. Stable across engines/runs — good enough to exercise
    schemas, batching, and downstream similarity ops."""
    counts = [0] * FEATURE_DIM
    for b in payload:
        counts[b % FEATURE_DIM] += 1
    total = max(sum(counts), 1)
    return [c / total for c in counts]


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    fake_decode: bool = False,
    batch_size_hint: int = 1024,
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Real media decoding is environment-gated:
    NotImplementedError marks exactly where a codec (PIL.Image.open /
    librosa.load / cv2.VideoCapture + frame sampling) would be invoked on
    ``payload`` bytes.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake_decode:
                raise NotImplementedError(
                    "media codecs not available in this environment; "
                    "plug PIL/ffmpeg here or pass fake_decode=True"
                )
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "modality": pdf["meta"].map(
                        lambda m: m["modality"] if m is not None else None
                    ),
                    "n_bytes": pdf[payload_col].map(len),
                    "features": pdf[payload_col].map(_fake_features),
                }
            )
            yield out

    return df.mapInPandas(run, FEATURES_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("modality", StringType()),
                    StructField("width", LongType()),
                    StructField("height", LongType()),
                ]
            ),
        ),
    ]
)


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    fake_decode: bool = False,
    codec: str | None = None,
) -> DataFrame:
    """mapInPandas image/video resize stage — 1 row in, 1 row out, typed
    size metadata updated.

    Narrow transform: no shuffle, parallel per input split, so it scales
    linearly with executors regardless of corpus size.

    ``codec="ppm"`` / ``codec="bmp"`` / ``codec="png"`` / ``codec="jpeg"``
    is a REAL end-to-end decode path (functions/imagecodec.py +
    functions/jpegcodec.py — png and jpeg are genuinely COMPRESSED: zlib
    DEFLATE / baseline DCT+Huffman, no external library): the container
    is parsed, pixels are resampled nearest-neighbor with pure
    floor-division index math (integer-exact, SQL-replayable), and the
    result is re-encoded in the same format (jpeg re-encodes at
    quality=100, where constant blocks stay bit-exact; other content is
    lossy as JPEG inherently is). WebP (VP8) still plugs in at the marked
    point; ``fake_decode=True`` keeps the legacy byte-resampling stand-in
    (truncate or cycle-pad to width*height bytes).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            if codec in ("ppm", "bmp", "png", "jpeg"):
                from rtdl_spark.functions.imagecodec import (
                    decode_image,
                    make_bmp,
                    make_png,
                    make_ppm,
                    resize_nearest,
                )
                from rtdl_spark.functions.jpegcodec import make_jpeg

                enc = {
                    "ppm": make_ppm,
                    "bmp": make_bmp,
                    "png": make_png,
                    "jpeg": lambda p, w, h, ch: make_jpeg(
                        p, w, h, ch, quality=100
                    ),
                }[codec]

                def real_resize(payload: bytes) -> bytes:
                    w0, h0, ch, pix = decode_image(bytes(payload), codec)
                    out = resize_nearest(pix, w0, h0, ch, width, height)
                    return enc(out, width, height, ch)

                yield pd.DataFrame(
                    {
                        "doc_id": pdf[id_col],
                        "payload": pdf[payload_col].map(real_resize),
                        "meta": [
                            {
                                "modality": "image",
                                "width": width,
                                "height": height,
                            }
                        ]
                        * len(pdf),
                    }
                )
                continue
            if not fake_decode:
                raise NotImplementedError(
                    "WebP codec not available in this environment; "
                    "plug PIL.Image.open(...).resize((w,h)) here, or use "
                    "codec='ppm'/'bmp' (stdlib uncompressed) / "
                    "codec='png'/'jpeg' (real compressed codecs, "
                    "functions/imagecodec.py + jpegcodec.py) / "
                    "fake_decode=True"
                )

            def fake_resize(payload: bytes) -> bytes:
                if not payload:
                    return bytes(target)
                reps = -(-target // len(payload))  # ceil-div cycle pad
                return (payload * reps)[:target]

            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": pdf[payload_col].map(fake_resize),
                    "meta": [
                        {"modality": "image", "width": width, "height": height}
                    ]
                    * len(pdf),
                }
            )

    return df.mapInPandas(run, RESIZED_SCHEMA)


FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame", BinaryType()),
        StructField("n_frames", LongType()),
    ]
)


def sample_frames(
    df: DataFrame,
    n_frames: int = 4,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    fake_decode: bool = False,
    codec: str | None = None,
) -> DataFrame:
    """mapInPandas frame sampling — 1 video row fans out to ``n_frames``
    frame rows (the one multimodal stage that *grows* the data; keep it
    after filters so the fan-out happens on the surviving subset only).

    ``codec="ppm-stream"`` is a REAL container decode (the video leg of
    the WAV-audio / PPM-image trio): the payload is a concatenated
    stream of binary netpbm images (MJPEG's shape with a stdlib-
    parseable codec), each frame header is parsed to find the next
    (functions/imagecodec.py::parse_ppm_stream), grabs are evenly
    spaced over the TRUE frame count — fi = (i·total)//n, cv2-style,
    repeating frames when total < n — and each sampled frame is
    re-encoded as a standalone image. Compressed video (cv2/ffmpeg)
    plugs in at the marked point; the fake path slices the byte stream
    into n equal chunks. Output stays keyed by (doc_id, frame_idx) so
    downstream feature extraction and dedup operate per frame.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if codec == "ppm-stream":
                from rtdl_spark.functions.imagecodec import (
                    make_ppm,
                    parse_ppm_stream,
                )

                ids, idxs, frames, totals = [], [], [], []
                for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                    decoded = parse_ppm_stream(bytes(payload or b""))
                    total = len(decoded)
                    for i in range(n_frames):
                        if total == 0:
                            break
                        w, h, ch, pix = decoded[(i * total) // n_frames]
                        ids.append(doc_id)
                        idxs.append(i)
                        frames.append(make_ppm(pix, w, h, ch))
                        totals.append(total)
                yield pd.DataFrame(
                    {
                        "doc_id": ids,
                        "frame_idx": idxs,
                        "frame": frames,
                        "n_frames": totals,
                    }
                )
                continue
            if not fake_decode:
                raise NotImplementedError(
                    "compressed-video codecs not available in this "
                    "environment; plug cv2.VideoCapture frame sampling "
                    "here, or use codec='ppm-stream' (stdlib container "
                    "decode) / fake_decode=True"
                )
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = payload or b""
                step = max(len(payload) // n_frames, 1)
                for i in range(n_frames):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(payload[i * step : (i + 1) * step])
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "frame": frames,
                    "n_frames": [n_frames] * len(ids),
                }
            )

    return df.mapInPandas(run, FRAMES_SCHEMA)


# -- perceptual near-dup ---------------------------------------------------

PHASH_BITS = 60  # 15 md5 hex chars -> always fits a signed 64-bit long


def image_hash_bits(
    payload: bytes, codec: str, method: str = "ahash"
) -> int:
    """REAL 60-bit perceptual hash of one uncompressed image payload
    (functions/imagecodec.py parsers — no byte-slicing stand-in):

    - ``ahash`` (average hash): decode → integer grayscale → 10×6
      nearest-neighbor downscale → bit_i = (60·px_i > Σpx), folded
      row-major MSB-first. ALL-INTEGER, so the bits (and the banded
      near-dup join built on them) are exactly SQL-replayable — the
      floor-fixed-point discipline applied to images.
    - ``dct`` (classic pHash): decode → grayscale → 32×32 downscale →
      2-D DCT-II → first 60 non-DC coefficients of the low-frequency
      8×8 block, bit = (coef > median). Float; robust to small pixel
      noise (the property ahash trades away), pinned by unit tests
      rather than a SQL oracle.
    """
    from rtdl_spark.functions.imagecodec import (
        decode_image,
        resize_nearest,
        to_grayscale,
    )

    w, h, ch, pix = decode_image(bytes(payload), codec)
    gray = to_grayscale(w, h, ch, pix)
    if method == "ahash":
        small = resize_nearest(gray, w, h, 1, 10, 6)
        total = sum(small)
        out = 0
        for px in small:
            out = out * 2 + (1 if 60 * px > total else 0)
        return out
    if method == "dct":
        import numpy as np

        small = np.frombuffer(
            resize_nearest(gray, w, h, 1, 32, 32), dtype=np.uint8
        ).reshape(32, 32).astype(np.float64)
        n = 32
        k = np.arange(n)
        basis = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
        coefs = basis @ small @ basis.T  # unnormalized 2-D DCT-II
        low = coefs[:8, :8].ravel()[1:61]  # skip DC, take 60
        med = float(np.median(low))
        out = 0
        for c in low:
            out = out * 2 + (1 if c > med else 0)
        return out
    raise ValueError(f"image_hash_bits: unknown method {method!r}")


def perceptual_hash(
    df: DataFrame,
    payload_col: str = "payload",
    fake_decode: bool = False,
    codec: str | None = None,
    method: str = "ahash",
) -> DataFrame:
    """Add ``phash``: a 60-bit perceptual fingerprint of the media payload.

    ``codec="ppm"``/``"bmp"``/``"png"``/``"jpeg"`` is the REAL path: a
    no-external-library container decode (functions/imagecodec.py /
    jpegcodec.py; png is the full compressed-format walk — CRCs, DEFLATE,
    filters — and jpeg is a real baseline DCT+Huffman decode) feeding
    ``image_hash_bits`` — average-hash
    by default (all-integer, SQL-replayable) or ``method="dct"`` (classic
    pHash). Arrow-batched pandas UDF: per-payload Python is inherent to
    variable-size binary parsing, the sanctioned multimodal batch shape
    (same as segment_audio).

    WebP still raises at the marked plug point.
    ``fake_decode=True`` derives the 60 bits from md5(payload) instead:
    content-deterministic, byte-identical payloads collide (hamming 0)
    and everything else is uniform — which is precisely the property the
    *plumbing* (banding, join shape, hamming filter) needs for tests;
    pure Catalyst, no Python at all."""
    if codec in ("ppm", "bmp", "png", "jpeg"):
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("long")
        def _hash(payloads: pd.Series) -> pd.Series:
            return payloads.map(
                lambda p: image_hash_bits(p, codec, method)
            ).astype("int64")

        return df.withColumn("phash", _hash(F.col(payload_col)))
    if not fake_decode:
        raise NotImplementedError(
            "WebP codec (PIL) not in this environment; use "
            "codec='ppm'/'bmp'/'png'/'jpeg' (real container decodes) or "
            "fake_decode=True for the deterministic test fingerprint"
        )
    hexval = lambda c: F.when(  # noqa: E731
        F.ascii(c) <= 57, F.ascii(c) - 48
    ).otherwise(F.ascii(c) - 87)
    fold = F.aggregate(
        F.split(F.substring(F.md5(F.col(payload_col)), 1, 15), ""),
        F.lit(0).cast("long"),
        lambda h, c: h * 16 + hexval(c),
    )
    return df.withColumn("phash", fold)


def phash_near_dup_pairs(
    hashed: DataFrame,
    id_col: str = "doc_id",
    n_bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup candidate pairs by perceptual-hash hamming distance.

    Never all-pairs: the 60-bit hash splits into ``n_bands`` equal bands
    and only pairs agreeing on at least one band meet in a bucket
    equi-join (pigeonhole: any pair within hamming ≤ n_bands-1 is
    *guaranteed* to share an identical band, so recall is exact for
    max_hamming < n_bands; beyond that it degrades gracefully, the usual
    LSH trade). Survivors pay one cheap bit_count(xor) filter.

    Output: (id_a, id_b, hamming), id_a < id_b, deduped across bands.
    """
    band_bits = PHASH_BITS // n_bands
    mask = (1 << band_bits) - 1
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftright(F.col("phash"), i * band_bits)
                .bitwiseAND(mask)
                .alias("key"),
            )
            for i in range(n_bands)
        ]
    )
    exploded = hashed.select(
        F.col(id_col), F.col("phash"), F.explode(bands).alias("b")
    ).select(id_col, "phash", "b.band", "b.key")
    a, b = exploded.alias("a"), exploded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("a.phash").bitwiseXOR(F.col("b.phash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs


AUDIO_SEGMENTS_SCHEMA = (
    "doc_id long, seg_idx int, offset_ms long, dur_ms long, segment binary"
)


def make_wav(samples: bytes, framerate: int = 16000, nchannels: int = 1,
             sampwidth: int = 2) -> bytes:
    """Encode raw PCM sample bytes as a standalone RIFF/WAVE container
    (stdlib ``wave`` — pure Python, no external codec). Test fixtures and
    the segmenter's re-encode step share this one encoder."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nchannels)
        w.setsampwidth(sampwidth)
        w.setframerate(framerate)
        w.writeframes(samples)
    return buf.getvalue()


def _wav_segment_rows(payload: bytes, seg_ms: int):
    """Real container decode: parse the WAV header (channels / sample
    width / frame rate), slice sample-accurate fixed-duration windows,
    and re-encode each segment as a standalone playable WAV. Yields
    (seg_idx, offset_ms, dur_ms, segment_bytes)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        nch, sw, fr = w.getnchannels(), w.getsampwidth(), w.getframerate()
        frames_per_seg = max(int(fr * seg_ms / 1000), 1)
        i = 0
        while True:
            data = w.readframes(frames_per_seg)
            if not data and i > 0:
                break
            n_frames = len(data) // (nch * sw)
            yield (
                i,
                int(i * frames_per_seg * 1000 / fr),
                int(round(n_frames * 1000 / fr)),
                make_wav(data, fr, nch, sw),
            )
            if not data:
                break
            i += 1


def segment_audio(
    df: DataFrame,
    seg_ms: int = 1000,
    bytes_per_ms: int = 16,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    fake_decode: bool = False,
    codec: str | None = None,
) -> DataFrame:
    """mapInPandas audio segmentation — one audio row fans out to
    fixed-duration segment rows keyed (doc_id, seg_idx, offset_ms): the
    bronze→silver step before per-segment feature extraction / dedup
    (same contract as sample_frames for video).

    ``codec="wav"`` is a REAL end-to-end decode path: the stdlib ``wave``
    parser reads the RIFF header (channels, sample width, frame rate),
    segments are cut sample-accurately per ``seg_ms``, and each segment is
    re-encoded as a standalone playable WAV — no byte-range guessing.
    ``codec="fake-pcm"`` (or the legacy ``fake_decode=True``) treats the
    payload as fixed-rate headerless PCM (``bytes_per_ms``) and slices
    byte ranges — the stand-in for compressed formats whose codecs
    (soundfile/librosa/ffmpeg) aren't in this environment; the default
    still raises at the exact plug point. A short final segment is kept
    (its dur_ms says so), matching what a real splitter emits.
    """
    if codec is None and fake_decode:
        codec = "fake-pcm"
    if codec not in (None, "fake-pcm", "wav"):
        raise ValueError(f"segment_audio: unknown codec {codec!r}")

    seg_bytes = seg_ms * bytes_per_ms

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if codec is None:
                raise NotImplementedError(
                    "compressed-audio codecs not available in this "
                    "environment; plug soundfile/librosa decode here, or "
                    "use codec='wav' (stdlib container decode) / "
                    "codec='fake-pcm'"
                )
            ids, idxs, offs, durs, segs = [], [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = payload or b""
                if codec == "wav":
                    for i, off, dur, seg in _wav_segment_rows(
                        bytes(payload), seg_ms
                    ):
                        ids.append(doc_id)
                        idxs.append(i)
                        offs.append(off)
                        durs.append(dur)
                        segs.append(seg)
                    continue
                n_segs = max((len(payload) + seg_bytes - 1) // seg_bytes, 1)
                for i in range(n_segs):
                    chunk = payload[i * seg_bytes : (i + 1) * seg_bytes]
                    ids.append(doc_id)
                    idxs.append(i)
                    offs.append(i * seg_ms)
                    durs.append(
                        (len(chunk) + bytes_per_ms - 1) // bytes_per_ms
                    )
                    segs.append(chunk)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "seg_idx": idxs,
                    "offset_ms": offs,
                    "dur_ms": durs,
                    "segment": segs,
                }
            )

    return df.mapInPandas(run, AUDIO_SEGMENTS_SCHEMA)
