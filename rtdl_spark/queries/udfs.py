"""Python-extension surface (SURVEY.md §2B UDF/UDAF/UDTF row): the three
sanctioned ways Python logic enters the engine, each Arrow-batched — never
row-at-a-time:

- scalar **pandas_udf** (vectorized columnar function),
- grouped **applyInPandas** (UDAF-shaped per-group computation),
- **mapInPandas** (UDTF-shaped batch iterator — the multimodal path).

The reference's only extension point is a whole StateFun function in the
chain (SURVEY A22); these are the in-engine equivalents.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from rtdl_spark.catalog import table
from rtdl_spark.operators.multimodal import attach_binary_payload, extract_features
from rtdl_spark.queries import query


def _cos_vs_ones_udf():
    """Cosine of each vector against the all-ones direction — a stand-in
    for 'similarity to a fixed probe vector', vectorized over Arrow batches
    with numpy (no per-row Python). Built lazily: pandas_udf registration
    needs an active SparkSession."""

    @pandas_udf("double")
    def _cos_vs_ones(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series(dtype="float64")
        # One matrix op per Arrow batch — no per-row Python.  Row-axis
        # sums keep numpy's pairwise summation along contiguous memory,
        # bit-identical to the per-row kernel this replaced.
        mat = np.stack(emb.to_numpy()).astype(np.float64, copy=False)
        denom = np.sqrt((mat * mat).sum(axis=1)) * math.sqrt(mat.shape[1])
        with np.errstate(divide="ignore", invalid="ignore"):
            out = np.where(denom > 0, mat.sum(axis=1) / denom, np.nan)
        return pd.Series(out)

    return _cos_vs_ones


@query(
    "udf_pandas_cosine_probe",
    oracle="""
    SELECT vec_id,
           ROUND(
             list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                         (a, b) -> a + b)
             / (sqrt(list_reduce(list_transform(embedding,
                                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                                 (a, b) -> a + b))
                * sqrt(len(embedding))), 6) AS cos_ones
    FROM embeddings
    """,
)
def udf_pandas_cosine_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar Pandas UDF (Arrow in, numpy math, Arrow out).
    Rounded to 6: numpy's pairwise summation and SQL's left fold differ in
    the last ulp."""
    e = table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id", F.round(_cos_vs_ones_udf()("embedding"), 6).alias("cos_ones")
    )


@query(
    "udaf_grouped_mad",
    oracle="""
    WITH med AS (
      SELECT o_orderstatus, median(o_totalprice) AS m
      FROM orders GROUP BY o_orderstatus
    )
    SELECT o.o_orderstatus,
           ROUND(median(abs(o.o_totalprice - med.m)), 4) AS mad_price,
           COUNT(*) AS n
    FROM orders o JOIN med USING (o_orderstatus)
    GROUP BY o.o_orderstatus
    """,
)
def udaf_grouped_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDAF via applyInPandas: median absolute deviation per group — a
    statistic with no Catalyst built-in. Each group becomes one pandas
    frame on one executor; the groupBy is the only shuffle. (Group count is
    tiny here; at scale you guard against giant groups or pre-aggregate.)"""
    o = table(spark, sf_dir, "orders").select("o_orderstatus", "o_totalprice")

    def mad(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["o_totalprice"]
        return pd.DataFrame(
            {
                "o_orderstatus": [pdf["o_orderstatus"].iloc[0]],
                "mad_price": [round(float((x - x.median()).abs().median()), 4)],
                "n": [len(pdf)],
            }
        )

    return o.groupBy("o_orderstatus").applyInPandas(
        mad, "o_orderstatus string, mad_price double, n long"
    )


@query(
    "multimodal_feature_extract",
    # The fake encoder is a 16-bin byte histogram, L1-normalized — for
    # the (all-ASCII) document payloads that is SQL: ascii(char) % 16
    # counts over the text, each divided by the byte total. The division
    # is one IEEE op on exact integers, then narrowed to float32 on both
    # sides — bit-identical, no rounding fudge needed. Output is one
    # SCALAR row per (doc, bin): the driver's canonicalizer cannot hash
    # array cells, so vector outputs are always exploded (the
    # agg_approx_percentiles lesson).
    oracle="""
    WITH ch AS (
      -- strlen = BYTE length (the Spark side hashes text.encode('utf-8'));
      -- the per-char ascii() histogram additionally assumes ASCII payloads
      -- (true for these fixtures) — byte-length is explicit either way.
      SELECT doc_id, strlen(text) AS total,
             ascii(u.c) % 16 AS bin
      FROM (SELECT doc_id, text FROM documents WHERE doc_id < 200),
           UNNEST(string_split(text, '')) AS u(c)
    ), counts AS (
      SELECT doc_id, total, bin, COUNT(*) AS c
      FROM ch GROUP BY doc_id, total, bin
    ), bins AS (
      SELECT d.doc_id, d.total, b.i AS bin
      FROM (SELECT DISTINCT doc_id, total FROM ch) d,
           UNNEST(range(0, 16)) AS b(i)
    )
    SELECT b.doc_id, CAST(b.bin AS INT) AS bin,
           CAST(COALESCE(c.c, 0) * 1.0 / b.total AS FLOAT) AS share
    FROM bins b LEFT JOIN counts c
      ON c.doc_id = b.doc_id AND c.bin = b.bin
    """,
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF-shaped mapInPandas: binary payload → fixed-dim feature vector
    (deterministic fake encoder; real codec point documented in
    operators.multimodal), exploded to one scalar row per (doc, bin) so
    the feature values themselves are oracle-checked (the fake encoder is
    a byte histogram — SQL-expressible over ASCII payloads); exact
    vector-level parity is additionally pinned in
    tests/test_multimodal.py."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    mm = attach_binary_payload(docs)
    feats = extract_features(mm, fake_decode=True)
    return feats.select(
        "doc_id", F.posexplode("features").alias("bin", "share")
    ).withColumn("bin", F.col("bin").cast("int"))


@query(
    "udtf_tokenize_positions",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
               FROM documents WHERE doc_id < 50)
    SELECT doc_id, CAST(u.i - 1 AS BIGINT) AS pos,
           w[CAST(u.i AS INT)] AS token
    FROM t, UNNEST(range(1, len(w) + 1)) AS u(i)
    """,
)
def udtf_tokenize_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark's table-function extension point): one document
    row fans out to one row per token with its position — the genuinely
    tabular shape (variable-cardinality output) that scalar UDFs can't
    express.

    Surface demo on 50 docs: in production this row-fanout belongs in
    ``F.posexplode(F.split(...))`` (pure JVM, same result) or mapInPandas
    (Arrow-batched) — a plain Python UDTF is row-at-a-time and is the
    slowest of the three. The engine exposes all of them; COVERAGE.md maps
    which to use when.
    """
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="doc_id bigint, pos bigint, token string")
    class Tokenize:
        def eval(self, doc_id: int, text: str):
            if text is None:
                return
            for i, tok in enumerate(text.split(" ")):
                yield doc_id, i, tok

    spark.udtf.register("rtdl_tokenize", Tokenize)
    table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50).select(
        "doc_id", "text"
    ).createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT t.doc_id, t.pos, t.token "
        "FROM _udtf_docs d, LATERAL rtdl_tokenize(d.doc_id, d.text) t"
    )


@query(
    "udf_window_pandas_mad",
    oracle="""
    WITH f AS (
      SELECT * FROM orders WHERE o_orderkey < 5000
    ), med AS (
      SELECT o_orderpriority, median(o_totalprice) AS m
      FROM f GROUP BY o_orderpriority
    ), mad AS (
      SELECT f.o_orderpriority,
             median(abs(f.o_totalprice - med.m)) AS mad
      FROM f JOIN med USING (o_orderpriority)
      GROUP BY f.o_orderpriority
    )
    SELECT o_orderkey, f.o_orderpriority, ROUND(mad.mad, 4) AS mad_price
    FROM f JOIN mad USING (o_orderpriority)
    """,
)
def udf_window_pandas_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas UDF as a WINDOW function (the last cell of the UDF matrix:
    scalar pandas_udf / grouped applyInPandas / mapInPandas / UDTF /
    window grouped-agg): per-partition median absolute deviation
    attached to every row via OVER (PARTITION BY ...) — a statistic with
    no Catalyst built-in, Arrow-batched per frame. The oracle derives
    the same constant-per-partition value by group-level medians joined
    back."""
    import pandas as pd  # noqa: F401

    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 5000)

    @F.pandas_udf("double")
    def mad_udf(v: pd.Series) -> float:
        # raw value out; rounding happens JVM-side (F.round is half-up,
        # matching DuckDB ROUND — python round() is half-even and flips
        # exact .5 boundaries, which sf0.01 happens to hit)
        return float((v - v.median()).abs().median())

    w = Window.partitionBy("o_orderpriority")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(mad_udf("o_totalprice").over(w), 4).alias("mad_price"),
    )


@query(
    "udaf_grouped_arrow_trimmed_mean",
    oracle="""
    WITH ranked AS (
      SELECT l_returnflag, l_quantity,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY l_quantity, l_orderkey,
                                         l_linenumber) AS rk,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    ), mid AS (
      SELECT l_returnflag, l_quantity, n,
             CAST(FLOOR(n * 0.1) AS BIGINT) AS k
      FROM ranked
      WHERE rk > CAST(FLOOR(n * 0.1) AS BIGINT)
        AND rk <= n - CAST(FLOOR(n * 0.1) AS BIGINT)
    )
    SELECT l_returnflag,
           ANY_VALUE(n) AS n_rows,
           COUNT(*) AS n_kept,
           FLOOR(CAST(SUM(l_quantity) AS DOUBLE) * 1000000.0 / COUNT(*))
               / 1000000.0 AS trimmed_mean_qty
    FROM mid GROUP BY l_returnflag
    """,
)
def udaf_grouped_arrow_trimmed_mean(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """UDAF on the ARROW-NATIVE lane (applyInArrow, Spark 4): 10% trimmed
    mean per group — the robust average with no Catalyst built-in. The
    group arrives as a pyarrow.Table (zero pandas conversion — the lane
    to use when the kernel is numpy/arrow-compute anyway); values sort
    once in numpy, the trim is integer index arithmetic, and the mean is
    one floor-fixed-point ratio of exact integers. The groupBy is the
    only shuffle; at scale guard giant groups the same way as the pandas
    UDAF twin (udaf_grouped_mad)."""
    import math

    import pyarrow as pa

    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("bigint").alias("q")
    )

    def trimmed(t: pa.Table) -> pa.Table:
        import numpy as np

        q = np.sort(t.column("q").to_numpy())
        n = len(q)
        k = int(math.floor(n * 0.1))
        mid = q[k : n - k]
        tm = math.floor(float(mid.sum()) * 1_000_000.0 / len(mid)) / 1e6
        return pa.table(
            {
                "l_returnflag": [t.column("l_returnflag")[0].as_py()],
                "n_rows": [n],
                "n_kept": [len(mid)],
                "trimmed_mean_qty": [tm],
            }
        )

    return li.groupBy("l_returnflag").applyInArrow(
        trimmed,
        "l_returnflag string, n_rows long, n_kept long, "
        "trimmed_mean_qty double",
    )


@query(
    "multimodal_audio_segments",
    # fake-pcm slicing is pure integer byte arithmetic: seg_bytes =
    # 20ms * 8B/ms = 160, n_segs = max(ceil(nb/160), 1), last chunk is
    # nb - i*160 bytes, dur = ceil(chunk/8).  strlen = BYTE length
    # (payload is text.encode('utf-8')).
    oracle="""
    WITH d AS (
      SELECT doc_id, strlen(text) AS nb
      FROM documents WHERE doc_id < 100
    ), s AS (
      SELECT doc_id, nb,
             GREATEST((nb + 159) // 160, 1) AS n_segs
      FROM d
    )
    SELECT s.doc_id, CAST(t.i AS INT) AS seg_idx,
           t.i * 20 AS offset_ms,
           (LEAST(s.nb - t.i * 160, 160) + 7) // 8 AS dur_ms
    FROM s, UNNEST(range(0, s.n_segs)) t(i)
    """,
)
def multimodal_audio_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio segmentation plumbing (operators/multimodal.py::
    segment_audio): binary payloads fan out to fixed-duration segment
    rows via mapInPandas (codec-stubbed deterministic slicer — real
    decode plugs in at the marked point; the wav twin below drives the
    REAL container decode). The oracle replays the fake-pcm byte
    arithmetic exactly (integer-only, no rounding surface); byte-exact
    reconstruction is additionally pinned in tests/test_multimodal.py."""
    from rtdl_spark.operators.multimodal import (
        attach_binary_payload,
        segment_audio,
    )

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return segment_audio(
        attach_binary_payload(docs), seg_ms=20, bytes_per_ms=8,
        fake_decode=True,
    ).drop("segment")


@query(
    "multimodal_wav_segments",
    # With framerate=1000 and sampwidth=2, every duration is an exact
    # integer (frames == milliseconds), so the real-decode output is
    # fully SQL-derivable from the text byte length: n_frames =
    # bytes//2, 250-frame segments, a 44-byte RIFF/PCM header per
    # re-encoded segment.
    oracle="""
    WITH d AS (
      -- strlen = BYTE length, matching the Spark side's utf-8 encode
      -- (LENGTH counts characters and silently diverges on multibyte text)
      SELECT doc_id, strlen(text) AS nb
      FROM documents WHERE doc_id < 100
    ), f AS (
      SELECT doc_id, nb // 2 AS nframes FROM d
    )
    SELECT f.doc_id, t.i AS seg_idx,
           t.i * 250 AS offset_ms,
           LEAST(f.nframes - t.i * 250, 250) AS dur_ms,
           LEAST(f.nframes - t.i * 250, 250) * 2 + 44 AS wav_bytes
    FROM f, UNNEST(range(0, GREATEST(
        CAST(CEIL(f.nframes / 250.0) AS BIGINT), 1))) t(i)
    """,
)
def multimodal_wav_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio container decode end-to-end (operators/multimodal.py::
    segment_audio(codec="wav")): document text bytes become 16-bit PCM
    WAV payloads (stdlib wave encoder), the segmenter parses the RIFF
    header and cuts sample-accurate 250 ms windows, each re-encoded as a
    standalone playable WAV. The oracle derives every (seg_idx,
    offset_ms, dur_ms, wav_bytes) from the text length alone — header
    parsing, frame math, and re-encode overhead are all hash-verified,
    no codec stub anywhere on this path."""
    from pyspark.sql.types import BinaryType

    from rtdl_spark.operators.multimodal import make_wav, segment_audio

    @pandas_udf(BinaryType())
    def to_wav(texts: pd.Series) -> pd.Series:
        def enc(t: str) -> bytes:
            b = t.encode("utf-8")
            return make_wav(b[: (len(b) // 2) * 2], framerate=1000)

        return texts.map(enc)

    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", to_wav(F.col("text")).alias("payload"))
    )
    segs = segment_audio(docs, seg_ms=250, codec="wav")
    return segs.select(
        "doc_id",
        "seg_idx",
        "offset_ms",
        "dur_ms",
        F.length("segment").alias("wav_bytes"),
    )


def _to_ppm_udf():
    """documents.text → P5 grayscale PPM payload: 16 px wide, height =
    max(byte_len // 16, 1) rows (make_ppm zero-pads a short last image).
    Built lazily (pandas_udf needs an active session)."""
    from pyspark.sql.types import BinaryType

    from rtdl_spark.functions.imagecodec import make_ppm

    @pandas_udf(BinaryType())
    def _to_ppm(texts: pd.Series) -> pd.Series:
        def enc(t: str) -> bytes:
            b = t.encode("utf-8")
            return make_ppm(b, 16, max(len(b) // 16, 1), 1)

        return texts.map(enc)

    return _to_ppm


@query(
    "multimodal_image_resize",
    # Every output pixel is SQL-derivable: source pixel (sy, sx) is text
    # byte sy*16+sx (0 beyond the end — make_ppm zero-pads), and the
    # nearest-neighbor map is pure floor division: sy=(y*src_h)//8,
    # sx=(x*16)//8. strlen = BYTE length (ASCII fixtures; the payload is
    # text.encode('utf-8')).
    oracle="""
    WITH dims AS (
      SELECT doc_id, text, strlen(text) AS nb,
             GREATEST(strlen(text) // 16, 1) AS src_h
      FROM documents WHERE doc_id < 100
    )
    SELECT d.doc_id, CAST(y.y AS INT) AS y, CAST(x.x AS INT) AS x,
           CAST(CASE WHEN ((y.y * d.src_h) // 8) * 16 + ((x.x * 16) // 8)
                          < d.nb
                THEN ascii(d.text[CAST(((y.y * d.src_h) // 8) * 16
                                       + ((x.x * 16) // 8) + 1 AS INT)])
                ELSE 0 END AS INT) AS pixel
    FROM dims d, UNNEST(range(0, 8)) y(y), UNNEST(range(0, 8)) x(x)
    """,
)
def multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end (operators/multimodal.py::
    resize_media(codec="ppm"), functions/imagecodec.py): document bytes
    become P5 grayscale images, the resizer parses the container and
    nearest-neighbor-resamples to 8×8 with integer floor-division index
    math, re-encoding a valid PPM — then the output container is parsed
    AGAIN and exploded to one row per pixel, so header handling, the
    resample map, and the re-encode are all hash-verified against pure
    SQL byte arithmetic. The image twin of multimodal_wav_segments."""
    from rtdl_spark.functions.imagecodec import parse_ppm
    from rtdl_spark.operators.multimodal import resize_media

    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", _to_ppm_udf()(F.col("text")).alias("payload"))
    )
    resized = resize_media(docs, 8, 8, codec="ppm")

    @pandas_udf("array<int>")
    def _pixels(payloads: pd.Series) -> pd.Series:
        return payloads.map(lambda p: list(parse_ppm(bytes(p))[3]))

    return (
        resized.select("doc_id", _pixels(F.col("payload")).alias("px"))
        .select("doc_id", F.posexplode("px").alias("pos", "pixel"))
        .select(
            "doc_id",
            (F.col("pos") / 8).cast("int").alias("y"),
            (F.col("pos") % 8).cast("int").alias("x"),
            "pixel",
        )
    )


@query(
    "multimodal_image_ahash",
    # The average-hash is ALL-INTEGER: 10×6 nearest-neighbor downscale
    # (floor-division index map over the text bytes), bit = 60·px > Σpx
    # (integer cross-multiplication — no division), MSB-first fold
    # h*2+b (fold(0,b0)==b0, so the init-less list_reduce matches).
    oracle="""
    WITH dims AS (
      SELECT doc_id, text, strlen(text) AS nb,
             GREATEST(strlen(text) // 16, 1) AS src_h
      FROM documents WHERE doc_id < 200
    ), small AS (
      SELECT d.doc_id, y.y * 10 + x.x AS ord,
             CASE WHEN ((y.y * d.src_h) // 6) * 16 + ((x.x * 16) // 10)
                       < d.nb
             THEN ascii(d.text[CAST(((y.y * d.src_h) // 6) * 16
                                    + ((x.x * 16) // 10) + 1 AS INT)])
             ELSE 0 END AS px
      FROM dims d, UNNEST(range(0, 6)) y(y), UNNEST(range(0, 10)) x(x)
    ), tot AS (
      SELECT doc_id, SUM(px) AS s FROM small GROUP BY doc_id
    ), bits AS (
      SELECT sm.doc_id, sm.ord,
             CASE WHEN 60 * sm.px > t.s THEN 1 ELSE 0 END AS b
      FROM small sm JOIN tot t USING (doc_id)
    )
    SELECT doc_id,
           list_reduce(list(CAST(b AS BIGINT) ORDER BY ord),
                       (h, c) -> h * 2 + c) AS phash
    FROM bits GROUP BY doc_id
    """,
)
def multimodal_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL perceptual hashing end-to-end (operators/multimodal.py::
    perceptual_hash(codec="ppm") → image_hash_bits): P5 container decode,
    integer grayscale, 10×6 nearest downscale, average-hash 60-bit fold —
    every bit SQL-replayable because the whole kernel is integer
    arithmetic. The banded near-dup join over this column is the same
    phash_near_dup_pairs plumbing already driver-verified on the md5
    path; the noise-robust DCT variant (method="dct") is pinned by unit
    tests (floats aren't oracle territory)."""
    from rtdl_spark.operators.multimodal import perceptual_hash

    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", _to_ppm_udf()(F.col("text")).alias("payload"))
    )
    return perceptual_hash(docs, codec="ppm").select("doc_id", "phash")


@query(
    "multimodal_image_png_ahash",
    # Same all-integer ahash replay as multimodal_image_ahash — on
    # purpose: the payloads here are REAL zlib-compressed PNGs
    # (Paeth-filtered scanlines), so a hash match proves the DEFLATE
    # stream, chunk CRCs, and filter reconstruction recover the exact
    # pixel bytes the SQL derives from the text directly.
    oracle="""
    WITH dims AS (
      SELECT doc_id, text, strlen(text) AS nb,
             GREATEST(strlen(text) // 16, 1) AS src_h
      FROM documents WHERE doc_id < 200
    ), small AS (
      SELECT d.doc_id, y.y * 10 + x.x AS ord,
             CASE WHEN ((y.y * d.src_h) // 6) * 16 + ((x.x * 16) // 10)
                       < d.nb
             THEN ascii(d.text[CAST(((y.y * d.src_h) // 6) * 16
                                    + ((x.x * 16) // 10) + 1 AS INT)])
             ELSE 0 END AS px
      FROM dims d, UNNEST(range(0, 6)) y(y), UNNEST(range(0, 10)) x(x)
    ), tot AS (
      SELECT doc_id, SUM(px) AS s FROM small GROUP BY doc_id
    ), bits AS (
      SELECT sm.doc_id, sm.ord,
             CASE WHEN 60 * sm.px > t.s THEN 1 ELSE 0 END AS b
      FROM small sm JOIN tot t USING (doc_id)
    )
    SELECT doc_id,
           list_reduce(list(CAST(b AS BIGINT) ORDER BY ord),
                       (h, c) -> h * 2 + c) AS phash
    FROM bits GROUP BY doc_id
    """,
)
def multimodal_image_png_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL COMPRESSED-format decode end-to-end (r5: the plug point the
    r3/r4 verdicts tracked, filled with zero non-stdlib dependency):
    document bytes become Paeth-filtered, zlib-DEFLATEd PNGs
    (functions/imagecodec.py::make_png), and
    perceptual_hash(codec="png") walks the chunk grammar, verifies CRCs,
    inflates the IDAT stream, reconstructs the filtered scanlines and
    average-hashes the recovered pixels — hash-verified against the same
    pure-SQL byte arithmetic as the uncompressed lane, which is exactly
    what proves the decompression is lossless-correct. JPEG/WebP (DCT /
    VP8 entropy coders, not in the stdlib) remain the only library plug
    points."""
    from pyspark.sql.types import BinaryType

    from rtdl_spark.functions.imagecodec import make_png
    from rtdl_spark.operators.multimodal import perceptual_hash

    @pandas_udf(BinaryType())
    def to_png(texts: pd.Series) -> pd.Series:
        def enc(t: str) -> bytes:
            b = t.encode("utf-8")
            return make_png(b, 16, max(len(b) // 16, 1), 1, filter_type=4)

        return texts.map(enc)

    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", to_png(F.col("text")).alias("payload"))
    )
    return perceptual_hash(docs, codec="png").select("doc_id", "phash")


@query(
    "multimodal_image_jpeg_roundtrip",
    # How a LOSSY codec still gets an exact oracle: at quality=100 every
    # Annex-K quant entry scales to 1, so a CONSTANT 8×8 block is
    # bit-exact through the full DCT+Huffman pipeline (DC = 8·(c−128) is
    # an integer, AC = 0). The image is 3×2 such tiles with per-tile
    # values (doc_id·31 + t·37) % 256 — six different DCs exercising the
    # DC differential predictor — and it survives TWO encode/decode trips
    # (build → lane resize re-encode → verify decode). The oracle just
    # recomputes the tile formula; px_min==px_max pins within-tile
    # constancy of every decoded pixel.
    oracle="""
    SELECT d.doc_id, CAST(t.t AS INT) AS tile,
           CAST((d.doc_id * 31 + t.t * 37) % 256 AS INT) AS px_min,
           CAST((d.doc_id * 31 + t.t * 37) % 256 AS INT) AS px_max
    FROM documents d, UNNEST(range(0, 6)) t(t)
    WHERE d.doc_id < 150
    """,
)
def multimodal_image_jpeg_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REAL baseline JPEG, encode AND decode, no PIL/libjpeg
    (functions/jpegcodec.py, r5 — retires the DCT-codec plug point):
    per-document 24×16 grayscale JPEGs built from six constant 8×8 tiles
    go through the resize_media(codec="jpeg") lane (decode → identity
    nearest-neighbor resample → quality-100 re-encode), then the output
    container is decoded AGAIN and exploded per tile. Marker grammar,
    Annex-K tables, canonical Huffman coding, byte stuffing, zig-zag,
    the DC prediction chain and the vectorized DCT/IDCT are all on the
    hash-verified path — twice."""
    import numpy as np
    from pyspark.sql.types import BinaryType

    from rtdl_spark.functions.jpegcodec import make_jpeg, parse_jpeg
    from rtdl_spark.operators.multimodal import resize_media

    @pandas_udf(BinaryType())
    def to_jpeg(ids: pd.Series) -> pd.Series:
        def enc(doc_id: int) -> bytes:
            a = np.zeros((16, 24), np.uint8)
            for t in range(6):
                ty, tx = divmod(t, 3)
                a[ty * 8:(ty + 1) * 8, tx * 8:(tx + 1) * 8] = (
                    doc_id * 31 + t * 37
                ) % 256
            return make_jpeg(a.tobytes(), 24, 16, 1, quality=100)

        return ids.map(enc)

    @pandas_udf("array<struct<tile:int,px_min:int,px_max:int>>")
    def tile_stats(payloads: pd.Series) -> pd.Series:
        def stats(p: bytes) -> list:
            w, h, ch, px = parse_jpeg(bytes(p))
            a = np.frombuffer(px, np.uint8).reshape(h, w)
            out = []
            for t in range(6):
                ty, tx = divmod(t, 3)
                tile = a[ty * 8:(ty + 1) * 8, tx * 8:(tx + 1) * 8]
                out.append((t, int(tile.min()), int(tile.max())))
            return out

        return payloads.map(stats)

    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 150)
        .select("doc_id", to_jpeg(F.col("doc_id")).alias("payload"))
    )
    resized = resize_media(docs, 24, 16, codec="jpeg")
    return (
        resized.select(
            "doc_id", F.explode(tile_stats(F.col("payload"))).alias("s")
        )
        .select("doc_id", "s.tile", "s.px_min", "s.px_max")
    )


@query(
    "x_image_ahash_full",
    # sim of multimodal_image_ahash, uncapped — and the same all-integer
    # SQL replay, so the bench twin stays hash-verified at every scale.
    oracle="""
    WITH dims AS (
      SELECT doc_id, text, strlen(text) AS nb,
             GREATEST(strlen(text) // 16, 1) AS src_h
      FROM documents
    ), small AS (
      SELECT d.doc_id, y.y * 10 + x.x AS ord,
             CASE WHEN ((y.y * d.src_h) // 6) * 16 + ((x.x * 16) // 10)
                       < d.nb
             THEN ascii(d.text[CAST(((y.y * d.src_h) // 6) * 16
                                    + ((x.x * 16) // 10) + 1 AS INT)])
             ELSE 0 END AS px
      FROM dims d, UNNEST(range(0, 6)) y(y), UNNEST(range(0, 10)) x(x)
    ), tot AS (
      SELECT doc_id, SUM(px) AS s FROM small GROUP BY doc_id
    ), bits AS (
      SELECT sm.doc_id, sm.ord,
             CASE WHEN 60 * sm.px > t.s THEN 1 ELSE 0 END AS b
      FROM small sm JOIN tot t USING (doc_id)
    )
    SELECT doc_id,
           list_reduce(list(CAST(b AS BIGINT) ORDER BY ord),
                       (h, c) -> h * 2 + c) AS phash
    FROM bits GROUP BY doc_id
    """,
)
def x_image_ahash_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench twin of multimodal_image_ahash (x_ prefix → headline set):
    REAL image decode + perceptual hashing over the UNCAPPED document
    corpus — per-round throughput of the container-parse → integer
    downscale → 60-bit fold pipeline (the mapInPandas decode lane a
    compressed codec would slot into)."""
    from rtdl_spark.operators.multimodal import perceptual_hash

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", _to_ppm_udf()(F.col("text")).alias("payload")
    )
    return perceptual_hash(docs, codec="ppm").select("doc_id", "phash")


@query(
    "multimodal_video_frames",
    # The 'video' is a concatenated stream of 16×6 P5 frames built from
    # consecutive 96-byte text chunks (the last zero-padded), so every
    # output is integer byte arithmetic: total = max(ceil(nb/96), 1),
    # sampled source frame fi = (frame_idx·total)//4 (cv2-style evenly
    # spaced grabs), per-frame re-encode is header(12B: 'P5\\n16 6\\n255\\n')
    # + 96 pixel bytes, and the pixel sum ranges over the chunk with
    # zeros beyond the text end.
    oracle="""
    WITH t AS (
      SELECT doc_id, text, strlen(text) AS nb,
             GREATEST((strlen(text) + 95) // 96, 1) AS total
      FROM documents WHERE doc_id < 100
    ), f AS (
      SELECT t.doc_id, i.i AS frame_idx, t.total,
             (i.i * t.total) // 4 AS fi, t.text, t.nb
      FROM t, UNNEST(range(0, 4)) i(i)
    )
    SELECT f.doc_id, CAST(f.frame_idx AS INT) AS frame_idx,
           f.total AS total_frames,
           CAST(108 AS INT) AS frame_bytes,
           CAST(SUM(CASE WHEN f.fi * 96 + j.j < f.nb
                    THEN ascii(f.text[CAST(f.fi * 96 + j.j + 1 AS INT)])
                    ELSE 0 END) AS BIGINT) AS pixel_sum
    FROM f, UNNEST(range(0, 96)) j(j)
    GROUP BY f.doc_id, f.frame_idx, f.total
    """,
)
def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-container decode end-to-end (operators/multimodal.py::
    sample_frames(codec="ppm-stream") — the video leg of the WAV/PPM
    real-codec trio): document bytes become a concatenated stream of
    16×6 grayscale frames, the sampler parses frame headers to walk the
    container, grabs 4 evenly-spaced frames over the TRUE frame count,
    and re-encodes each as a standalone image — then each sampled frame
    is parsed AGAIN and reduced to its pixel sum, so container walking,
    the grab positions, the re-encode size, and the pixel content are
    all hash-verified against pure SQL byte arithmetic."""
    from pyspark.sql.types import BinaryType

    from rtdl_spark.functions.imagecodec import make_ppm, parse_ppm
    from rtdl_spark.operators.multimodal import sample_frames

    @pandas_udf(BinaryType())
    def to_stream(texts: pd.Series) -> pd.Series:
        def enc(t: str) -> bytes:
            b = t.encode("utf-8")
            total = max(-(-len(b) // 96), 1)
            return b"".join(
                make_ppm(b[i * 96 : (i + 1) * 96], 16, 6, 1)
                for i in range(total)
            )

        return texts.map(enc)

    @pandas_udf("long")
    def pixel_sum(frames: pd.Series) -> pd.Series:
        return frames.map(
            lambda fr: int(sum(parse_ppm(bytes(fr))[3]))
        ).astype("int64")

    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", to_stream(F.col("text")).alias("payload"))
    )
    sampled = sample_frames(docs, n_frames=4, codec="ppm-stream")
    return sampled.select(
        "doc_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.col("n_frames").alias("total_frames"),
        F.length("frame").alias("frame_bytes"),
        pixel_sum(F.col("frame")).alias("pixel_sum"),
    )
