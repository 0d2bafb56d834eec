"""Vector math over ``array<float>`` embedding columns (SURVEY.md §2C).

Built on Catalyst higher-order functions (zip_with/aggregate) so the dot
products run JVM-side inside codegen. Components are widened to double
*before* multiplication and accumulated left-to-right — the same order
DuckDB's list_cosine_similarity uses, which keeps oracle comparisons within
1 ulp (outputs are still rounded when hashed)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double(vec: Column | str) -> Column:
    c = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(to_double(a), to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_sq(a: Column) -> Column:
    return F.aggregate(
        to_double(a), F.lit(0.0), lambda acc, x: acc + x * x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(norm_sq(a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL (not an error) for zero-norm vectors —
    under ANSI mode (Spark 4 default) a plain x/0 fails the whole job, and
    padding/null embeddings do occur in real corpora."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom)


def quantize_int8(vec: Column | str) -> Column:
    """Symmetric per-vector int8 quantization:
    struct(q: array<tinyint>, scale: double) with
    q_i = floor(x_i * 127 / max|x| + 0.5), x_i ≈ q_i / scale.

    floor(x+0.5) (explicit half-up toward +inf) instead of round(): Spark
    brounds doubles half-even while other engines round half-up, and a
    quantizer must be bit-reproducible everywhere for the dedup/ANN keys
    built on it. Zero vectors quantize to zeros with scale 0 (dequantize
    guards on it).

    Why: an int8 corpus is 4× smaller in shuffle/broadcast/cache than
    float32 — at 100 TB of embeddings the scan and the candidate-join
    payloads shrink 4× while top-k recall stays ~1 (8 bits of mantissa
    barely perturbs a 64-d ranking; the recall test pins it). The max|x|
    pass and the scaled pass share one let-bound traversal each."""
    c = F.col(vec) if isinstance(vec, str) else vec
    from rtdl_spark.functions.text import let

    def build(d):
        max_abs = F.array_max(F.transform(d, F.abs))
        return let(
            F.when(max_abs > 0, F.lit(127.0) / max_abs).otherwise(F.lit(0.0)),
            lambda scale: F.struct(
                F.transform(
                    d, lambda x: F.floor(x * scale + F.lit(0.5)).cast("tinyint")
                ).alias("q"),
                scale.alias("scale"),
            ),
        )

    return let(to_double(c), build)


def dequantize(qs: Column) -> Column:
    """struct(q, scale) -> array<double>; zero-scale (zero vector) maps
    back to zeros rather than dividing by 0 (ANSI-safe)."""
    return F.transform(
        qs["q"],
        lambda x: F.when(
            qs["scale"] > 0, x.cast("double") / qs["scale"]
        ).otherwise(F.lit(0.0)),
    )


def quantized_cosine(qa: Column, qb: Column) -> Column:
    """Cosine over two quantized structs, computed in integer space:
    sum(qa_i*qb_i) / (|qa||qb|) — the scales cancel, so cosine needs no
    dequantization at all (the property that makes int8 ANN cheap)."""
    num = F.aggregate(
        F.zip_with(
            qa["q"], qb["q"], lambda x, y: x.cast("long") * y.cast("long")
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    ).cast("double")
    na = F.sqrt(
        F.aggregate(
            qa["q"],
            F.lit(0).cast("long"),
            lambda acc, x: acc + x.cast("long") * x.cast("long"),
        ).cast("double")
    )
    nb = F.sqrt(
        F.aggregate(
            qb["q"],
            F.lit(0).cast("long"),
            lambda acc, x: acc + x.cast("long") * x.cast("long"),
        ).cast("double")
    )
    return F.when(na * nb > 0, num / (na * nb))
