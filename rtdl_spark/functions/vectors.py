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
