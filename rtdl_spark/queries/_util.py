"""Shared helpers for oracle-parity queries.

Money/price columns in the fixtures are doubles carrying 2-decimal values.
Summing doubles is order-dependent, and Spark and DuckDB will not agree
bit-for-bit; casting to DECIMAL first makes every +,*,SUM exact and
engine-independent, after which a final cast to DOUBLE is identical on both
sides. ``dec(col)`` / the ``DEC(col)`` SQL fragment implement that contract.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC_TYPE = "decimal(18,2)"


def dec(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC_TYPE)


def DEC(sql_expr: str) -> str:
    """DuckDB-side twin of ``dec``."""
    return f"CAST({sql_expr} AS DECIMAL(18,2))"


def dsum(col: Column) -> Column:
    """Exact decimal sum surfaced as double (bit-identical across engines)."""
    return F.sum(col).cast("double")


def revenue_expr() -> Column:
    """l_extendedprice * (1 - l_discount) in exact decimal arithmetic."""
    return dec("l_extendedprice") * (F.lit(1).cast(DEC_TYPE) - dec("l_discount"))


REVENUE_SQL = (
    f"{DEC('l_extendedprice')} * (CAST(1 AS DECIMAL(18,2)) - {DEC('l_discount')})"
)


def local_result(spark, rows, schema):
    """Materialized tiny-summary result frame (r11): the x_/lake twins
    collect their answer before their scratch dir dies and hand it back
    as a frame. ``spark.createDataFrame(rows, schema)`` fans the handful
    of rows into a defaultParallelism-task job that the caller's count/
    collect then pays (~0.2 s on local[32]); routing through
    functions.localdf.local_df yields a LocalRelation (zero jobs) when
    the rows/schema are encodable, and otherwise falls back to a ONE-
    partition parallelize — behavior is a strict superset either way
    (exact-schema-match-or-fallback is enforced inside local_df)."""
    from rtdl_spark.functions.localdf import local_df

    return local_df(spark, rows, schema)
