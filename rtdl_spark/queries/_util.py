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
