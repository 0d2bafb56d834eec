"""Query registry: every operator from SURVEY.md §2 exposed as a named
(spark, sf_dir) -> DataFrame callable, with a matching DuckDB oracle SQL
string where the semantics are ANSI-SQL-expressible.

Modules self-register via the @query decorator at import time.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query; ``oracle`` is the DuckDB-dialect equivalent SQL.

    Parity rules (so the driver's row-count + schema + value-hash compare
    passes):
    - alias every computed column identically on both sides;
    - money aggregates go through DECIMAL casts (exact, engine-independent)
      and are cast back to DOUBLE at the end;
    - genuinely floating results (avg/stddev/corr/cosine) are rounded to a
      fixed scale on BOTH sides;
    - no SELECT *: stable explicit projections only.
    """

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _import_all()
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    _import_all()
    return dict(ORACLE)


def _import_all() -> None:
    from rtdl_spark.queries import (  # noqa: F401
        aggregates,
        dedup,
        joins,
        json_schema,
        lake,
        mleval,
        scalars,
        similarity,
        sqltext,
        text,
        tpch,
        tpch2,
        udfs,
        windows,
    )
