"""Spark 4 SQL-text surface (SURVEY.md §2B): the newer ANSI/Spark-4
language features a Dremio-replacement engine must speak — recursive CTEs,
SQL pipe syntax, GROUP BY ALL / ORDER BY ALL, parameterized statements,
and collation-aware comparison. All run through ``spark.sql`` over the
catalog-registered views, like sql_revenue_by_region.

Every entry's plan is ordinary Catalyst output (the sugar desugars before
optimization), so the usual pushdown/pruning/codegen properties hold; the
recursive CTE executes as Spark's iterative UnionLoop — depth is bounded
by the data (months of a date range here, never row count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from rtdl_spark.catalog import register_views
from rtdl_spark.queries import query
from rtdl_spark.queries._util import DEC


@query(
    "sql_recursive_cte",
    oracle="""
    WITH RECURSIVE months(m, mx) AS (
      SELECT DATE_TRUNC('month', MIN(o_orderdate)),
             DATE_TRUNC('month', MAX(o_orderdate)) FROM orders
      UNION ALL
      SELECT m + INTERVAL 1 MONTH, mx FROM months WHERE m < mx
    )
    SELECT m AS month_start, COUNT(o_orderkey) AS n_orders
    FROM months LEFT JOIN orders
      ON DATE_TRUNC('month', o_orderdate) = m
    GROUP BY m
    """,
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE month spine over the order-date range + left join —
    the gap-free resample/dashboard primitive written in pure SQL text
    (Spark 4 recursive CTE). Recursion depth = number of months in the
    data range, independent of row count; the max bound rides along in
    the recursive frame so nothing re-scans the table per iteration;
    the per-month count is one hash aggregate."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE months(m, mx) AS (
          SELECT DATE_TRUNC('month', MIN(o_orderdate)),
                 DATE_TRUNC('month', MAX(o_orderdate)) FROM orders
          UNION ALL
          SELECT m + INTERVAL 1 MONTH, mx FROM months WHERE m < mx
        )
        SELECT m AS month_start,
               COUNT(o_orderkey) AS n_orders
        FROM months LEFT JOIN orders
          ON DATE_TRUNC('month', CAST(o_orderdate AS TIMESTAMP)) = m
        GROUP BY m
        """
    )


@query(
    "sql_pipe_syntax",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM({DEC('l_quantity')}) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4 `|>` operators): q1's scan → filter →
    aggregate written as a left-to-right pipeline. Desugars to the
    identical logical plan as the SELECT form — same pushdown, same
    partial aggregation — so the feature is purely ergonomic surface."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate <= DATE '1998-09-02'
        |> AGGREGATE CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                          AS DOUBLE) AS sum_qty,
                     COUNT(*) AS n_rows
           GROUP BY l_returnflag, l_linestatus
        |> SELECT l_returnflag, l_linestatus, sum_qty, n_rows
        """
    )


@query(
    "sql_group_by_all",
    oracle="""
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
           CAST(MIN(o_orderdate) AS DATE) AS first_date
    FROM orders
    GROUP BY o_orderpriority, o_orderstatus
    """,
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL — every non-aggregate select item becomes a grouping
    key (the analyst-ergonomics form); resolves at analysis time to the
    explicit GROUP BY, so the physical plan is the usual two-phase hash
    aggregate."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
               MIN(o_orderdate) AS first_date
        FROM orders
        GROUP BY ALL
        """
    )


@query(
    "sql_parameterized",
    oracle=f"""
    SELECT l_returnflag,
           CAST(SUM({DEC('l_extendedprice')}) AS DOUBLE) AS sum_price,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_quantity >= 30 AND l_shipdate < DATE '1997-01-01'
    GROUP BY l_returnflag
    """,
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL (spark.sql(..., args=...)): the injection-safe
    templated-query surface a service layer needs. Parameters bind as
    literals BEFORE optimization, so constant folding and parquet filter
    pushdown see the concrete values — identical plan to hand-inlined
    literals (no prepared-statement opacity)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                    AS DOUBLE) AS sum_price,
               COUNT(*) AS n
        FROM lineitem
        WHERE l_quantity >= :min_qty AND l_shipdate < :before
        GROUP BY l_returnflag
        """,
        args={"min_qty": 30, "before": "1997-01-01"},
    )


@query(
    "sql_collation_compare",
    oracle="""
    SELECT n_name,
           CASE WHEN lower(n_name) = lower('nation_' || CAST(n_nationkey
                AS VARCHAR)) THEN 1 ELSE 0 END AS ci_match,
           CASE WHEN n_name = 'NATION_' || CAST(n_nationkey AS VARCHAR)
                THEN 1 ELSE 0 END AS cs_match
    FROM nation
    """,
)
def sql_collation_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware comparison (Spark 4 COLLATE): UNICODE_CI equality
    vs binary equality on the same strings — the case-insensitive join/
    filter semantics warehouses expect, pushed into the expression layer
    instead of lower()-wrapping every predicate (which would defeat
    statistics and pushdown on collated columns)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_name,
               CASE WHEN n_name = ('nation_' || CAST(n_nationkey AS STRING))
                         COLLATE UNICODE_CI
                    THEN 1 ELSE 0 END AS ci_match,
               CASE WHEN n_name = 'NATION_' || CAST(n_nationkey AS STRING)
                    THEN 1 ELSE 0 END AS cs_match
        FROM nation
        """
    )
