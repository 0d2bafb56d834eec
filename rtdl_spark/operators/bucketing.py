"""Bucketed-table co-location — shuffle-free fact⋈fact joins at scale.

The one shuffle the TPC-H surface cannot avoid (SCALE.md) is the fact-fact
join on the natural key: lineitem⋈orders on orderkey. Bucketing removes it:
both tables are written pre-hash-partitioned into the same number of buckets
on the join key, so the join (and any groupBy on that key) runs map-side,
exchange-free — the classic strategy for a join repeated by many queries
over the same 100 TB fact tables.

This is a *write-time* contract, so it lives here as a lake operation:
``write_bucketed`` registers the bucketed tables in the session catalog
(bucket metadata lives in the metastore, not the parquet files), and
``bucketed_join`` reads them back. ``tests/test_plans.py`` asserts the
resulting join plan has zero shuffle exchanges.

Trade-offs, for the record: bucket counts must match (or be multiples,
with ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``); writes incur
the shuffle once instead of per-query; choose bucket count ≈ total data /
(target 128 MiB × growth headroom). The reference has no equivalent — its
files are one-per-message (ingester.go:551-565) and co-location is
impossible; this is part of what "Spark-first redesign" buys.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from rtdl_spark.catalog import sanitize_identifier


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
    database: str = "lake",
) -> str:
    """Write ``df`` as a catalog-managed bucketed table; returns the
    qualified name. Sorting within buckets additionally enables
    merge-join without a sort step."""
    spark = df.sparkSession
    db = sanitize_identifier(database)
    tbl = f"{db}.{sanitize_identifier(table_name)}"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS `{db}`")
    # Idempotent: drop the table AND any orphaned managed location (a
    # crashed prior run can leave the directory without catalog metadata,
    # which blocks managed-table creation).
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(
        warehouse.removeprefix("file:"),
        f"{db}.db",
        sanitize_identifier(table_name),
    )
    if os.path.isdir(loc):
        shutil.rmtree(loc, ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(tbl, format="parquet")
    return tbl


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key. With
    matching bucket specs Catalyst plans a SortMergeJoin with NO exchange
    on either side (output partitioning already satisfies the join's
    distribution requirement)."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
