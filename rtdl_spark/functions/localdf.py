"""Single-partition DataFrames for tiny driver-built tables.

``spark.createDataFrame(list)`` parallelizes the data into
``defaultParallelism`` slices, so every materialization of a 20-row
broadcast table (centroid sets, probe LUTs, file→bin maps, …) launches a
defaultParallelism-task job — measured at ~0.25 s of pure task-scheduling
overhead per build on local[32] (r10; guide §1.2: per-task work after the
job shape). One partition is the right shape for data that by
construction fits on the driver; anything bigger should not come through
this path at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_df(spark: SparkSession, data, schema) -> DataFrame:
    """``spark.createDataFrame(data, schema)`` with ONE partition."""
    data = data if isinstance(data, list) else list(data)
    if not data:
        # empty parallelize + schema is fine, but keep the stock path:
        # it returns the same empty frame without touching the RDD API
        return spark.createDataFrame(data, schema)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(data, 1), schema
    )
