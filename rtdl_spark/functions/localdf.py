"""Driver-built tiny tables as LocalRelations.

``spark.createDataFrame(list)`` parallelizes the data into
``defaultParallelism`` slices, so every materialization of a 20-row
broadcast table (centroid sets, probe LUTs, file→bin maps, …) launched a
defaultParallelism-task job — measured at ~0.25 s of pure task-scheduling
overhead per build on local[32] (r10; guide §1.2). r10 cut that to ONE
task; r11 cuts it to ZERO: the rows are encoded as a SQL ``VALUES``
inline table, which the analyzer resolves to a ``LocalRelation`` — its
``collect``/broadcast-build run driver-side with no Spark job at all
(measured: a cold 1-partition parallelize build paid ~2.5 s of Python
worker startup + one job; the LocalRelation build pays neither, and a
broadcast of it ships straight from the driver).

The SQL encoding covers the types this repo routes through here
(integers, floats — round-tripped through ``repr`` string casts so the
bits survive exactly —, strings, booleans, binary, and arrays thereof);
anything else, any oversized row count, or any encoding surprise falls
back to the r10 single-partition parallelize path, so behavior is a
strict superset. A trailing all-NULL sentinel row (dropped by a foldable
filter, so the plan stays a LocalRelation) pins every column nullable —
the exact schema ``createDataFrame(data, ddl)`` produced."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    ByteType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructType,
)

# plan size stays bounded: a VALUES table is part of the SQL text and the
# logical plan, so huge row sets (the scale-path pv-join maps) keep the
# parallelize shape where one job amortizes fine
_LOCAL_REL_MAX_ROWS = 4096

_INT_TYPES = (ByteType, ShortType, IntegerType, LongType)


class _Unencodable(Exception):
    pass


def _sql_type(dt: DataType) -> str:
    return dt.simpleString()


def _lit(v, dt: DataType) -> str:
    """SQL literal of ``v`` as ``dt`` — exact round-trip or _Unencodable."""
    if v is None:
        return f"CAST(NULL AS {_sql_type(dt)})"
    if isinstance(dt, BooleanType):
        if not isinstance(v, bool):
            raise _Unencodable(repr(v))
        return "TRUE" if v else "FALSE"
    if isinstance(dt, _INT_TYPES):
        if isinstance(v, bool) or not isinstance(v, int):
            raise _Unencodable(repr(v))
        return f"CAST({int(v)} AS {_sql_type(dt)})"
    if isinstance(dt, (DoubleType, FloatType)):
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            raise _Unencodable(repr(v))
        # repr is the shortest exact round-trip; the string cast parses
        # back to the same bits (Infinity/-Infinity/NaN included)
        return f"CAST('{float(v)!r}' AS {_sql_type(dt)})"
    if isinstance(dt, StringType):
        if not isinstance(v, str):
            raise _Unencodable(repr(v))
        if any(ord(c) < 0x20 and c not in "\n\t\r" for c in v):
            # control characters: don't gamble on parser behavior
            raise _Unencodable("control char")
        escaped = v.replace("\\", "\\\\").replace("'", "\\'")
        return f"'{escaped}'"
    if isinstance(dt, BinaryType):
        if not isinstance(v, (bytes, bytearray)):
            raise _Unencodable(repr(v))
        return f"X'{bytes(v).hex()}'"
    if isinstance(dt, ArrayType):
        if not isinstance(v, (list, tuple)):
            raise _Unencodable(repr(v))
        inner = ", ".join(_lit(e, dt.elementType) for e in v)
        return f"CAST(array({inner}) AS {_sql_type(dt)})"
    raise _Unencodable(dt.simpleString())


def _local_relation(
    spark: SparkSession, data: list, schema: StructType
) -> DataFrame:
    names = [f.name for f in schema.fields]
    cols = ", ".join(f"c{i}" for i in range(len(names) + 1))
    rows_sql = []
    for row in data:
        vals = list(row)
        if len(vals) != len(schema.fields):
            raise _Unencodable("row arity")
        rows_sql.append(
            "(1, "
            + ", ".join(
                _lit(v, f.dataType)
                for v, f in zip(vals, schema.fields)
            )
            + ")"
        )
    # all-NULL sentinel row, dropped by the (constant-folded) filter:
    # its presence makes every VALUES column nullable, so the resolved
    # LocalRelation carries the same all-nullable schema
    # createDataFrame(data, ddl) produced
    rows_sql.append(
        "(0, "
        + ", ".join(
            f"CAST(NULL AS {_sql_type(f.dataType)})"
            for f in schema.fields
        )
        + ")"
    )
    sel = ", ".join(
        f"c{i + 1} AS `" + n.replace("`", "``") + "`"
        for i, n in enumerate(names)
    )
    df = spark.sql(
        f"SELECT {sel} FROM (VALUES "
        + ", ".join(rows_sql)
        + f" AS t({cols})) WHERE c0 = 1"
    )
    if not df.schema == schema:
        # e.g. a DDL nullability/metadata nuance the VALUES shape missed
        raise _Unencodable("schema mismatch")
    return df


def local_df(spark: SparkSession, data, schema) -> DataFrame:
    """``spark.createDataFrame(data, schema)`` as a LocalRelation (zero
    jobs) when encodable, else as ONE partition (one job)."""
    data = data if isinstance(data, list) else list(data)
    if not data:
        # empty parallelize + schema is fine, but keep the stock path:
        # it returns the same empty frame without touching the RDD API
        return spark.createDataFrame(data, schema)
    if len(data) <= _LOCAL_REL_MAX_ROWS:
        try:
            sch = (
                schema
                if isinstance(schema, StructType)
                else StructType.fromDDL(schema)
            )
            return _local_relation(spark, data, sch)
        except Exception:
            pass
    return spark.createDataFrame(
        spark.sparkContext.parallelize(data, 1), schema
    )
