"""Time-partition bucket derivations — A9 parity
(reference ingester/ingester.go:522-548, constants/partition_times.json).

The reference computes the bucket from wall-clock at write time; here the
bucket is a real column derived from any timestamp (event time or
F.current_timestamp() for processing-time parity), which makes the folder
layout a *partition column* Spark can prune on — an improvement over the
reference, where the folder name is not a column in the data.

Formats: hourly 'yyyy-MM-dd-HH', daily 'yyyy-MM-dd', weekly
'<ISOyear>-<ISOweek>' (unpadded, per Go's strconv.Itoa of ISOWeek()),
monthly 'yyyy-MM', quarterly '<year>-<quarter>' (the reference's Go code
has a string(int)→rune bug here; we implement the documented intent).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PARTITION_TIMES = ("hourly", "daily", "weekly", "monthly", "quarterly")

# rtdl constants/partition_times.json: 1=hourly 2=daily 3=weekly 4=monthly
# 5=quarterly
PARTITION_TIME_IDS = {i + 1: name for i, name in enumerate(PARTITION_TIMES)}


def partition_bucket(ts: Column, grain: str) -> Column:
    if grain == "hourly":
        return F.date_format(ts, "yyyy-MM-dd-HH")
    if grain == "daily":
        return F.date_format(ts, "yyyy-MM-dd")
    if grain == "weekly":
        return F.concat(
            F.expr(f"extract(YEAROFWEEK FROM {_sql(ts)})").cast("string"),
            F.lit("-"),
            F.weekofyear(ts).cast("string"),
        )
    if grain == "monthly":
        return F.date_format(ts, "yyyy-MM")
    if grain == "quarterly":
        return F.concat(
            F.year(ts).cast("string"), F.lit("-"), F.quarter(ts).cast("string")
        )
    raise ValueError(f"unknown partition grain {grain!r}; use {PARTITION_TIMES}")


def _sql(col: Column) -> str:
    # Column → SQL fragment for use inside F.expr; Column has no public SQL
    # renderer, but the private _jc string is exactly that.
    return str(col._jc)  # noqa: SLF001
