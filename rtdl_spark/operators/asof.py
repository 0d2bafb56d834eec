"""As-of (point-in-time) join and banded range join.

Spark has no native ASOF JOIN (DuckDB/Pandas do). The classic scalable
construction is union + window:

  1. tag left/right rows and union them on (key, time);
  2. one window per key ordered by (time, tag) carries the latest right-side
     value forward with last(..., ignoreNulls=True);
  3. keep left rows, now annotated with the most recent right row at-or-before
     their timestamp.

Cost: ONE shuffle of each side on the join key (same as any equi join) plus a
per-key sort — no cross product, no per-row Python, skew handled by AQE.
This is the plan you want at 100 TB; pd.merge_asof via applyInPandas would
move every byte through Arrow instead.

The banded range join replicates one side into fixed-width bands of the
range key so |x - y| <= w becomes an equi join on (key, band) with an exact
residual filter — turning an O(n·m) theta join into a co-partitioned hash
join with ≤3× replication.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    direction: str = "backward",
    tolerance: str | int | float | None = None,
) -> DataFrame:
    """For each left row, attach ``value_cols`` from the most recent right
    row with right_time <= left_time (direction='backward'; 'forward' gives
    the earliest right row with right_time >= left_time), matching on ``on``.

    ``tolerance`` bounds the allowed time gap (pandas merge_asof
    semantics): a match farther than this from the left row yields NULLs
    instead. Pass an SQL interval body for timestamp times ("10 minutes")
    or a number for numeric times. Costs nothing extra: the matched right
    time already rides along in the same single-window pass.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")

    lcols = left.columns
    l_tag, r_tag = (1, 0) if direction == "backward" else (0, 1)

    rtime_type = dict(right.dtypes)[right_time]
    l_side = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(l_tag).alias("_tag"),
        F.struct(*lcols).alias("_lrow"),
        F.lit(None).cast(rtime_type).alias("_vt"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_v_{c}") for c in value_cols],
    )
    r_side = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(r_tag).alias("_tag"),
        F.lit(None).cast(l_side.schema["_lrow"].dataType).alias("_lrow"),
        F.col(right_time).alias("_vt"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    unioned = l_side.unionByName(r_side)

    if direction == "backward":
        w = (
            Window.partitionBy("_k")
            .orderBy(F.col("_t").asc(), F.col("_tag").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        picked = [
            F.last(f"_v_{c}", ignorenulls=True).over(w).alias(f"_p_{c}")
            for c in value_cols
        ]
    else:
        w = (
            Window.partitionBy("_k")
            .orderBy(F.col("_t").desc(), F.col("_tag").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        picked = [
            F.last(f"_v_{c}", ignorenulls=True).over(w).alias(f"_p_{c}")
            for c in value_cols
        ]

    picked.append(F.last("_vt", ignorenulls=True).over(w).alias("_p_t"))
    annotated = unioned.select("_k", "_t", "_tag", "_lrow", *picked).filter(
        F.col("_lrow").isNotNull()
    )
    if tolerance is not None:
        if isinstance(tolerance, (int, float)):
            bound = F.lit(tolerance)
        else:
            bound = F.expr(f"INTERVAL {tolerance}")
        within = (
            (F.col("_t") - F.col("_p_t")) <= bound
            if direction == "backward"
            else (F.col("_p_t") - F.col("_t")) <= bound
        )
        annotated = annotated.select(
            "_k",
            "_t",
            "_tag",
            "_lrow",
            *[
                F.when(within, F.col(f"_p_{c}")).alias(f"_p_{c}")
                for c in value_cols
            ],
        )
    return annotated.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in lcols],
        *[F.col(f"_p_{c}").alias(c) for c in value_cols],
    )


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    key: str | None,
    left_val: str,
    right_val: str,
    width: float,
    extra_cond: Column | None = None,
) -> DataFrame:
    """Equi-ized |left_val - right_val| <= width join.

    Bands of width ``width``: a left row in band b can only match right rows
    in bands b-1..b+1, so replicate the right side 3× and equi-join on
    (key, band); the exact predicate is applied as a residual filter.
    """
    band = lambda c: F.floor(F.col(c) / F.lit(width)).cast("long")  # noqa: E731
    l = left.withColumn("_band", band(left_val))
    r = (
        right.withColumn("_b0", band(right_val))
        .withColumn("_off", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("_band", F.col("_b0") + F.col("_off"))
        .drop("_b0", "_off")
    )
    cond = l["_band"] == r["_band"]
    if key is not None:
        cond = cond & (l[key] == r[key])
    joined = l.join(r, cond).filter(
        F.abs(l[left_val] - r[right_val]) <= F.lit(width)
    )
    if extra_cond is not None:
        joined = joined.filter(extra_cond)
    return joined.drop("_band")
