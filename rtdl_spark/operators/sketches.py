"""Mergeable distinct-count sketches (Apache DataSketches HLL, built into
Spark 4) — the 100 TB pattern for COUNT(DISTINCT) over rollup hierarchies.

Why this exists: an exact count-distinct at a coarser grain cannot be
derived from finer-grain exact counts (distincts don't add), so every new
grain re-scans the fact table. A persisted HLL sketch per fine-grain cell
CAN be merged upward: build once over the 100 TB scan, then any rollup
(day→month→total, per-source→corpus) is an O(cells) union over KB-sized
binaries — no second scan, mathematically bounded error, and incremental
maintenance for free (new batch → new cell sketches → union absorbs them,
same shape as operators/merge.py::merge_aggregates for sums).

All JVM-side: hll_sketch_agg / hll_union_agg / hll_sketch_estimate are
Catalyst expressions; sketches travel as ordinary binary columns and
persist losslessly in parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_sketches(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    lgk: int = 12,
) -> DataFrame:
    """One HLL sketch of ``value_col``'s distincts per ``keys`` cell.

    lgk=12 → ~2.5 KB per sketch, ~1.6% relative standard error — the
    DataSketches default trade. Map-side partial aggregation applies (the
    sketch is itself the combiner state), so the shuffle carries sketches,
    not values."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias("hll_sketch")
    )


def merge_sketches(sketches: DataFrame, keys: list[str]) -> DataFrame:
    """Roll sketches up to a coarser grain (``keys`` ⊂ build keys) without
    touching the base table: estimate = hll_sketch_estimate(union(...))."""
    grouped = (
        sketches.groupBy(*keys)
        if keys
        else sketches.groupBy(F.lit(1).alias("_all"))
    )
    out = grouped.agg(
        F.hll_union_agg("hll_sketch").alias("hll_sketch"),
    ).withColumn(
        "n_distinct_est", F.hll_sketch_estimate("hll_sketch").cast("long")
    )
    return out.drop("_all") if not keys else out


def estimate(sketches: DataFrame) -> DataFrame:
    """Attach the point estimate to each sketch row."""
    return sketches.withColumn(
        "n_distinct_est", F.hll_sketch_estimate("hll_sketch").cast("long")
    )
