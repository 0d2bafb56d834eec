"""Skew-mitigation operators — the 100 TB survival kit.

AQE (spark.sql.adaptive.skewJoin, on by default in rtdl_spark.session)
handles most skew at runtime by splitting oversized partitions. These
explicit constructions cover the cases AQE cannot fix:

- ``salted_aggregate``: two-phase aggregation for a groupBy whose key
  distribution is pathological (one key = 50% of rows). Phase 1 aggregates
  (key, salt) — spreading the hot key over N reducers; phase 2 merges the
  N partials. Works for any algebraic aggregate (sum/count/min/max).
- ``salted_broadcast_left``: replicate-the-small-side salt join for when
  the big side's join key is hot AND the small side is too big for a plain
  broadcast but small enough to replicate N×.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-proof aggregation.

    ``aggs`` maps output name → (merge_fn_name, phase1_expr), where
    merge_fn_name ∈ {'sum','min','max'} re-combines the per-salt partials
    (count merges via sum). Example:

        salted_aggregate(df, ["k"], {"n": ("sum", F.count(F.lit(1))),
                                     "mx": ("max", F.max("v"))})
    """
    salted = df.withColumn(
        "_salt", (F.rand(seed=7) * n_salts).cast("int")
    )
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[expr.alias(f"_p_{name}") for name, (_, expr) in aggs.items()]
    )
    merge = {"sum": F.sum, "min": F.min, "max": F.max}
    return phase1.groupBy(*keys).agg(
        *[
            merge[how](f"_p_{name}").alias(name)
            for name, (how, _) in aggs.items()
        ]
    )


def salted_broadcast_left(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-proof equi join: salt the big side's key, replicate every small-
    side row across all salts, join on (key, salt). The hot key's rows land
    on n_salts reducers instead of one."""
    big_s = big.withColumn("_salt", (F.rand(seed=7) * n_salts).cast("int"))
    small_s = (
        small.withColumn(
            "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
        )
    )
    return big_s.join(small_s, [key, "_salt"]).drop("_salt")


def skew_report(
    df: DataFrame,
    keys: list[str],
    top_n: int = 10,
) -> DataFrame:
    """The decision input for the operators above: per-key-group weight of
    the ``top_n`` heaviest keys, with each key's share of all rows and a
    ``skew_factor`` (key count ÷ mean count over distinct keys). A
    skew_factor ≫ #reducers on the join/agg key says the plain hash plan
    will stall on one task — reach for salting or check AQE's split took.

    Two map-combinable aggregations (rows → per-key counts → scalar
    stats) and a top-n TakeOrdered on the per-key frame — the report
    never sorts or re-shuffles the input itself. Run it on a sample at
    100 TB if even one count pass is too dear; shares are ratios, so
    uniform sampling preserves them in expectation."""
    per_key = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("key_count"))
    totals = per_key.agg(
        F.sum("key_count").alias("_total"),
        F.count(F.lit(1)).alias("_n_keys"),
    )
    return (
        per_key.join(F.broadcast(totals))
        .select(
            *keys,
            "key_count",
            F.round(F.col("key_count") / F.col("_total"), 6).alias("share"),
            F.round(
                F.col("key_count") * F.col("_n_keys") / F.col("_total"), 4
            ).alias("skew_factor"),
        )
        .orderBy(F.desc("key_count"), *keys)
        .limit(top_n)
    )
