"""Upsert (MERGE) and SCD2 emulation over parquet — the CDC surface of the
lake (guide: 'CDC / SCD2 → MERGE INTO (needs Delta; emulate with anti-join
+ union + window)').

With Delta on the classpath, ``MERGE INTO`` does this transactionally; the
parquet emulation here has the same dataflow shape (broadcast-able
anti-join + union) and is what foreachBatch upserts compile to on a plain
parquet lake. At 100 TB you partition the target and rewrite only the
partitions that received updates (see rewrite_changed_partitions)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """Classic upsert: source rows win on key collision, target rows
    survive otherwise. Equivalent to
    MERGE INTO target USING source ON keys WHEN MATCHED UPDATE * WHEN NOT
    MATCHED INSERT *."""
    untouched = target.join(source.select(*keys), keys, "left_anti")
    return untouched.unionByName(source)


def dedup_latest(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """Keep the newest version per key (CDC compaction): one window shuffle
    on the key, descending by version/time with a deterministic tiebreak."""
    w = Window.partitionBy(*keys).orderBy(F.desc(order_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    keys: list[str],
    effective_col: str = "effective_from",
    end_col: str = "effective_to",
    current_flag: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension type 2: close out changed current rows
    (end-date them) and append the new versions as current."""
    upd_keys = updates.select(*keys, F.col(effective_col).alias("_new_from"))
    closed = (
        current.join(F.broadcast(upd_keys), keys, "inner")
        .filter(F.col(current_flag))
        .withColumn(end_col, F.col("_new_from"))
        .withColumn(current_flag, F.lit(False))
        .drop("_new_from")
    )
    unchanged = current.join(upd_keys.select(*keys), keys, "left_anti")
    new_rows = updates.withColumn(end_col, F.lit(None).cast("timestamp")).withColumn(
        current_flag, F.lit(True)
    )
    return unchanged.unionByName(closed).unionByName(new_rows)


def merge_aggregates(
    prior: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    count_col: str = "n",
) -> DataFrame:
    """Incremental rollup maintenance — the materialized-view refresh
    pattern: a persisted per-key aggregate table absorbs a new batch's
    PARTIAL aggregate instead of recomputing from all history. Works for
    any algebraically mergeable aggregate (sum/count here; min/max the
    same way); avg/stddev derive from merged sums downstream.

    Scale shape: the delta is batch-sized and its partial agg tiny —
    the merge is one full-outer join on the rollup key + coalesced adds;
    the history's raw events are never re-read. This is exactly what a
    foreachBatch maintains against a lake rollup table at 100 TB:
    refresh cost tracks the BATCH, not the table.
    """
    d = delta.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"_d_{c}") for c in sum_cols],
        F.col(count_col).alias("_d_n"),
    )
    merged = prior.join(d, keys, "full_outer")
    return merged.select(
        *[F.col(k) for k in keys],
        *[
            (
                F.coalesce(F.col(c), F.lit(0))
                + F.coalesce(F.col(f"_d_{c}"), F.lit(0))
            ).alias(c)
            for c in sum_cols
        ],
        (
            F.coalesce(F.col(count_col), F.lit(0))
            + F.coalesce(F.col("_d_n"), F.lit(0))
        ).alias(count_col),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Classify every key across two table snapshots as added / removed /
    changed / unchanged — the audit/CDC-extraction twin of merge_upsert
    (diff two loads, emit only the delta downstream).

    One full-outer sort-merge join on the key; on a partitioned/bucketed
    lake table the exchange is pruned to co-partitioned reads, so diffing
    two 100 TB snapshots moves each row once. Value comparison is
    null-safe column equality (IS NOT DISTINCT FROM), never string/hash
    round-trips — engine-portable and collision-free.

    Output: key columns + change_type.
    """
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c not in keys]
    o = old.select(
        *keys, *compare_cols, F.lit(True).alias("_in_old")
    ).alias("o")
    n = new.select(
        *keys, *compare_cols, F.lit(True).alias("_in_new")
    ).alias("n")
    same = None
    for c in compare_cols:
        eq = F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
        same = eq if same is None else (same & eq)
    joined = o.join(n, keys, "full_outer")
    return joined.select(
        *keys,
        F.when(F.col("o._in_old").isNull(), F.lit("added"))
        .when(F.col("n._in_new").isNull(), F.lit("removed"))
        .when(same if same is not None else F.lit(True), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("change_type"),
    )


def overwrite_partitions_dynamic(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Partition-scoped overwrite (INSERT OVERWRITE ... PARTITION dynamic):
    replace ONLY the partitions present in ``df``, leave every other
    partition untouched — the idempotent backfill/restatement primitive
    (re-running a day's pipeline rewrites that day, never the table).

    Uses Spark's native dynamic partitionOverwriteMode: the writer stages
    new files per touched partition and commits by directory swap, so a
    failed job never leaves a partially-deleted table (static mode would
    first truncate the whole root). The conf is set per-write here and
    restored, not assumed session-wide."""
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "STATIC")
    spark.conf.set(key, "dynamic")
    try:
        (
            df.write.mode("overwrite")
            .partitionBy(*partition_cols)
            .parquet(path)
        )
    finally:
        spark.conf.set(key, prev)
