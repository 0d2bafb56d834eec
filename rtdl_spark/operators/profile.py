"""Table profiling — the data-card / ANALYZE-style statistics pass every
lake needs for monitoring, CBO input, and corpus documentation (data
cards for training sets; reference parity: the reference registers
datasets in Dremio/Glue, which run their own profiling — here the engine
owns it natively).

Scale shape: ONE full scan computes every column's statistics together
(a single hash-aggregate row of ~6 expressions per column — all
map-combinable, no shuffle beyond the final 1-row reduce), then the
wide row is unpivoted driver-side into the tall (column, stats) form.
Never one pass per column: at 100 TB, k passes for k columns is the
difference between an hour and a day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}


def histogram(df: DataFrame, col: str, n_bins: int = 10) -> DataFrame:
    """Equi-width histogram of a numeric column: one aggregate derives the
    range, one scan buckets every row — two passes total, both
    map-combinable, independent of n_bins.

    Bucket i (0-based) covers [min + i·w, min + (i+1)·w) with
    w = (max−min)/n_bins; the max value folds into the last bucket
    (standard closed-top convention). Nulls are excluded. Returns
    ``bucket, lo, hi, n`` sorted by bucket; empty buckets appear with
    n=0 so the shape is always n_bins rows (dashboards depend on it).
    Bucketing arithmetic is plain IEEE double ops, so counts are
    engine-reproducible (oracle-checked in DuckDB with the identical
    formula).
    """
    if n_bins < 1:
        raise ValueError("histogram: n_bins must be >= 1")
    rng = F.broadcast(
        df.filter(F.col(col).isNotNull()).agg(
            F.min(F.col(col).cast("double")).alias("_mn"),
            F.max(F.col(col).cast("double")).alias("_mx"),
        )
    )
    x = F.col(col).cast("double")
    bucket = F.least(
        F.floor(
            (x - F.col("_mn")) * n_bins / (F.col("_mx") - F.col("_mn"))
        ),
        F.lit(n_bins - 1),
    ).cast("int")
    counted = (
        df.filter(F.col(col).isNotNull())
        .crossJoin(rng)
        .withColumn(
            "bucket",
            F.when(F.col("_mx") == F.col("_mn"), F.lit(0)).otherwise(bucket),
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bins = df.sparkSession.range(n_bins).select(
        F.col("id").cast("int").alias("bucket")
    )
    w = (F.col("_mx") - F.col("_mn")) / n_bins
    return (
        bins.crossJoin(rng)
        .join(counted, "bucket", "left")
        .select(
            "bucket",
            F.round(F.col("_mn") + F.col("bucket") * w, 6).alias("lo"),
            F.round(F.col("_mn") + (F.col("bucket") + 1) * w, 6).alias("hi"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        )
        .orderBy("bucket")
    )


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column statistics in one scan. Returns one row per profiled
    column: ``column, n_rows, n_nulls, null_frac, n_distinct (exact),
    min_val, max_val, avg_len`` — min/max/avg-len as strings/doubles so
    heterogeneous column types fit one schema (decimal types are profiled
    via their string form; nested types are skipped).

    ``n_distinct`` is exact (count(distinct)) — Spark expands multiple
    count-distincts into one multi-pass expand, still a single scan; swap
    to approx_count_distinct when profiling hundreds of columns.
    """
    cols = columns or [
        c
        for c, t in df.dtypes
        if not t.startswith(("array", "map", "struct", "binary"))
    ]
    if not cols:
        raise ValueError("profile_table: no profilable columns")
    # All rounding happens JVM-side (F.round: half-up, the ANSI/DuckDB
    # convention) so profiles are engine-reproducible — python's round()
    # is half-even and would drift on exact .5 boundaries.
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        is_num = dict(df.dtypes)[c] in _NUMERIC
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nulls_{c}"),
            F.round(
                F.count(F.when(F.col(c).isNull(), 1))
                / F.greatest(F.count(F.lit(1)), F.lit(1)),
                6,
            ).alias(f"__nf_{c}"),
            F.countDistinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
            (
                F.round(F.avg(F.length(F.col(c).cast("string"))), 6)
                if not is_num
                else F.lit(None).cast("double")
            ).alias(f"__len_{c}"),
        ]
    row = df.agg(*aggs).first()
    out = [
        (
            c,
            row["__n"],
            row[f"__nulls_{c}"],
            row[f"__nf_{c}"],
            row[f"__nd_{c}"],
            row[f"__min_{c}"],
            row[f"__max_{c}"],
            row[f"__len_{c}"],
        )
        for c in cols
    ]
    return df.sparkSession.createDataFrame(
        out,
        "column string, n_rows long, n_nulls long, null_frac double, "
        "n_distinct long, min_val string, max_val string, avg_len double",
    )


def equidepth_histogram(df: DataFrame, col: str, n_bins: int = 10) -> DataFrame:
    """Equi-DEPTH (quantile) histogram: bins hold ~equal row counts, so
    skewed columns get resolution where the data actually is (the
    equi-width histogram wastes its bins on empty range under skew).

    Exact construction: ntile over a single value-sort — one range
    exchange, the same cost class as any percentile computation; for
    100 TB dashboards use approx_percentile cut points instead (the
    sketch path, agg_approx_percentiles) and this as the exact
    ground-truth twin. Ties at a bin boundary may split across bins in
    either engine, but the OUTPUT is insensitive to the split: bucket
    counts are fixed by NTILE's row arithmetic and the boundary min/max
    are the tied value itself — so the result stays oracle-exact.

    Returns ``bucket, lo, hi, n`` (bucket 1-based like NTILE).
    """
    if n_bins < 1:
        raise ValueError("equidepth_histogram: n_bins must be >= 1")
    from pyspark.sql import Window

    x = F.col(col).cast("double")
    w = Window.orderBy(x)
    return (
        df.filter(F.col(col).isNotNull())
        .withColumn("bucket", F.ntile(n_bins).over(w))
        .groupBy("bucket")
        .agg(
            F.round(F.min(x), 6).alias("lo"),
            F.round(F.max(x), 6).alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("bucket")
    )


def footer_stats(spark, path: str, cols: list[str]) -> DataFrame:
    """COUNT/MIN/MAX per column answered from parquet FOOTERS — no data
    scan (DSv2 aggregate pushdown: the BatchScan's output IS the
    aggregate). At 100 TB this is the difference between a metadata
    operation and a full-table read for the monitoring stats every
    pipeline polls. Complements profile_table (one full scan for the
    stats pushdown can't answer: distinct counts, null fractions).

    Constraints of the pushdown (Spark bails to a normal scan if
    violated): no filters, no nested fields; MIN/MAX types must carry
    parquet min/max stats. The v2 reader + pushdown confs are set just
    for this plan and restored after.

    Returns one row: n_rows + min_/max_ per column.
    """
    confs = {
        "spark.sql.parquet.aggregatePushdown": "true",
        "spark.sql.sources.useV1SourceList": "",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = spark.read.parquet(path)
        aggs = [F.count(F.lit(1)).alias("n_rows")]
        for c in cols:
            aggs += [
                F.min(c).alias(f"min_{c}"),
                F.max(c).alias(f"max_{c}"),
            ]
        rows = df.agg(*aggs).collect()
        return spark.createDataFrame(rows)
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def file_manifest(
    spark,
    path: str,
    small_file_bytes: int = 32 << 20,
) -> DataFrame:
    """Per-file data card of a parquet dataset: path, size, row count and
    a small-file verdict — the distributed signal feeding selective
    compaction (ingest/compact.py). Unlike a driver-side directory walk,
    this reads the ``_metadata`` hidden columns inside the scan, so it is
    object-store-correct (no os.walk lies on S3) and parallel over files;
    row accounting is ONE column-pruned scan (a single metadata struct
    per row, no data columns materialized).

    Columns: file_path, file_bytes, n_rows, is_small."""
    rows = spark.read.parquet(path).select(
        F.col("_metadata.file_path").alias("file_path"),
        F.col("_metadata.file_size").alias("file_bytes"),
    )
    return (
        rows.groupBy("file_path", "file_bytes")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("is_small", F.col("file_bytes") < small_file_bytes)
    )


def manifest_summary(manifest: DataFrame) -> DataFrame:
    """Roll a file_manifest up to the dataset health numbers: file count,
    small-file count/share, total bytes, mean file size — the dashboard
    row that triggers an OPTIMIZE/compaction run."""
    return manifest.agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(F.col("is_small").cast("int")).alias("n_small"),
        F.round(F.avg(F.col("is_small").cast("double")), 4).alias(
            "small_share"
        ),
        F.sum("file_bytes").alias("total_bytes"),
        F.sum("n_rows").alias("total_rows"),
        F.round(F.avg("file_bytes"), 1).alias("avg_file_bytes"),
    )
