"""Partition compaction — the OPTIMIZE equivalent for the parquet lake.

The reference writes ONE parquet file per ingested message
(ingester.go:551-565,593) — at any real rate that is millions of tiny
files, the canonical lake-killer (every query pays per-file open cost;
the file listing itself stops fitting in memory). Our ingest already
micro-batches, but many small micro-batches still accrete files; this
compactor rewrites partitions down to ~target_file_bytes files, preserving
the partition columns.

At 100 TB this runs per-partition (bounded memory/shuffle), only touching
partitions whose small-file count crosses a threshold — never a full-table
rewrite."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from rtdl_spark.ingest.pipeline import BUCKET_COL, TABLE_COL


def partition_file_stats(spark: SparkSession, root: str) -> list[dict]:
    """Per (table, bucket) partition: file count + bytes, from the FS —
    the signal for selective compaction."""
    stats: dict[tuple[str, str], dict] = {}
    for dirpath, _dirs, files in os.walk(root):
        pq = [f for f in files if f.endswith(".parquet")]
        if not pq:
            continue
        rel = os.path.relpath(dirpath, root)
        parts = dict(
            p.split("=", 1) for p in rel.split(os.sep) if "=" in p
        )
        key = (parts.get(TABLE_COL, ""), parts.get(BUCKET_COL, ""))
        entry = stats.setdefault(
            key, {"table": key[0], "bucket": key[1], "n_files": 0, "bytes": 0}
        )
        entry["n_files"] += len(pq)
        entry["bytes"] += sum(
            os.path.getsize(os.path.join(dirpath, f)) for f in pq
        )
    return list(stats.values())


def compact_partition(
    spark: SparkSession,
    root: str,
    table: str,
    bucket: str,
    target_file_bytes: int = 128 << 20,
    compression: str = "snappy",
) -> int:
    """Rewrite one partition to ceil(bytes/target) files. Returns the new
    file count. Write-then-swap keeps readers consistent (on HDFS/S3 a
    production build would commit via a metadata layer or rename)."""
    part_dir = os.path.join(root, f"{TABLE_COL}={table}", f"{BUCKET_COL}={bucket}")
    df = spark.read.parquet(part_dir)
    size = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(part_dir)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, -(-size // target_file_bytes))
    tmp_dir = part_dir + "._compact_tmp"
    (
        df.coalesce(n_files)
        .write.option("compression", compression)
        .mode("overwrite")
        .parquet(tmp_dir)
    )
    # swap through the Hadoop FS (not shutil/os): correct on any store
    # the JVM can see, atomic where the store supports rename
    from rtdl_spark.sources import fsutil

    fsutil.delete(spark, part_dir)
    fsutil.rename(spark, tmp_dir, part_dir)
    return n_files


def partition_file_stats_metadata(
    spark: SparkSession, root: str
) -> list[dict]:
    """partition_file_stats computed INSIDE the scan from the _metadata
    hidden columns (one column-pruned pass, distributed) instead of a
    driver directory walk — the object-store-correct selection input
    (os.walk on s3a:// silently reports nothing there)."""
    from pyspark.sql import functions as F

    per_file = (
        spark.read.parquet(root)
        .select(
            F.col(TABLE_COL).cast("string").alias("t"),
            F.col(BUCKET_COL).cast("string").alias("b"),
            F.col("_metadata.file_path").alias("p"),
            F.col("_metadata.file_size").alias("s"),
        )
        .groupBy("t", "b", "p")
        .agg(F.first("s").alias("s"))
    )
    rows = (
        per_file.groupBy("t", "b")
        .agg(F.count(F.lit(1)).alias("n_files"), F.sum("s").alias("bytes"))
        .collect()
    )
    return [
        {
            "table": r["t"],
            "bucket": r["b"],
            "n_files": r["n_files"],
            "bytes": r["bytes"],
        }
        for r in rows
    ]


def compact_lake(
    spark: SparkSession,
    root: str,
    min_files: int = 8,
    target_file_bytes: int = 128 << 20,
    use_metadata: bool = False,
) -> dict[tuple[str, str], int]:
    """Selective compaction: only partitions with ≥ min_files small files
    are rewritten. ``use_metadata=True`` selects candidates from the
    distributed _metadata scan instead of a driver directory walk."""
    stats_fn = (
        partition_file_stats_metadata if use_metadata else partition_file_stats
    )
    done = {}
    for s in stats_fn(spark, root):
        if s["n_files"] >= min_files:
            done[(s["table"], s["bucket"])] = compact_partition(
                spark, root, s["table"], s["bucket"], target_file_bytes
            )
    return done
