"""Native Delta writer/reader soak: log-replay planning cost vs commit
count (the thing checkpoints exist to bound) and OPTIMIZE's one-job
rewrite at a realistic small-file count.

Cells:
1. A table built by N small appends (N commits, one file each). Measure
   snapshot planning (snapshot_actions) at the full tail WITHOUT a
   checkpoint, then write a checkpoint and re-measure — replay should
   collapse to [checkpoint, tail].
2. OPTIMIZE over the N-file table: wall + Spark-job count (must stay
   O(1) in file count), then vacuum.

Usage: python tools/soak_delta.py [--commits 200] [--rows-per 5000]
Writes human-readable timings to stdout; transfer cells to SCALE.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    commits = 200
    rows_per = 5000
    if "--commits" in sys.argv:
        commits = int(sys.argv[sys.argv.index("--commits") + 1])
    if "--rows-per" in sys.argv:
        rows_per = int(sys.argv[sys.argv.index("--rows-per") + 1])

    from pyspark.sql import functions as F

    from rtdl_spark.session import get_spark
    from rtdl_spark.sources.delta_reader import (
        read_delta_native,
        snapshot_actions,
    )
    from rtdl_spark.sources.delta_writer import (
        optimize_delta_native,
        vacuum_delta_native,
        write_checkpoint_native,
        write_delta_native,
    )

    spark = get_spark("rtdl_spark_soak_delta")
    spark.sparkContext.setLogLevel("ERROR")
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="soak_delta_", dir=shm)
    table = os.path.join(work, "t")
    print(
        f"workdir={work} commits={commits} rows_per={rows_per} "
        f"load1={os.getloadavg()[0]:.1f}"
    )

    def timed(label, fn):
        before = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        jobs = (
            spark.sparkContext._jsc.sc().dagScheduler().nextJobId() - before
        )
        print(f"{label}: {dt:.2f}s / {jobs} jobs")
        return out, dt

    try:
        t0 = time.perf_counter()
        for i in range(commits):
            df = (
                spark.range(i * rows_per, (i + 1) * rows_per)
                .select(
                    F.col("id"),
                    (F.col("id") % 7).cast("int").alias("p"),
                    (F.col("id") * 3).alias("v"),
                )
                .coalesce(1)
            )
            write_delta_native(
                spark, df, table, partition_by=["p"],
                checkpoint_interval=0,
            )
        print(
            f"build: {commits} commits x {rows_per} rows in "
            f"{time.perf_counter() - t0:.1f}s"
        )

        (proto, meta, active, v, _txns), _ = timed(
            f"snapshot_actions, {commits}-commit JSON tail, NO checkpoint",
            lambda: snapshot_actions(spark, table),
        )
        print(f"  active files: {len(active)} at version {v}")
        timed(
            "full read (plan + count), no checkpoint",
            lambda: read_delta_native(spark, table).count(),
        )
        timed("write_checkpoint_native", lambda: write_checkpoint_native(spark, table))
        timed(
            "snapshot_actions WITH checkpoint (replay = ckpt + 0 tail)",
            lambda: snapshot_actions(spark, table),
        )
        timed(
            "full read (plan + count), with checkpoint",
            lambda: read_delta_native(spark, table).count(),
        )
        res, _ = timed(
            f"OPTIMIZE {len(active)} files -> per-partition bins",
            lambda: optimize_delta_native(
                spark, table, target_file_bytes=256 << 20
            ),
        )
        print(f"  optimize: {res}")

        # streaming source BEFORE vacuum: the full-history pass reads the
        # original dataChange=true files (optimize's rewrites are
        # skipped); after vacuum a from-0 replay would correctly fail on
        # the deleted files — that regime needs startingVersion=latest
        from rtdl_spark.sources.delta_stream_source import (
            DeltaStreamDataSource,
        )

        spark.dataSource.register(DeltaStreamDataSource)
        sink = os.path.join(work, "sink")
        ckpt = os.path.join(work, "ckpt")

        def stream_pass(label):
            def go():
                q = (
                    spark.readStream.format("rtdl_delta_stream")
                    .option("path", table)
                    .load()
                    .writeStream.format("parquet")
                    .option("path", sink)
                    .option("checkpointLocation", ckpt)
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination(600)

            timed(label, go)

        stream_pass(
            f"stream source: full-history pass ({commits * rows_per} rows"
            f" / {len(active)} files)"
        )
        print(f"  sink rows: {spark.read.parquet(sink).count()}")

        gone, _ = timed(
            "vacuum (retain 0)",
            lambda: vacuum_delta_native(spark, table, retain_ms=0),
        )
        print(f"  vacuumed {len(gone)} files")
        timed(
            "full read after optimize+vacuum",
            lambda: read_delta_native(spark, table).count(),
        )

        # incremental: one new commit; the checkpointed stream replays
        # ONLY it (processed offsets never re-read the vacuumed files)
        write_delta_native(
            spark,
            spark.range(0, rows_per).select(
                F.col("id"), (F.col("id") % 7).cast("int").alias("p"),
                (F.col("id") * 3).alias("v"),
            ),
            table,
            checkpoint_interval=0,
        )
        stream_pass("stream source: ONE-commit incremental batch")
        print(f"  sink rows: {spark.read.parquet(sink).count()}")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
