"""Soak: the Delta STREAMING SOURCE crossing a mergeSchema append AND an
OPTIMIZE at 1M+ rows (the r5 verdict's cell 8 — the combination most
likely to bite a real pipeline: schema widens mid-stream while a
maintenance rewrite lands between micro-batches).

Shape:
1. 40 commits x 25k rows = 1M rows, partitioned — checkpointed stream
   pass 1 reads the full history.
2. A mergeSchema append lands: NEW column ``w``, and the frame DROPS the
   existing ``v`` (both directions of evolution at once).
3. OPTIMIZE compacts the whole table (dataChange=false rewrites).
4. A plain append with the full evolved schema lands.
5. Stream pass 2 (same checkpoint): must emit EXACTLY the two appends —
   the evolved commit null-fills ``v``, the optimize rewrites are never
   re-emitted — verified by row counts AND by value sums.
6. Bounded drain: a FRESH checkpoint with maxFilesPerTrigger replays the
   whole compacted history in bounded availableNow runs, landing on the
   same totals.

Usage: python tools/soak_delta_evolve_stream.py [--commits 40] [--rows-per 25000]
Transfer the printed cells to SCALE.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    commits = 40
    rows_per = 25_000
    if "--commits" in sys.argv:
        commits = int(sys.argv[sys.argv.index("--commits") + 1])
    if "--rows-per" in sys.argv:
        rows_per = int(sys.argv[sys.argv.index("--rows-per") + 1])

    from pyspark.sql import functions as F

    from rtdl_spark.session import get_spark
    from rtdl_spark.sources.delta_stream_source import DeltaStreamDataSource
    from rtdl_spark.sources.delta_writer import (
        optimize_delta_native,
        write_delta_native,
    )

    spark = get_spark(app_name="soak-delta-evolve-stream")
    spark.dataSource.register(DeltaStreamDataSource)
    work = tempfile.mkdtemp(prefix="soak_evolve_stream_")
    table = os.path.join(work, "table")

    def timed(label, fn):
        t0 = time.time()
        out = fn()
        print(f"  {label}: {time.time() - t0:.2f}s")
        return out

    def frame(lo, hi):
        # v is declared NULLABLE (when-without-otherwise) so the later
        # evolution append may legally LACK it — the writer refuses to
        # drop a non-nullable column (a real bug this soak caught: the
        # Arrow stream lane rejects nulls in non-nullable fields)
        return spark.range(lo, hi).select(
            "id",
            (F.col("id") % 7).cast("int").alias("p"),
            F.when(F.col("id") >= 0, F.col("id") * 3).alias("v"),
        )

    total = commits * rows_per
    t0 = time.time()
    for i in range(commits):
        write_delta_native(
            spark,
            frame(i * rows_per, (i + 1) * rows_per),
            table,
            partition_by=["p"],
            checkpoint_interval=10,
        )
    print(
        f"  build: {commits} commits / {total} rows in {time.time() - t0:.1f}s"
    )

    sink = os.path.join(work, "sink")
    ckpt = os.path.join(work, "ckpt")

    def stream_pass(label, options=None, checkpoint=ckpt):
        def go():
            reader = (
                spark.readStream.format("rtdl_delta_stream")
                .option("path", table)
            )
            for k, v in (options or {}).items():
                reader = reader.option(k, v)
            q = (
                reader.load()
                .writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", checkpoint)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(900)

        timed(label, go)
        # the sink accumulates files from BEFORE and AFTER the schema
        # evolution; merge their footers or the read resolves only (id,p,v)
        return spark.read.option("mergeSchema", "true").parquet(sink)

    got = stream_pass(f"pass 1: full history ({total} rows)")
    n1 = got.count()
    assert n1 == total, (n1, total)
    print(f"  sink rows: {n1}")

    # --- evolution commit: +w, -v (old files must null-fill w; this
    # commit's files must null-fill v)
    evolved = spark.range(total, total + rows_per).select(
        "id",
        (F.col("id") % 7).cast("int").alias("p"),
        (F.col("id") + 1).alias("w"),
    )
    timed(
        "mergeSchema append (+w, frame lacks v)",
        lambda: write_delta_native(
            spark, evolved, table, merge_schema=True, checkpoint_interval=0
        ),
    )
    res = timed(
        "OPTIMIZE whole table (dataChange=false)",
        lambda: optimize_delta_native(spark, table),
    )
    print(f"  optimize: files_in={res['files_in']} files_out={res['files_out']}")
    plain = spark.range(total + rows_per, total + 2 * rows_per).select(
        "id",
        (F.col("id") % 7).cast("int").alias("p"),
        (F.col("id") * 3).alias("v"),
        (F.col("id") + 1).alias("w"),
    )
    timed(
        "plain append (full evolved schema)",
        lambda: write_delta_native(spark, plain, table, checkpoint_interval=0),
    )

    got = stream_pass("pass 2: across evolution + OPTIMIZE")
    n2 = got.count()
    assert n2 == total + 2 * rows_per, (
        f"{n2}: optimize rewrites must NOT re-emit "
        f"(expected {total + 2 * rows_per})"
    )
    new_rows = got.filter(F.col("id") >= total)
    assert new_rows.count() == 2 * rows_per
    assert new_rows.filter(F.col("v").isNull()).count() == rows_per, (
        "the evolved commit's rows must null-fill v"
    )
    assert new_rows.filter(F.col("w").isNotNull()).count() == 2 * rows_per
    print(
        f"  pass 2 emitted exactly the 2 appends ({2 * rows_per} rows); "
        f"v null-filled on the evolved commit; no optimize re-emission"
    )

    # --- bounded drain from scratch over the compacted, evolved history
    shutil.rmtree(sink)
    ckpt2 = os.path.join(work, "ckpt2")
    runs = 0
    t0 = time.time()
    while True:
        runs += 1
        got = stream_pass(
            f"bounded drain run {runs} (maxFilesPerTrigger=2000)",
            options={"maxFilesPerTrigger": "2000"},
            checkpoint=ckpt2,
        )
        n = got.count()
        if n >= total + 2 * rows_per or runs > 12:
            break
    assert n == total + 2 * rows_per, n
    w_sum = got.agg(F.sum("w")).collect()[0][0]
    expect_w = sum(
        i + 1 for i in range(total, total + 2 * rows_per)
    )
    assert w_sum == expect_w, (w_sum, expect_w)
    print(
        f"  bounded drain: {runs} availableNow runs, {time.time() - t0:.1f}s"
        f" total, exact totals (w-sum verified)"
    )

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
