"""readChangeFeed soak: a 1M-row CDF table receives 20 DML commits
(selective deletes + updates, each writing cdc change files), then ONE
availableNow readChangeFeed pass streams the FULL change history into a
parquet sink — measuring end-to-end CDC throughput through the Arrow
lane — followed by an incremental pass for one extra commit (the
steady-state shape a CDC consumer runs).

Usage: python tools/soak_cdc_stream.py [n_rows] [n_commits]
Record the JSON line in SCALE.md.
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rtdl_spark.session import get_spark  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_commits = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark()
    import pyspark.sql.functions as F

    from rtdl_spark.sources.delta_reader import snapshot_actions
    from rtdl_spark.sources.delta_stream_source import DeltaStreamDataSource
    from rtdl_spark.sources.delta_writer import (
        delete_where_delta_native,
        update_where_delta_native,
        write_delta_native,
    )

    spark.dataSource.register(DeltaStreamDataSource)
    base = "/tmp/soak_cdc"
    shutil.rmtree(base, ignore_errors=True)
    root, out, ckpt = f"{base}/tbl", f"{base}/sink", f"{base}/ckpt"

    write_delta_native(
        spark,
        spark.range(0, n).select(
            F.col("id"), (F.col("id") % 97).alias("g"),
            (F.col("id") * 3 % 1000).alias("val"),
        ).repartition(32),
        root, checkpoint_interval=0,
    )
    _, meta, _, current, _ = snapshot_actions(spark, root)
    with open(os.path.join(root, "_delta_log",
                           f"{current + 1:020d}.json"), "w") as f:
        f.write(json.dumps({"commitInfo": {
            "timestamp": 2, "operation": "SET"}}) + "\n")
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 1, "minWriterVersion": 4}}) + "\n")
        f.write(json.dumps({"metaData": {
            **meta,
            "configuration": {"delta.enableChangeDataFeed": "true"}}})
            + "\n")

    t0 = time.time()
    for i in range(n_commits):
        if i % 2 == 0:
            delete_where_delta_native(spark, root, f"g = {i}")
        else:
            update_where_delta_native(
                spark, root, f"g = {90 - i}", {"val": "val + 1"}
            )
    t_dml = time.time() - t0

    def run_pass():
        q = (
            spark.readStream.format("rtdl_delta_stream")
            .option("path", root).option("readChangeFeed", "true").load()
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(1200)

    t0 = time.time()
    run_pass()
    t_full = time.time() - t0
    rows = spark.read.parquet(out)
    n_changes = rows.count()
    by_type = {
        r["_change_type"]: r["n"]
        for r in rows.groupBy("_change_type").count()
        .withColumnRenamed("count", "n").collect()
    }

    delete_where_delta_native(spark, root, "g = 95")
    t0 = time.time()
    run_pass()
    t_inc = time.time() - t0

    print(json.dumps({
        "rows": n, "dml_commits": n_commits,
        "dml_total_sec": round(t_dml, 1),
        "full_history_stream_sec": round(t_full, 1),
        "change_rows": n_changes,
        "by_type": by_type,
        "rows_per_sec": int(n_changes / t_full),
        "incremental_commit_sec": round(t_inc, 1),
    }))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
