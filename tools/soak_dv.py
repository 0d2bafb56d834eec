"""DV-vs-rewrite DELETE soak: on a 1M-row native Delta table, delete a
SELECTIVE 1% of rows twice — once via the rewrite path, once via
deletion vectors — and measure (a) delete wall time, (b) bytes written,
(c) subsequent full-read wall time (the DV read pays the row_index
anti-filter). Prints one JSON line; findings go to SCALE.md.

Usage: python tools/soak_dv.py [n_rows] [files]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def du(path: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(dirpath, f))
    return total


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from pyspark.sql import functions as F

    from rtdl_spark.session import get_spark
    from rtdl_spark.sources.delta_reader import (
        read_delta_native,
        snapshot_actions,
    )
    from rtdl_spark.sources.delta_writer import (
        delete_where_delta_dv,
        delete_where_delta_native,
        write_delta_native,
    )

    spark = get_spark("rtdl_soak_dv")
    spark.sparkContext.setLogLevel("ERROR")
    base = "/dev/shm/rtdl_soak_dv" if os.path.isdir("/dev/shm") else "/tmp/rtdl_soak_dv"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)

    def build(name: str) -> str:
        root = os.path.join(base, name)
        df = (
            spark.range(0, n_rows)
            .select(
                "id",
                (F.col("id") % 97).alias("k"),
                F.sha2(F.col("id").cast("string"), 256).alias("payload"),
            )
            .repartition(n_files)
        )
        write_delta_native(spark, df, root, checkpoint_interval=0)
        return root

    out: dict = {"n_rows": n_rows, "n_files": n_files}
    pred = "k = 13"  # ~1% of rows, spread across every file

    for mode in ("rewrite", "dv"):
        root = build(mode)
        if mode == "dv":
            _, meta, _, current, _ = snapshot_actions(spark, root)
            log = os.path.join(root, "_delta_log")
            with open(
                os.path.join(log, f"{current + 1:020d}.json"), "w"
            ) as f:
                f.write(json.dumps({"commitInfo": {
                    "timestamp": 1, "operation": "UPGRADE"}}) + "\n")
                f.write(json.dumps({"protocol": {
                    "minReaderVersion": 3, "minWriterVersion": 7,
                    "readerFeatures": ["deletionVectors"],
                    "writerFeatures": ["deletionVectors"]}}) + "\n")
                f.write(json.dumps({"metaData": {
                    **meta,
                    "configuration": {
                        "delta.enableDeletionVectors": "true"}}}) + "\n")
        size_before = du(root)
        t0 = time.perf_counter()
        if mode == "dv":
            res = delete_where_delta_dv(spark, root, pred)
        else:
            res = delete_where_delta_native(spark, root, pred)
        t_delete = time.perf_counter() - t0
        size_after = du(root)
        t0 = time.perf_counter()
        n_after = read_delta_native(spark, root).count()
        t_read = time.perf_counter() - t0
        t0 = time.perf_counter()
        s_after = (
            read_delta_native(spark, root)
            .agg(F.sum("k").alias("s"))
            .collect()[0]["s"]
        )
        t_agg = time.perf_counter() - t0
        out[mode] = {
            "delete_sec": round(t_delete, 3),
            "bytes_written": size_after - size_before,
            "read_count_sec": round(t_read, 3),
            "read_agg_sec": round(t_agg, 3),
            "rows_after": n_after,
            "agg_after": int(s_after),
            "result": {k: v for k, v in res.items() if k != "version"},
        }

    assert out["rewrite"]["rows_after"] == out["dv"]["rows_after"]
    assert out["rewrite"]["agg_after"] == out["dv"]["agg_after"]
    print(json.dumps(out))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
