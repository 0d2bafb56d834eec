"""Identity-generation soak: append 1M rows (32 partitions) to a
v6 identity table and verify the generated values are EXACTLY the
contiguous start/step lattice, then a second 1M append continues the
chain — while measuring the overhead of the zipWithIndex two-pass
(localCheckpoint + count aggregate + narrow mapInPandas) against a
plain append of the same frame.

Usage: python tools/soak_identity.py [n_rows]
Records go to SCALE.md by hand.
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
    spark = get_spark()
    import pyspark.sql.functions as F

    from rtdl_spark.sources.delta_reader import (
        read_delta_native,
        snapshot_actions,
    )
    from rtdl_spark.sources.delta_writer import write_delta_native

    root = "/tmp/soak_identity_tbl"
    shutil.rmtree(root, ignore_errors=True)
    frame = spark.range(0, n).select(
        F.col("id").alias("k"), (F.col("id") % 7).cast("string").alias("p")
    ).repartition(32)

    # baseline: plain append, no identity duty
    t0 = time.time()
    write_delta_native(spark, frame, root, partition_by=["p"],
                       checkpoint_interval=0)
    t_plain = time.time() - t0

    _, meta, _, current, _ = snapshot_actions(spark, root)
    sj = json.loads(meta["schemaString"])
    sj["fields"].insert(0, {
        "name": "rid", "type": "long", "nullable": True,
        "metadata": {"delta.identity.start": 1,
                     "delta.identity.step": 2,
                     "delta.identity.allowExplicitInsert": False}})
    with open(os.path.join(root, "_delta_log",
                           f"{current + 1:020d}.json"), "w") as f:
        f.write(json.dumps({"commitInfo": {
            "timestamp": 2, "operation": "ADD COLUMN"}}) + "\n")
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 1, "minWriterVersion": 6}}) + "\n")
        f.write(json.dumps({"metaData": {
            **meta, "schemaString": json.dumps(sj)}}) + "\n")

    frame2 = spark.range(n, 2 * n).select(
        F.col("id").alias("k"), (F.col("id") % 7).cast("string").alias("p")
    ).repartition(32)
    t0 = time.time()
    write_delta_native(spark, frame2, root, checkpoint_interval=0)
    t_gen = time.time() - t0

    # verify the full lattice via ONE distributed aggregate (no collect
    # of n rows): count, min, max, distinct, and sum must all match the
    # closed forms of 1,3,5,...,1+2(n-1)
    agg = read_delta_native(spark, root).filter("rid IS NOT NULL").agg(
        F.count("rid").alias("n"),
        F.countDistinct("rid").alias("nd"),
        F.min("rid").alias("lo"),
        F.max("rid").alias("hi"),
        F.sum("rid").alias("s"),
    ).collect()[0]
    assert agg["n"] == n and agg["nd"] == n, (agg["n"], agg["nd"])
    assert agg["lo"] == 1 and agg["hi"] == 1 + 2 * (n - 1), agg
    assert agg["s"] == n * n  # sum of first n odd numbers
    # parity: every value is odd (on the lattice)
    off = read_delta_native(spark, root).filter(
        "rid IS NOT NULL AND rid % 2 = 0").count()
    assert off == 0

    # chain continues in a third append
    t0 = time.time()
    write_delta_native(
        spark,
        spark.range(0, 1000).select(
            F.lit(-1).cast("long").alias("k"), F.lit("0").alias("p")
        ),
        root, checkpoint_interval=0,
    )
    t_gen2 = time.time() - t0
    hi2 = read_delta_native(spark, root).agg(F.max("rid")).collect()[0][0]
    assert hi2 == 1 + 2 * (n + 1000 - 1), hi2

    print(json.dumps({
        "rows": n,
        "plain_append_sec": round(t_plain, 2),
        "identity_append_sec": round(t_gen, 2),
        "overhead_pct": round(100 * (t_gen - t_plain) / t_plain, 1),
        "small_append_sec": round(t_gen2, 2),
        "lattice": "verified (count/distinct/min/max/sum/parity)",
    }))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
