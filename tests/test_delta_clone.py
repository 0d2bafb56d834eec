"""SHALLOW CLONE (sources/delta_clone.py): a new table referencing the
source's files by absolute path — zero copy, copy-on-write DML, DV
descriptors rewritten to the absolute 'p' form, domains carried.
Reference semantics: delta-spark CREATE TABLE ... SHALLOW CLONE."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from rtdl_spark.sources.delta_clone import clone_delta_native
from rtdl_spark.sources.delta_reader import (
    read_delta_native,
    snapshot_actions,
    snapshot_domains,
)
from rtdl_spark.sources.delta_writer import write_delta_native


def _frame(spark, lo, hi):
    return spark.range(lo, hi).select(
        "id",
        (F.col("id") * 2).alias("v"),
        (F.col("id") % 3).cast("string").alias("p"),
    )


def test_shallow_clone_reads_and_diverges(spark, tmp_path):
    """The clone equals the source snapshot at clone time, copies no
    data file, and the two tables evolve independently afterwards."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    write_delta_native(spark, _frame(spark, 0, 20), src,
                       partition_by=["p"], checkpoint_interval=0)
    write_delta_native(spark, _frame(spark, 20, 30), src,
                       checkpoint_interval=0)
    res = clone_delta_native(spark, src, dst)
    assert res["version"] == 0 and res["source_version"] == 1
    assert res["files_referenced"] > 0

    got = read_delta_native(spark, dst)
    assert sorted(r["id"] for r in got.collect()) == list(range(30))
    # zero data files under the clone root — only the log
    data_files = [
        p for p, _d, files in os.walk(dst) for f in files
        if f.endswith(".parquet") and "_delta_log" not in p
        for p in [os.path.join(p, f)]
    ]
    assert data_files == []

    # divergence: appends to one never show in the other
    write_delta_native(spark, _frame(spark, 100, 105), dst,
                       checkpoint_interval=0)
    write_delta_native(spark, _frame(spark, 200, 202), src,
                       checkpoint_interval=0)
    assert read_delta_native(spark, dst).count() == 35
    assert read_delta_native(spark, src).count() == 32

    # version-pinned clone sees only v0
    dst0 = str(tmp_path / "dst0")
    clone_delta_native(spark, src, dst0, version=0)
    assert read_delta_native(spark, dst0).count() == 20

    # refusals: existing target, self-clone
    with pytest.raises(ValueError, match="already a Delta table"):
        clone_delta_native(spark, src, dst)
    with pytest.raises(ValueError, match="onto itself"):
        clone_delta_native(spark, src, src)


def test_clone_dml_is_copy_on_write(spark, tmp_path):
    """DELETE/UPDATE/OPTIMIZE on the clone stage rewrites into the
    CLONE's directory and never touch the source's files or state."""
    from rtdl_spark.sources.delta_writer import (
        delete_where_delta_native,
        optimize_delta_native,
        update_where_delta_native,
    )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    write_delta_native(spark, _frame(spark, 0, 30).repartition(3), src,
                       checkpoint_interval=0)
    src_files = {
        f for _p, _d, files in os.walk(src) for f in files
        if f.endswith(".parquet")
    }
    clone_delta_native(spark, src, dst)

    delete_where_delta_native(spark, dst, "id % 5 = 0")
    update_where_delta_native(spark, dst, "id = 7", {"v": "700"})
    optimize_delta_native(spark, dst, min_files=1)

    # clone state is right
    got = read_delta_native(spark, dst)
    ids = sorted(r["id"] for r in got.collect())
    assert ids == [i for i in range(30) if i % 5 != 0]
    assert got.filter(F.col("id") == 7).collect()[0]["v"] == 700
    # source untouched: same files on disk, same content
    src_files_after = {
        f for _p, _d, files in os.walk(src) for f in files
        if f.endswith(".parquet")
    }
    assert src_files_after == src_files
    s = read_delta_native(spark, src)
    assert s.count() == 30
    assert s.filter(F.col("id") == 7).collect()[0]["v"] == 14
    # the clone's rewritten files live under the clone root now
    clone_files = [
        f for _p, _d, files in os.walk(dst) for f in files
        if f.endswith(".parquet")
    ]
    assert clone_files


def test_clone_vacuum_never_reaps_shared_files(spark, tmp_path):
    """VACUUM on the clone only considers files under its own root —
    shared absolute-path source files are never candidates, even after
    the clone tombstoned them in a rewrite."""
    from rtdl_spark.sources.delta_writer import (
        delete_where_delta_native,
        vacuum_delta_native,
    )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    write_delta_native(spark, _frame(spark, 0, 20).repartition(2), src,
                       checkpoint_interval=0)
    clone_delta_native(spark, src, dst)
    delete_where_delta_native(spark, dst, "id < 10")  # tombstones shared
    victims = vacuum_delta_native(spark, dst, retain_ms=0)
    assert all(not v.startswith(src) for v in victims)
    assert read_delta_native(spark, src).count() == 20
    assert read_delta_native(spark, dst).count() == 10


def test_clone_dv_table_rewrites_descriptors_absolute(spark, tmp_path):
    """Cloning a table with active deletion vectors rewrites their
    descriptors to the absolute 'p' form (the relative 'u' form would
    resolve against the clone's root); masked rows stay masked."""
    from rtdl_spark.sources.delta_writer import delete_where_delta_dv

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    write_delta_native(spark, _frame(spark, 0, 30).repartition(2), src,
                       checkpoint_interval=0)
    _, meta, _, current, _ = snapshot_actions(spark, src)
    with open(
        os.path.join(src, "_delta_log", f"{current + 1:020d}.json"), "w"
    ) as f:
        f.write(json.dumps({"commitInfo": {
            "timestamp": 2, "operation": "UPGRADE"}}) + "\n")
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": ["deletionVectors"]}}) + "\n")
        f.write(json.dumps({"metaData": {
            **meta,
            "configuration": {"delta.enableDeletionVectors": "true"},
        }}) + "\n")
    delete_where_delta_dv(spark, src, "id % 3 = 0")

    clone_delta_native(spark, src, dst)
    _, _, active, _, _ = snapshot_actions(spark, dst)
    dvs = [a["deletionVector"] for a in active.values()
           if a.get("deletionVector")]
    assert dvs and all(d["storageType"] == "p" for d in dvs)
    assert all(d["pathOrInlineDv"].startswith(src) for d in dvs)
    got = read_delta_native(spark, dst)
    assert sorted(r["id"] for r in got.collect()) == [
        i for i in range(30) if i % 3 != 0
    ]


def test_clone_carries_domains_and_checkpoints(spark, tmp_path):
    """Clustering domain metadata survives the clone (OPTIMIZE on the
    clone reclusters by it) and the clone can checkpoint + truncate its
    own log tail without losing the absolute references."""
    from rtdl_spark.sources.delta_writer import (
        optimize_delta_native,
        write_checkpoint_native,
    )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    write_delta_native(
        spark,
        spark.range(0, 40).select("id", (F.col("id") * 2).alias("v")),
        src, cluster_by=["v"], checkpoint_interval=0,
    )
    clone_delta_native(spark, src, dst)
    doms = snapshot_domains(spark, dst)
    assert json.loads(doms["delta.clustering"]["configuration"]) == {
        "clusteringColumns": [["v"]]
    }
    res = optimize_delta_native(spark, dst, min_files=1)
    assert res["version"] is not None

    cv = write_checkpoint_native(spark, dst)
    for old in range(0, cv + 1):
        p = os.path.join(dst, "_delta_log", f"{old:020d}.json")
        if os.path.exists(p):
            os.remove(p)
    assert read_delta_native(spark, dst).count() == 40

    # clone-of-clone: absolute paths pass through unchanged
    dst2 = str(tmp_path / "dst2")
    clone_delta_native(spark, dst, dst2)
    assert read_delta_native(spark, dst2).count() == 40


def test_streaming_from_a_shallow_clone(spark, tmp_path):
    """The Delta streaming source resolves the clone's absolute-path
    adds (os.path.join with an absolute operand IS the absolute path):
    an availableNow run over a fresh clone emits exactly the referenced
    rows, and a post-clone append to the SOURCE emits nothing."""
    from rtdl_spark.sources.delta_stream_source import (
        DeltaStreamDataSource,
    )

    spark.dataSource.register(DeltaStreamDataSource)
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    write_delta_native(spark, _frame(spark, 0, 12).repartition(2), src,
                       checkpoint_interval=0)
    clone_delta_native(spark, src, dst)
    write_delta_native(spark, _frame(spark, 100, 105), src,
                       checkpoint_interval=0)  # source-only append

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("rtdl_delta_stream")
        .option("path", dst)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert sorted(r["id"] for r in got.collect()) == list(range(12))
