"""IDENTITY columns (Delta writer version 6 / identityColumns feature,
r7): omitted identity columns are GENERATED from the start/step lattice
contiguous after the high watermark, the watermark advances via a
metaData action in the SAME commit, GENERATED ALWAYS refuses explicit
values, and ops that cannot maintain the duty (UPDATE SET on the
column, MERGE) refuse by name. Reference behavior: delta-spark's
IdentityColumn support (delta.identity.* field metadata keys per the
published Delta protocol).

Also pins the r7 metaData-preservation fix: schema-changing commits
(mergeSchema evolution, overwrite) keep the table's configuration /
name / description — wiping them silently disabled CDF/appendOnly."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from rtdl_spark.sources.delta_reader import (
    read_delta_native,
    snapshot_actions,
)
from rtdl_spark.sources.delta_writer import write_delta_native


def _identity_table(spark, tmp_path, explicit=False, start=100, step=3,
                    name="idt"):
    """7-row partitioned table upgraded to carry an identity column
    ``rid`` (added via log surgery like a foreign writer would)."""
    root = str(tmp_path / name)
    df = spark.range(0, 7).select(
        F.col("id").alias("k"), (F.col("id") % 2).cast("string").alias("p")
    )
    write_delta_native(
        spark, df, root, partition_by=["p"], checkpoint_interval=0
    )
    _, meta, _, current, _ = snapshot_actions(spark, root)
    sj = json.loads(meta["schemaString"])
    sj["fields"].insert(0, {
        "name": "rid", "type": "long", "nullable": True,
        "metadata": {
            "delta.identity.start": start,
            "delta.identity.step": step,
            "delta.identity.allowExplicitInsert": explicit,
        },
    })
    with open(
        os.path.join(root, "_delta_log", f"{current + 1:020d}.json"), "w"
    ) as f:
        f.write(json.dumps({"commitInfo": {
            "timestamp": 2, "operation": "ADD COLUMN"}}) + "\n")
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 1, "minWriterVersion": 6}}) + "\n")
        f.write(json.dumps({"metaData": {
            **meta, "schemaString": json.dumps(sj)}}) + "\n")
    return root


def test_identity_generation_and_watermark(spark, tmp_path):
    """Omitted identity values are generated contiguously from the
    lattice; the high watermark advances in the same commit; the next
    append continues the chain."""
    root = _identity_table(spark, tmp_path)
    df = spark.range(100, 110).select(
        F.col("id").alias("k"), (F.col("id") % 2).cast("string").alias("p")
    ).repartition(3)
    v = write_delta_native(spark, df, root, checkpoint_interval=0)

    rids = sorted(
        r["rid"]
        for r in read_delta_native(spark, root).filter("k >= 100").collect()
    )
    assert rids == [100 + 3 * i for i in range(10)]
    _, meta, _, _, _ = snapshot_actions(spark, root)
    f0 = json.loads(meta["schemaString"])["fields"][0]
    assert f0["metadata"]["delta.identity.highWaterMark"] == 127
    # the commit carries the metaData action (same-commit watermark)
    acts = [json.loads(line) for line in open(
        os.path.join(root, "_delta_log", f"{v:020d}.json"))]
    assert any("metaData" in a for a in acts)

    write_delta_native(
        spark,
        spark.range(200, 203).select(
            F.col("id").alias("k"), (F.col("id") % 2).cast("string").alias("p")
        ),
        root, checkpoint_interval=0,
    )
    rids2 = sorted(
        r["rid"]
        for r in read_delta_native(spark, root).filter("k >= 200").collect()
    )
    assert rids2 == [130, 133, 136]
    # pre-upgrade files null-fill the identity column
    assert all(
        r["rid"] is None
        for r in read_delta_native(spark, root).filter("k < 7").collect()
    )


def test_identity_generated_always_refuses_explicit(spark, tmp_path):
    root = _identity_table(spark, tmp_path)
    df = spark.range(1).select(
        F.lit(5).cast("long").alias("rid"),
        F.lit(9).cast("long").alias("k"),
        F.lit("1").alias("p"),
    )
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        write_delta_native(spark, df, root, checkpoint_interval=0)


def test_identity_by_default_allows_explicit_and_still_generates(
    spark, tmp_path
):
    root = _identity_table(spark, tmp_path, explicit=True)
    write_delta_native(
        spark,
        spark.range(1).select(
            F.lit(999).cast("long").alias("rid"),
            F.lit(50).cast("long").alias("k"),
            F.lit("0").alias("p"),
        ),
        root, checkpoint_interval=0,
    )
    assert [
        r["rid"]
        for r in read_delta_native(spark, root).filter("k = 50").collect()
    ] == [999]
    # explicit values do NOT advance the watermark (spec: SYNC IDENTITY
    # is the resync mechanism); generation still starts at `start`
    write_delta_native(
        spark,
        spark.range(60, 62).select(
            F.col("id").alias("k"), F.lit("0").alias("p")
        ),
        root, checkpoint_interval=0,
    )
    assert sorted(
        r["rid"]
        for r in read_delta_native(spark, root).filter("k >= 60").collect()
    ) == [100, 103]


def test_identity_negative_step_and_update_merge_refusals(spark, tmp_path):
    from rtdl_spark.sources.delta_writer import (
        merge_into_delta_native,
        update_where_delta_native,
    )

    root = _identity_table(spark, tmp_path, start=-10, step=-5)
    write_delta_native(
        spark,
        spark.range(70, 73).select(
            F.col("id").alias("k"), F.lit("0").alias("p")
        ),
        root, checkpoint_interval=0,
    )
    got = sorted(
        r["rid"]
        for r in read_delta_native(spark, root).filter("k >= 70").collect()
    )
    assert got == [-20, -15, -10]

    with pytest.raises(ValueError, match="IDENTITY"):
        update_where_delta_native(spark, root, "k = 70", {"rid": "1"})
    with pytest.raises(ValueError, match="IDENTITY"):
        merge_into_delta_native(
            spark, root, read_delta_native(spark, root).limit(1), on=["k"]
        )
    # DELETE and non-identity UPDATE still work
    update_where_delta_native(spark, root, "k = 70", {"k": "k + 100"})
    assert read_delta_native(spark, root).filter("k = 170").count() == 1


def test_evolution_preserves_table_configuration(spark, tmp_path):
    """REGRESSION (r7): a mergeSchema append's metaData action used to
    reset configuration to {} — on a CDF/appendOnly table that silently
    DISABLED the feature. Evolution now carries the configuration (and
    name/description) forward."""
    root = str(tmp_path / "cfg")
    write_delta_native(
        spark, spark.range(5).select("id"), root, checkpoint_interval=0
    )
    _, meta, _, current, _ = snapshot_actions(spark, root)
    with open(
        os.path.join(root, "_delta_log", f"{current + 1:020d}.json"), "w"
    ) as f:
        f.write(json.dumps({"commitInfo": {
            "timestamp": 2, "operation": "SET TBLPROPERTIES"}}) + "\n")
        f.write(json.dumps({"metaData": {
            **meta,
            "name": "mytable",
            "configuration": {"delta.enableChangeDataFeed": "true"}}})
            + "\n")
    with open(
        os.path.join(root, "_delta_log", f"{current + 2:020d}.json"), "w"
    ) as f:
        f.write(json.dumps({"commitInfo": {
            "timestamp": 3, "operation": "UPGRADE"}}) + "\n")
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 1, "minWriterVersion": 4}}) + "\n")

    write_delta_native(                      # mergeSchema evolution
        spark,
        spark.range(5, 8).select("id", F.lit(1.5).alias("score")),
        root, merge_schema=True, checkpoint_interval=0,
    )
    _, meta2, _, _, _ = snapshot_actions(spark, root)
    assert meta2.get("configuration") == {
        "delta.enableChangeDataFeed": "true"
    }, "evolution must not wipe table configuration"
    assert meta2.get("name") == "mytable"

    # and the feature still WORKS: a delete now emits cdc files
    from rtdl_spark.sources.delta_writer import delete_where_delta_native

    res = delete_where_delta_native(spark, root, "id = 6")
    assert res["cdc_files"] >= 1


def test_identity_composes_with_column_mapping(spark, tmp_path):
    """Identity generation on a COLUMN-MAPPED table: values generate in
    logical terms, the frame stages under physical names, and the
    watermark metaData patch preserves the CM metadata (it patches the
    TABLE's schemaString, never the frame's)."""
    import glob

    import pyarrow.parquet as pq

    root = str(tmp_path / "idcm")
    write_delta_native(
        spark, spark.range(0, 6).select(F.col("id").alias("k")), root,
        checkpoint_interval=0,
    )
    _, meta, _, current, _ = snapshot_actions(spark, root)
    sj = json.loads(meta["schemaString"])
    sj["fields"][0]["metadata"] = {
        "delta.columnMapping.id": 1,
        "delta.columnMapping.physicalName": "k",
    }
    sj["fields"].insert(0, {
        "name": "rid", "type": "long", "nullable": True,
        "metadata": {
            "delta.identity.start": 7,
            "delta.identity.step": 1,
            "delta.identity.allowExplicitInsert": False,
            "delta.columnMapping.id": 2,
            "delta.columnMapping.physicalName": "col-rid-phys",
        },
    })
    with open(
        os.path.join(root, "_delta_log", f"{current + 1:020d}.json"), "w"
    ) as f:
        f.write(json.dumps({"commitInfo": {
            "timestamp": 2, "operation": "UPGRADE"}}) + "\n")
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 2, "minWriterVersion": 7,
            "writerFeatures": ["columnMapping", "identityColumns",
                               "appendOnly", "invariants"]}}) + "\n")
        f.write(json.dumps({"metaData": {
            **meta, "schemaString": json.dumps(sj),
            "configuration": {
                "delta.columnMapping.mode": "name",
                "delta.columnMapping.maxColumnId": "2"}}}) + "\n")

    write_delta_native(
        spark, spark.range(100, 103).select(F.col("id").alias("k")),
        root, checkpoint_interval=0,
    )
    rids = sorted(
        r["rid"]
        for r in read_delta_native(spark, root).filter("k >= 100").collect()
    )
    assert rids == [7, 8, 9]
    _, meta2, _, _, _ = snapshot_actions(spark, root)
    f0 = json.loads(meta2["schemaString"])["fields"][0]
    assert f0["metadata"]["delta.identity.highWaterMark"] == 9
    assert f0["metadata"]["delta.columnMapping.physicalName"] == (
        "col-rid-phys"
    )
    newest = max(glob.glob(root + "/*.parquet"), key=os.path.getmtime)
    assert "col-rid-phys" in pq.ParquetFile(newest).schema_arrow.names


def test_sync_identity_advances_watermark_past_explicit_values(
    spark, tmp_path
):
    """SYNC IDENTITY (r8): explicit inserts to a BY DEFAULT column
    never advance the watermark — the resync re-derives it from the
    column data, rounded UP to the start/step lattice, so post-resync
    generation never collides with explicit values."""
    from rtdl_spark.sources.delta_reader import delta_history
    from rtdl_spark.sources.delta_writer import sync_identity_delta_native

    root = _identity_table(spark, tmp_path, explicit=True)
    # explicit rids 150 and 155 (155 is OFF the 100+3k lattice)
    write_delta_native(
        spark,
        spark.createDataFrame(
            [(150, 90, "0"), (155, 91, "1")], "rid long, k long, p string"
        ),
        root, checkpoint_interval=0,
    )
    res = sync_identity_delta_native(spark, root)
    # smallest lattice point >= 155: 100 + 3*19 = 157
    assert res["high_watermarks"] == {"rid": 157}
    assert res["version"] is not None
    assert delta_history(spark, root)[-1]["operation"] == "SYNC IDENTITY"
    _, meta, _, _, _ = snapshot_actions(spark, root)
    f0 = json.loads(meta["schemaString"])["fields"][0]
    assert f0["metadata"]["delta.identity.highWaterMark"] == 157

    # post-resync generation continues BEYOND the explicit values
    write_delta_native(
        spark,
        spark.range(300, 303).select(
            F.col("id").alias("k"), F.lit("0").alias("p")
        ),
        root, checkpoint_interval=0,
    )
    gen = sorted(
        r["rid"]
        for r in read_delta_native(spark, root).filter("k >= 300").collect()
    )
    assert gen == [160, 163, 166]
    assert len(set(
        r["rid"] for r in read_delta_native(spark, root)
        .filter("rid IS NOT NULL").collect()
    )) == read_delta_native(spark, root).filter(
        "rid IS NOT NULL"
    ).count(), "no collisions after resync"

    # already in sync -> no commit
    res2 = sync_identity_delta_native(spark, root)
    assert res2 == {"version": None, "high_watermarks": {}}

    # NON-REGRESSION: deleting the top rows never lowers the watermark
    from rtdl_spark.sources.delta_writer import delete_where_delta_native
    delete_where_delta_native(spark, root, "k >= 90")
    res3 = sync_identity_delta_native(spark, root)
    assert res3["version"] is None, "lowering is refused by design"


def test_sync_identity_negative_step_and_refusals(spark, tmp_path):
    from rtdl_spark.sources.delta_writer import sync_identity_delta_native

    root = _identity_table(
        spark, tmp_path, explicit=True, start=100, step=-3
    )
    write_delta_native(
        spark,
        spark.createDataFrame([(50, 80, "0")], "rid long, k long, p string"),
        root, checkpoint_interval=0,
    )
    res = sync_identity_delta_native(spark, root, columns=["rid"])
    # most-positive lattice point <= 50: 100 - 3*17 = 49
    assert res["high_watermarks"] == {"rid": 49}
    write_delta_native(
        spark,
        spark.range(400, 401).select(
            F.col("id").alias("k"), F.lit("0").alias("p")
        ),
        root, checkpoint_interval=0,
    )
    assert [
        r["rid"]
        for r in read_delta_native(spark, root).filter("k = 400").collect()
    ] == [46]

    with pytest.raises(ValueError, match="not identity columns"):
        sync_identity_delta_native(spark, root, columns=["k"])

    plain = str(tmp_path / "plain")
    write_delta_native(
        spark, spark.range(3).select("id"), plain, checkpoint_interval=0
    )
    with pytest.raises(ValueError, match="no identity columns"):
        sync_identity_delta_native(spark, plain)


def test_merge_on_by_default_identity_table(spark, tmp_path):
    """MERGE on a BY DEFAULT identity table (r8 — was refused for any
    identity table): the source's identity values are explicit inserts
    (legal for allowExplicitInsert=true; watermark untouched, SYNC
    IDENTITY is the resync); GENERATED ALWAYS still refuses."""
    from rtdl_spark.sources.delta_writer import merge_into_delta_native

    root = _identity_table(spark, tmp_path, explicit=True)
    write_delta_native(
        spark,
        spark.createDataFrame(
            [(200, 1, "1"), (203, 2, "0")], "rid long, k long, p string"
        ),
        root, checkpoint_interval=0,
    )
    src = spark.createDataFrame(
        [(999, 1, "1"), (555, 50, "0")], "rid long, k long, p string"
    )
    res = merge_into_delta_native(spark, root, src, on=["k"])
    assert res["version"] is not None
    got = {
        r["k"]: r["rid"]
        for r in read_delta_native(spark, root).filter("rid IS NOT NULL")
        .collect()
    }
    assert got[1] == 999 and got[50] == 555 and got[2] == 203

    always = _identity_table(spark, tmp_path, explicit=False, name="alw")
    with pytest.raises(ValueError, match="GENERATED ALWAYS IDENTITY"):
        merge_into_delta_native(
            spark, always,
            spark.createDataFrame([(1, 5, "1")],
                                  "rid long, k long, p string"),
            on=["k"],
        )
