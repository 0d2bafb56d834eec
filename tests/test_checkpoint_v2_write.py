"""V2 (UUID-named) checkpoint WRITES (r8 — reads landed in r7).

The conformance oracle is the repo's own STRICT v2 read side
(delta_reader._checkpoint_layout / _v2_sidecar_paths: exactly one
checkpointMetadata action whose version matches the file name, every
sidecar present under _delta_log/_sidecars/, control rows from the
top-level only), written spec-first in r7 against the published Delta
protocol. Reference behavior: delta-spark's checkpointPolicy=v2 writer
(rtdl delegates all Delta maintenance to delta-spark —
/root/reference/deltawriter/delta_writer.py:88-94).
"""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from rtdl_spark.sources.delta_reader import (
    read_delta_native,
    snapshot_actions,
    snapshot_domains,
)
from rtdl_spark.sources.delta_writer import (
    write_checkpoint_native,
    write_delta_native,
)


def _upgrade_v2(root, extra_reader=(), extra_writer=()):
    """Protocol upgrade commit adding the v2Checkpoint reader+writer
    feature (plus extras), like a foreign writer would."""
    _log = os.path.join(root, "_delta_log")
    current = max(
        int(os.path.basename(p).split(".")[0])
        for p in glob.glob(os.path.join(_log, "*.json"))
    )
    with open(os.path.join(_log, f"{current + 1:020d}.json"), "w") as f:
        f.write(json.dumps({"commitInfo": {
            "timestamp": 5, "operation": "UPGRADE"}}) + "\n")
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["v2Checkpoint", *extra_reader],
            "writerFeatures": ["v2Checkpoint", "appendOnly",
                               "invariants", *extra_writer]}}) + "\n")
    return current + 1


def test_v2_checkpoint_write_roundtrip(spark, tmp_path):
    """write -> STRICT native re-read parity at checkpoint-bounded
    replay: data, SetTransaction watermarks and domainMetadata all come
    through the v2 top-level + sidecar layout after the JSON tail below
    the checkpoint is deleted."""
    root = str(tmp_path / "v2w")
    df = spark.range(0, 20).select(
        "id", (F.col("id") % 2).cast("string").alias("p")
    )
    write_delta_native(
        spark, df, root, partition_by=["p"], checkpoint_interval=0
    )
    v_up = _upgrade_v2(root)
    write_delta_native(
        spark,
        spark.range(20, 30).select(
            "id", (F.col("id") % 2).cast("string").alias("p")
        ),
        root, checkpoint_interval=0, txn=("appA", 7),
    )
    log = os.path.join(root, "_delta_log")
    with open(os.path.join(log, f"{v_up + 2:020d}.json"), "w") as f:
        f.write(json.dumps({"commitInfo": {
            "timestamp": 6, "operation": "DOMAIN"}}) + "\n")
        f.write(json.dumps({"domainMetadata": {
            "domain": "delta.test", "configuration": "{\"x\":1}",
            "removed": False}}) + "\n")

    v = write_checkpoint_native(spark, root, layout="v2")
    assert v == v_up + 2
    # the UUID-named top-level exists; the classic name does NOT
    tops = glob.glob(os.path.join(log, f"{v:020d}.checkpoint.*.parquet"))
    assert len(tops) == 1
    assert not os.path.exists(
        os.path.join(log, f"{v:020d}.checkpoint.parquet")
    )
    sidecars = glob.glob(os.path.join(log, "_sidecars", "*.parquet"))
    assert len(sidecars) == 1
    # spec: no file actions inline in the top-level
    top_cols = spark.read.parquet(tops[0]).columns
    assert "add" not in top_cols and "remove" not in top_cols
    assert {"checkpointMetadata", "sidecar", "protocol",
            "metaData", "txn", "domainMetadata"} <= set(top_cols)

    # delete every pre-checkpoint commit: a successful read now PROVES
    # the snapshot came through the v2 layout
    for p in glob.glob(os.path.join(log, "*.json")):
        if int(os.path.basename(p).split(".")[0]) <= v:
            os.remove(p)
    got = read_delta_native(spark, root)
    assert sorted(r["id"] for r in got.collect()) == list(range(30))
    # control plane survives checkpoint-bounded replay
    protocol, meta, _active, current, txns = snapshot_actions(spark, root)
    assert current == v
    assert txns.get("appA") == 7
    assert "v2Checkpoint" in (protocol.get("readerFeatures") or [])
    doms = snapshot_domains(spark, root)
    assert doms["delta.test"]["configuration"] == "{\"x\":1}"

    # appends after the checkpoint replay on top of it
    write_delta_native(
        spark,
        spark.range(30, 33).select(
            "id", (F.col("id") % 2).cast("string").alias("p")
        ),
        root, checkpoint_interval=0,
    )
    assert read_delta_native(spark, root).count() == 33


def test_v2_checkpoint_preserves_dv_and_splits_sidecars(spark, tmp_path):
    """Deletion-vector descriptors survive the sidecar layout (dropping
    them would resurrect deleted rows for checkpoint-bounded readers);
    sidecar_parts=N emits N sidecar files, each referenced by its own
    sidecar action."""
    from rtdl_spark.sources.delta_writer import delete_where_delta_dv

    root = str(tmp_path / "v2dv")
    write_delta_native(
        spark,
        spark.range(0, 30).select(
            "id", (F.col("id") % 3).cast("string").alias("p")
        ).repartition(2),
        root, partition_by=["p"], checkpoint_interval=0,
    )
    log = os.path.join(root, "_delta_log")
    current = 0
    with open(os.path.join(log, f"{current + 1:020d}.json"), "w") as f:
        f.write(json.dumps({"commitInfo": {
            "timestamp": 5, "operation": "UPGRADE"}}) + "\n")
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["v2Checkpoint", "deletionVectors"],
            "writerFeatures": ["v2Checkpoint", "deletionVectors",
                               "appendOnly", "invariants"]}}) + "\n")
        f.write(json.dumps({"metaData": {
            **snapshot_actions(spark, root)[1],
            "configuration": {"delta.enableDeletionVectors": "true"},
        }}) + "\n")
    delete_where_delta_dv(spark, root, "id % 5 = 0")

    v = write_checkpoint_native(
        spark, root, layout="v2", sidecar_parts=2
    )
    sidecars = glob.glob(os.path.join(log, "_sidecars", "*.parquet"))
    assert len(sidecars) == 2
    for p in glob.glob(os.path.join(log, "*.json")):
        if int(os.path.basename(p).split(".")[0]) <= v:
            os.remove(p)
    got = sorted(r["id"] for r in read_delta_native(spark, root).collect())
    assert got == [i for i in range(30) if i % 5 != 0], (
        "DV mask must survive v2 checkpoint-bounded replay"
    )


def test_v2_checkpoint_refuses_without_feature(spark, tmp_path):
    root = str(tmp_path / "plain")
    write_delta_native(
        spark, spark.range(5).select("id"), root, checkpoint_interval=0
    )
    with pytest.raises(ValueError, match="v2Checkpoint"):
        write_checkpoint_native(spark, root, layout="v2")


def test_log_cleanup_reaps_orphaned_sidecars(spark, tmp_path):
    """cleanup_delta_log_native: when a superseded v2 checkpoint is
    cleaned, sidecar files no SURVIVING checkpoint references go with
    it — referenced ones stay (the spec allows sidecar sharing, so
    liveness is computed against the survivors, never inferred from
    the deleted top alone)."""
    from rtdl_spark.sources.delta_writer import cleanup_delta_log_native

    root = str(tmp_path / "v2clean")
    write_delta_native(
        spark, spark.range(0, 10).select("id"), root,
        checkpoint_interval=0,
    )
    _upgrade_v2(root)
    write_checkpoint_native(spark, root, layout="v2")  # ckpt at v1
    log = os.path.join(root, "_delta_log")
    old_sidecars = set(glob.glob(os.path.join(log, "_sidecars", "*")))
    write_delta_native(
        spark, spark.range(10, 15).select("id"), root,
        checkpoint_interval=0,
    )
    write_checkpoint_native(spark, root, layout="v2")  # ckpt at v2
    new_sidecars = (
        set(glob.glob(os.path.join(log, "_sidecars", "*"))) - old_sidecars
    )
    assert old_sidecars and new_sidecars

    victims = cleanup_delta_log_native(spark, root, retain_ms=0)
    assert any(v.startswith("_sidecars/") for v in victims)
    left = set(glob.glob(os.path.join(log, "_sidecars", "*")))
    assert left == new_sidecars, (
        "only the superseded checkpoint's unreferenced sidecars die"
    )
    assert read_delta_native(spark, root).count() == 15
