"""Change Data Feed (r7): write-side cdc emission for DELETE/UPDATE
WHERE on CDF-enabled tables (delta_writer.py) and the table_changes
reader (delta_reader.py::read_table_changes_cdf). Reference behavior:
a commit WITH cdc actions is described only by its _change_data files;
a commit without derives inserts from dataChange adds and deletes from
dataChange removes."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from rtdl_spark.sources.delta_reader import (
    read_delta_native,
    read_table_changes_cdf,
    snapshot_actions,
)
from rtdl_spark.sources.delta_writer import (
    delete_where_delta_native,
    update_where_delta_native,
    write_delta_native,
)


def _cdf_table(spark, tmp_path, partitioned=True):
    root = str(tmp_path / "cdf")
    df = spark.range(0, 20).select(
        "id", (F.col("id") % 2).cast("string").alias("p")
    )
    write_delta_native(
        spark, df, root,
        partition_by=["p"] if partitioned else None,
        checkpoint_interval=0,
    )
    _, meta, _, current, _ = snapshot_actions(spark, root)
    with open(
        os.path.join(root, "_delta_log", f"{current + 1:020d}.json"), "w"
    ) as f:
        f.write(json.dumps({"commitInfo": {
            "timestamp": 2, "operation": "SET TBLPROPERTIES"}}) + "\n")
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 1, "minWriterVersion": 4}}) + "\n")
        f.write(json.dumps({"metaData": {
            **meta,
            "configuration": {"delta.enableChangeDataFeed": "true"}}})
            + "\n")
    return root


def test_cdf_delete_and_update_emit_cdc(spark, tmp_path):
    """DELETE/UPDATE on a CDF table write _change_data files + cdc
    actions; the CDF reader returns exactly the changed rows with the
    right _change_type — and NOT the rewrite survivors (the failure
    mode cdc actions exist to prevent)."""
    root = _cdf_table(spark, tmp_path)

    res = delete_where_delta_native(spark, root, "id IN (3, 5)")  # v2
    assert res["cdc_files"] >= 1
    res2 = update_where_delta_native(                             # v3
        spark, root, "id = 8", {"id": "id + 100"}
    )
    assert res2["cdc_files"] >= 1

    # the cdc files live under _change_data/, hidden from plain scans
    assert os.path.isdir(os.path.join(root, "_change_data"))
    got = sorted(r["id"] for r in read_delta_native(spark, root).collect())
    assert got == sorted(
        [i for i in range(20) if i not in (3, 5, 8)] + [108]
    )

    ch = read_table_changes_cdf(spark, root, 2, 3)
    rows = sorted(
        (r["_commit_version"], r["_change_type"], r["id"])
        for r in ch.collect()
    )
    assert rows == [
        (2, "delete", 3),
        (2, "delete", 5),
        (3, "update_postimage", 108),
        (3, "update_preimage", 8),
    ], "cdc must describe ONLY the changed rows, never the survivors"
    # partition columns are injected and typed on cdc rows too
    by_id = {r["id"]: r["p"] for r in ch.collect()}
    assert by_id[3] == "1" and by_id[8] == "0" and by_id[108] == "0"


def test_cdf_derives_inserts_and_full_deletes(spark, tmp_path):
    """Commits WITHOUT cdc actions derive per spec: appends are
    inserts; a full-partition overwrite derives deletes of the old
    files + inserts of the new."""
    root = _cdf_table(spark, tmp_path, partitioned=False)
    write_delta_native(                                      # v2 append
        spark,
        spark.range(100, 103).select(
            "id", F.lit("9").alias("p")
        ),
        root,
        checkpoint_interval=0,
    )
    ch = read_table_changes_cdf(spark, root, 2, 2)
    rows = sorted((r["_change_type"], r["id"]) for r in ch.collect())
    assert rows == [("insert", 100), ("insert", 101), ("insert", 102)]

    # the creation commit (v0) predates delta.enableChangeDataFeed=true
    # (enabled at v1): strict mode refuses it — delta-spark parity, the
    # r8 ADVICE item (a pre-enable REWRITE would over-report unchanged
    # rows as delete+insert, so the whole feed-less range refuses)
    with pytest.raises(ValueError, match="not 'true'"):
        read_table_changes_cdf(spark, root, 0, 0)
    # explicit opt-in derives it as inserts (exact for pure appends)
    ch0 = read_table_changes_cdf(spark, root, 0, 0, allow_unrecorded=True)
    assert sorted(r["id"] for r in ch0.collect()) == list(range(20))
    assert {r["_change_type"] for r in ch0.collect()} == {"insert"}

    # version + timestamp metadata present
    r0 = ch0.limit(1).collect()[0]
    assert r0["_commit_version"] == 0
    assert r0["_commit_timestamp"] is not None


def test_cdf_merge_emits_full_change_set(spark, tmp_path):
    """MERGE on a CDF table describes matched targets as update
    pre/post images and unmatched source rows as inserts — all in the
    commit's cdc files."""
    from rtdl_spark.sources.delta_writer import merge_into_delta_native

    root = _cdf_table(spark, tmp_path)
    src = spark.createDataFrame(
        [(2, "0"), (3, "1"), (100, "0")], "id long, p string"
    )
    res = merge_into_delta_native(spark, root, src, on=["id"])  # v2
    assert res["version"] == 2
    ch = read_table_changes_cdf(spark, root, 2, 2)
    rows = sorted(
        (r["_change_type"], r["id"]) for r in ch.collect()
    )
    assert rows == [
        ("insert", 100),
        ("update_postimage", 2), ("update_postimage", 3),
        ("update_preimage", 2), ("update_preimage", 3),
    ]
    got = sorted(r["id"] for r in read_delta_native(spark, root).collect())
    assert got == sorted(list(range(20)) + [100])

    # when_matched=delete: matched targets appear as delete rows
    src2 = spark.createDataFrame([(7, "1")], "id long, p string")
    merge_into_delta_native(
        spark, root, src2, on=["id"],
        when_matched="delete", when_not_matched="ignore",
    )  # v3
    ch3 = read_table_changes_cdf(spark, root, 3, 3)
    assert sorted((r["_change_type"], r["id"]) for r in ch3.collect()) == [
        ("delete", 7)
    ]


def test_cdf_refusals(spark, tmp_path):
    """A cleaned-up range refuses loudly."""
    root = _cdf_table(spark, tmp_path)
    with pytest.raises(ValueError, match="missing commit"):
        read_table_changes_cdf(spark, root, 0, 99)


def _dv_cdf_table(spark, tmp_path, name="dvcdf"):
    """A table with BOTH deletion vectors and change data feed enabled
    (protocol v3/v7 with the features) — 30 rows, 3 partitions."""
    root = str(tmp_path / name)
    df = spark.range(0, 30).select(
        "id", (F.col("id") % 3).cast("string").alias("p")
    ).repartition(2)
    write_delta_native(
        spark, df, root, partition_by=["p"], checkpoint_interval=0
    )
    _, meta, _, current, _ = snapshot_actions(spark, root)
    with open(
        os.path.join(root, "_delta_log", f"{current + 1:020d}.json"), "w"
    ) as f:
        f.write(json.dumps({"commitInfo": {
            "timestamp": 2, "operation": "UPGRADE"}}) + "\n")
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": ["deletionVectors", "appendOnly",
                               "invariants", "changeDataFeed"]}}) + "\n")
        f.write(json.dumps({"metaData": {
            **meta,
            "configuration": {
                "delta.enableDeletionVectors": "true",
                "delta.enableChangeDataFeed": "true",
            }}}) + "\n")
    return root


def test_cdf_dv_delete_emits_only_newly_deleted(spark, tmp_path):
    """DV DELETE on a CDF table: a DV attach is remove+add of the SAME
    path (not derivable), so the commit carries cdc actions holding
    exactly the newly deleted rows — previously-masked rows never
    reappear in a later commit's change set."""
    from rtdl_spark.sources.delta_writer import delete_where_delta_dv

    root = _dv_cdf_table(spark, tmp_path)
    res = delete_where_delta_dv(spark, root, "id % 5 = 0")
    assert res["cdc_files"] >= 1
    ch = read_table_changes_cdf(spark, root, res["version"], res["version"])
    assert sorted((r["id"], r["_change_type"]) for r in ch.collect()) == [
        (i, "delete") for i in range(30) if i % 5 == 0
    ]

    # overlapping second delete: cdc holds ONLY the newly masked rows
    res2 = delete_where_delta_dv(spark, root, "id % 2 = 0")
    ch2 = read_table_changes_cdf(
        spark, root, res2["version"], res2["version"]
    )
    assert sorted(r["id"] for r in ch2.collect()) == [
        i for i in range(30) if i % 2 == 0 and i % 5 != 0
    ]


def test_cdf_dv_update_emits_pre_and_post_images(spark, tmp_path):
    """DV UPDATE on a CDF table: matched rows as update_preimage, their
    new versions as update_postimage — and rows already DV-deleted are
    neither updated nor reported."""
    from rtdl_spark.sources.delta_writer import (
        delete_where_delta_dv,
        update_where_delta_dv,
    )

    root = _dv_cdf_table(spark, tmp_path)
    delete_where_delta_dv(spark, root, "id = 7")
    res = update_where_delta_dv(spark, root, "id % 7 = 0", {"id": "id + 1000"})
    assert res["rows_updated"] == 4  # 0,14,21,28 — NOT the deleted 7
    ch = read_table_changes_cdf(spark, root, res["version"], res["version"])
    assert sorted((r["id"], r["_change_type"]) for r in ch.collect()) == (
        sorted(
            [(i, "update_preimage") for i in (0, 14, 21, 28)]
            + [(i + 1000, "update_postimage") for i in (0, 14, 21, 28)]
        )
    )


def test_cdf_restore_derives_including_dv_diffs(spark, tmp_path):
    """RESTORE on a CDF table commits adds/removes with no cdc actions
    — the reader derives inserts/deletes per spec; since r8 a restore
    diff involving deletion vectors derives too (the un-deleted rows
    come back as INSERTS from the mask diff — was a refusal)."""
    from rtdl_spark.sources.delta_writer import (
        delete_where_delta_dv,
        restore_delta_native,
    )

    root = _cdf_table(spark, tmp_path)
    write_delta_native(                                     # v2 append
        spark,
        spark.range(100, 110).select("id", F.lit("0").alias("p")),
        root,
        checkpoint_interval=0,
    )
    res = restore_delta_native(spark, root, 1)              # v3 restore
    ch = read_table_changes_cdf(spark, root, res["version"], res["version"])
    assert sorted((r["id"], r["_change_type"]) for r in ch.collect()) == [
        (i, "delete") for i in range(100, 110)
    ]
    got = sorted(r["id"] for r in read_delta_native(spark, root).collect())
    assert got == list(range(20))

    # DV-diff restore: restoring to before a DV DELETE un-masks the
    # deleted rows; the change feed derives them as INSERTS
    dv_root = _dv_cdf_table(spark, tmp_path)
    r = delete_where_delta_dv(spark, dv_root, "id % 5 = 0")
    res2 = restore_delta_native(spark, dv_root, r["version"] - 1)
    assert res2["version"] is not None
    got2 = sorted(
        r["id"] for r in read_delta_native(spark, dv_root).collect()
    )
    assert got2 == list(range(30)), "restore must un-delete the rows"
    ch2 = read_table_changes_cdf(
        spark, dv_root, res2["version"], res2["version"]
    )
    assert sorted(
        (r["_change_type"], r["id"]) for r in ch2.collect()
    ) == [("insert", i) for i in range(30) if i % 5 == 0], (
        "the restore's change set is exactly the un-masked rows"
    )


def test_cdf_derives_dv_attach_commits_from_mask_diff(spark, tmp_path):
    """A cdc-less DV-attach commit (same-path remove+add — a DV DELETE
    made while CDF was off, or a foreign writer's) derives its change
    set from the MASK DIFF (r8, was a refusal): deletes = newly masked
    positions only; already-masked rows never re-report. Unpaired
    DV-carrying removes derive their VISIBLE rows only."""
    from rtdl_spark.sources.delta_writer import delete_where_delta_dv

    root = str(tmp_path / "dvderive")
    df = spark.range(0, 20).select(
        "id", (F.col("id") % 2).cast("string").alias("p")
    )
    write_delta_native(
        spark, df, root, partition_by=["p"], checkpoint_interval=0
    )
    _, meta, _, current, _ = snapshot_actions(spark, root)
    with open(
        os.path.join(root, "_delta_log", f"{current + 1:020d}.json"), "w"
    ) as f:
        f.write(json.dumps({"commitInfo": {
            "timestamp": 2, "operation": "UPGRADE"}}) + "\n")
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": ["deletionVectors", "appendOnly",
                               "invariants"]}}) + "\n")
        f.write(json.dumps({"metaData": {
            **meta,
            "configuration": {"delta.enableDeletionVectors": "true"},
        }}) + "\n")
    # v2+v3: DV DELETEs while CDF is OFF — no cdc actions recorded
    r2 = delete_where_delta_dv(spark, root, "id IN (3, 5)")
    r3 = delete_where_delta_dv(spark, root, "id IN (5, 8)")  # overlap
    assert r2["cdc_files"] == 0 and r3["cdc_files"] == 0
    # enable CDF afterwards
    _, meta2, _, cur2, _ = snapshot_actions(spark, root)
    with open(
        os.path.join(root, "_delta_log", f"{cur2 + 1:020d}.json"), "w"
    ) as f:
        f.write(json.dumps({"commitInfo": {
            "timestamp": 4, "operation": "SET TBLPROPERTIES"}}) + "\n")
        f.write(json.dumps({"metaData": {
            **meta2,
            "configuration": {
                **(meta2.get("configuration") or {}),
                "delta.enableChangeDataFeed": "true",
            }}}) + "\n")

    # pre-enable commits refuse without the explicit opt-in
    with pytest.raises(ValueError, match="not 'true'"):
        read_table_changes_cdf(
            spark, root, r2["version"], r2["version"]
        )
    ch2 = read_table_changes_cdf(
        spark, root, r2["version"], r2["version"], allow_unrecorded=True
    )
    assert sorted(
        (r["_change_type"], r["id"]) for r in ch2.collect()
    ) == [("delete", 3), ("delete", 5)]
    # the OVERLAPPING second delete reports ONLY the newly masked row
    ch3 = read_table_changes_cdf(
        spark, root, r3["version"], r3["version"], allow_unrecorded=True
    )
    assert sorted(
        (r["_change_type"], r["id"]) for r in ch3.collect()
    ) == [("delete", 8)], "already-masked rows must never re-report"


def test_cdf_appends_still_work_and_plain_tables_untouched(
    spark, tmp_path
):
    """Appends to CDF tables need no cdc files (derivable); tables
    WITHOUT CDF emit no _change_data on DELETE/UPDATE."""
    root = _cdf_table(spark, tmp_path)
    v = write_delta_native(
        spark,
        spark.range(50, 52).select("id", F.lit("0").alias("p")),
        root,
        checkpoint_interval=0,
    )
    acts = [
        json.loads(line)
        for line in open(
            os.path.join(root, "_delta_log", f"{v:020d}.json")
        )
    ]
    assert not any("cdc" in a for a in acts)

    plain = str(tmp_path / "plain")
    write_delta_native(
        spark, spark.range(0, 10).select("id"), plain,
        checkpoint_interval=0,
    )
    res = delete_where_delta_native(spark, plain, "id = 1")
    assert res["cdc_files"] == 0
    assert not os.path.isdir(os.path.join(plain, "_change_data"))


def test_log_cleanup_reaps_orphaned_cdc_files(spark, tmp_path):
    """cleanup_delta_log_native is CDC's reclamation point (_change_data
    is hidden from vacuum's file index): when a commit's JSON is
    cleaned, its change-data files go with it; younger commits keep
    theirs and their CDF stays readable."""
    from rtdl_spark.sources.delta_writer import (
        cleanup_delta_log_native,
        write_checkpoint_native,
    )

    root = _cdf_table(spark, tmp_path)
    delete_where_delta_native(spark, root, "id = 2")   # v2: cdc files
    delete_where_delta_native(spark, root, "id = 4")   # v3: cdc files
    write_checkpoint_native(spark, root)               # checkpoint at v3
    def _n_cdc():
        return sum(
            len([f for f in files if f.endswith(".parquet")])
            for _, _, files in os.walk(os.path.join(root, "_change_data"))
        )

    n_cdc_before = _n_cdc()
    assert n_cdc_before >= 2

    victims = cleanup_delta_log_native(spark, root, retain_ms=0)
    # commits 0..2 cleaned; their cdc files reaped with them
    assert f"{2:020d}.json" in victims
    assert any(v.startswith("_change_data/") for v in victims)
    n_cdc_after = _n_cdc()
    assert n_cdc_after < n_cdc_before

    # v3 (the checkpointed tip) keeps its change data and stays readable
    ch = read_table_changes_cdf(spark, root, 3, 3)
    assert sorted((r["_change_type"], r["id"]) for r in ch.collect()) == [
        ("delete", 4)
    ]


@pytest.mark.parametrize("mode", ["name", "id"])
def test_cdf_on_column_mapped_table(spark, tmp_path, mode):
    """CM x CDF (r7, was refused by name): change files stage in the
    table's PHYSICAL layout (physical names + field ids; _change_type
    unmapped, like real Delta) and the CDF reader resolves them back to
    logical names in both modes — including physically-keyed partition
    values on the change rows."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from tests.test_delta_writer import _mk_cm_table

    root = _mk_cm_table(spark, tmp_path, mode)
    _, meta, _, current, _ = snapshot_actions(spark, root)
    with open(
        os.path.join(root, "_delta_log", f"{current + 1:020d}.json"), "w"
    ) as f:
        f.write(json.dumps({"commitInfo": {
            "timestamp": 2, "operation": "SET TBLPROPERTIES"}}) + "\n")
        f.write(json.dumps({"metaData": {
            **meta,
            "configuration": {
                **(meta.get("configuration") or {}),
                "delta.enableChangeDataFeed": "true",
            }}}) + "\n")

    inner = StructType([
        StructField("inner", StringType(), True),
        StructField("j", LongType(), True),
    ])
    frame = spark.createDataFrame(
        [(3, ("z", 30), "west"), (4, ("w", 40), "east")],
        StructType([
            StructField("id", LongType(), True),
            StructField("s", inner, True),
            StructField("p", StringType(), True),
        ]),
    )
    write_delta_native(spark, frame, root, checkpoint_interval=0)   # v2
    res = delete_where_delta_native(spark, root, "id = 2")          # v3
    assert res["cdc_files"] >= 1
    res2 = update_where_delta_native(                               # v4
        spark, root, "id = 3", {"id": "id + 100"}
    )
    assert res2["cdc_files"] >= 1

    ch = read_table_changes_cdf(spark, root, 2, 4)
    rows = sorted(
        (r["_commit_version"], r["_change_type"], r["id"], r["p"],
         r["s"]["inner"])
        for r in ch.collect()
    )
    assert rows == [
        (2, "insert", 3, "west", "z"),
        (2, "insert", 4, "east", "w"),
        (3, "delete", 2, "east", "y"),
        (4, "update_postimage", 103, "west", "z"),
        (4, "update_preimage", 3, "west", "z"),
    ]
    got = sorted(r["id"] for r in read_delta_native(spark, root).collect())
    assert got == [1, 3, 4] or got == [1, 103, 4] or sorted(got) == [1, 4, 103]
    assert sorted(got) == [1, 4, 103]


def test_overwrite_tombstones_preserve_dv_and_cdf_derives(spark, tmp_path):
    """Overwrite-mode remove tombstones on a DV-carrying table keep the
    deletionVector descriptor (ADVICE r8): reconciliation keys on
    (path, dvId), so a dvId-less remove may not cancel the DV add in a
    spec-strict reader — and the CDF derivation would over-report the
    DV-masked (already deleted) rows as deletes for the overwrite
    commit. With the descriptor preserved, the unpaired-DV-remove lane
    derives only the file's VISIBLE rows as deletes."""
    from rtdl_spark.sources.delta_writer import delete_where_delta_dv

    root = _dv_cdf_table(spark, tmp_path, name="dvow")
    delete_where_delta_dv(spark, root, "id % 5 = 0")  # masks 0,5,...,25

    new = spark.range(100, 103).select(
        "id", (F.col("id") % 3).cast("string").alias("p")
    )
    v = write_delta_native(
        spark, new, root, mode="overwrite", partition_by=["p"],
        checkpoint_interval=0,
    )

    # the tombstones for the DV-masked files carry the descriptor
    with open(
        os.path.join(root, "_delta_log", f"{v:020d}.json")
    ) as f:
        actions = [json.loads(line) for line in f if line.strip()]
    removes = [a["remove"] for a in actions if "remove" in a]
    assert removes, "overwrite must tombstone the replaced files"
    assert any(r.get("deletionVector") for r in removes), (
        "DV-masked files' tombstones must keep the deletionVector"
    )

    # CDF for the overwrite commit: deletes are exactly the rows that
    # were VISIBLE before (ids not divisible by 5), never the masked ones
    ch = read_table_changes_cdf(spark, root, v, v)
    deletes = sorted(
        r["id"] for r in ch.collect() if r["_change_type"] == "delete"
    )
    assert deletes == [i for i in range(30) if i % 5 != 0]
    inserts = sorted(
        r["id"] for r in ch.collect() if r["_change_type"] == "insert"
    )
    assert inserts == [100, 101, 102]
    # and the table itself reads back as only the overwrite frame
    assert sorted(
        r["id"] for r in read_delta_native(spark, root).collect()
    ) == [100, 101, 102]
