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

    # the creation commit (v0) derives as inserts of the initial load
    ch0 = read_table_changes_cdf(spark, root, 0, 0)
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
    """Ops whose change rows we cannot derive refuse CDF tables by
    name; a cleaned-up range refuses."""
    from rtdl_spark.sources.delta_writer import restore_delta_native

    root = _cdf_table(spark, tmp_path)
    with pytest.raises(ValueError, match="ChangeDataFeed"):
        restore_delta_native(spark, root, 0)

    with pytest.raises(ValueError, match="missing commit"):
        read_table_changes_cdf(spark, root, 0, 99)


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
