"""Data skipping (r9): write-side min/max/nullCount stats harvested
from parquet footers, read-side file pruning from add-action stats +
partitionValues (delta-spark's DataSkippingReader contract: pruning is
an I/O saver, the full predicate still filters the scanned rows)."""

from __future__ import annotations

import datetime
import json

import pytest
from pyspark.sql import functions as F

from rtdl_spark.sources.delta_reader import (
    data_skipping_report,
    read_delta_native,
    snapshot_actions,
)
from rtdl_spark.sources.delta_writer import write_delta_native


def _range_table(spark, root, n=1000, files=10):
    df = spark.range(0, n).select(
        "id",
        (F.col("id") * 2).alias("v"),
        F.concat(F.lit("k"), F.format_string("%04d", "id")).alias("s"),
        F.date_add(F.lit("2024-01-01").cast("date"),
                   (F.col("id") % 300).cast("int")).alias("d"),
    ).repartitionByRange(files, "id")
    write_delta_native(spark, df, root, checkpoint_interval=0)
    return df


def test_writes_carry_footer_stats(spark, tmp_path):
    root = str(tmp_path / "t")
    _range_table(spark, root)
    _, _, active, _, _ = snapshot_actions(spark, root)
    for a in active.values():
        st = json.loads(a["stats"])
        assert st["numRecords"] > 0
        assert set(st["minValues"]) == {"id", "v", "s", "d"}
        assert st["minValues"]["id"] <= st["maxValues"]["id"]
        assert st["nullCount"]["id"] == 0
        assert st["minValues"]["s"].startswith("k")
        datetime.date.fromisoformat(st["minValues"]["d"])


def test_pruning_matches_full_filter_and_skips_files(spark, tmp_path):
    """Selective predicates over range-partitioned files prune most of
    the table; every supported operator returns exactly what a full
    scan + filter returns."""
    root = str(tmp_path / "t")
    _range_table(spark, root, n=1000, files=10)
    full = read_delta_native(spark, root)
    cases = [
        ("id = 437", None),
        ("id < 99", None),
        ("id >= 950", None),
        ("v <= 10", None),              # derived column, still ranged
        ("s = 'k0123'", None),
        ("d = DATE '2024-01-05'", "id % 300 = 4"),
        ("id > 100 AND id <= 110", None),
        ("id != 5", None),              # prunes nothing, still correct
    ]
    for where, equiv in cases:
        rep = data_skipping_report(spark, root, where)
        got = sorted(
            r["id"]
            for r in read_delta_native(spark, root, where=where).collect()
        )
        want = sorted(
            r["id"] for r in full.filter(equiv or where).collect()
        )
        assert got == want, where
        assert rep["total"] == rep["kept"] + rep["pruned"]
    # the selective ones actually skipped I/O
    assert data_skipping_report(spark, root, "id = 437")["pruned"] >= 8
    assert data_skipping_report(spark, root, "id < 99")["pruned"] >= 8
    assert data_skipping_report(
        spark, root, "s = 'k0123'"
    )["pruned"] >= 8
    assert data_skipping_report(
        spark, root, "id > 100 AND id <= 110"
    )["pruned"] >= 8
    # impossible predicate prunes everything and returns empty
    assert data_skipping_report(spark, root, "id = -1")["kept"] == 0
    assert read_delta_native(spark, root, where="id = -1").count() == 0


def test_pruning_is_conservative(spark, tmp_path):
    """ORs, functions, IS NULL, unknown columns and non-ASCII literals
    disable pruning (keep everything) but never break results."""
    root = str(tmp_path / "t")
    _range_table(spark, root, n=200, files=4)
    full = read_delta_native(spark, root)
    for where in (
        "id = 5 OR id = 199",
        "abs(id - 7) < 2",
        "s IS NOT NULL AND id < 10",
        "s = 'k00é'",
    ):
        rep = data_skipping_report(spark, root, where)
        got = read_delta_native(spark, root, where=where)
        want = full.filter(where)
        assert sorted(r["id"] for r in got.collect()) == sorted(
            r["id"] for r in want.collect()
        ), where
    # a top-level OR keeps every file
    assert data_skipping_report(
        spark, root, "id = 5 OR id = 199"
    )["pruned"] == 0
    # ... but an AND of a prunable conjunct with an opaque one prunes
    rep = data_skipping_report(spark, root, "id < 50 AND abs(v) >= 0")
    assert rep["pruned"] >= 2


def test_partition_and_null_pruning(spark, tmp_path):
    """Partition values prune without any stats; an all-null column
    proves comparison predicates false for the whole file."""
    root = str(tmp_path / "t")
    df = spark.range(0, 100).select(
        "id",
        (F.col("id") % 4).cast("string").alias("p"),
        F.when(F.col("id") < 50, F.col("id")).alias("maybe"),
    ).repartitionByRange(4, "id")
    write_delta_native(spark, df, root, partition_by=["p"],
                       checkpoint_interval=0)
    rep = data_skipping_report(spark, root, "p = '2'")
    assert rep["pruned"] >= rep["total"] // 2
    got = read_delta_native(spark, root, where="p = '2'")
    assert got.count() == 25
    # maybe is null for id>=50: files holding only id>=50 rows prune
    rep2 = data_skipping_report(spark, root, "maybe >= 0")
    got2 = read_delta_native(spark, root, where="maybe >= 0")
    assert got2.count() == 50
    assert rep2["total"] == rep2["kept"] + rep2["pruned"]


def test_pruning_on_column_mapped_table(spark, tmp_path):
    """CM tables: footer/statistics keys are PHYSICAL names; the
    pruner maps logical predicate columns through the mapping."""
    root = str(tmp_path / "t")
    df = spark.range(0, 400).select(
        "id", (F.col("id") * 3).alias("v")
    ).repartitionByRange(4, "id")
    write_delta_native(spark, df, root, column_mapping="name",
                       checkpoint_interval=0)
    _, _, active, _, _ = snapshot_actions(spark, root)
    a = next(iter(active.values()))
    st = json.loads(a["stats"])
    assert all(k.startswith("col-") for k in st["minValues"])
    rep = data_skipping_report(spark, root, "id < 100")
    assert rep["pruned"] >= 2
    got = read_delta_native(spark, root, where="id < 100")
    assert got.count() == 100


def test_dml_identify_scans_prune(spark, tmp_path):
    """DELETE/UPDATE WHERE and the DV paths use the same stats pruning
    for their identify scans: a predicate over a ranged column touches
    only the files that could hold matches — and a predicate provably
    matching NOTHING is a no-op without a single scan task."""
    from rtdl_spark.sources.delta_writer import (
        delete_where_delta_native,
        update_where_delta_native,
    )

    root = str(tmp_path / "t")
    _range_table(spark, root, n=1000, files=10)
    # provably-empty predicate: no-op, no version committed
    res = delete_where_delta_native(spark, root, "id > 10000")
    assert res["version"] is None
    # ranged delete touches only the matching range's files
    res = delete_where_delta_native(spark, root, "id < 100")
    assert 1 <= res["files_rewritten"] <= 2
    assert read_delta_native(spark, root).count() == 900
    res = update_where_delta_native(
        spark, root, "id >= 950", {"v": "v + 1"}
    )
    assert 1 <= res["files_rewritten"] <= 2
    got = read_delta_native(spark, root)
    assert got.filter("id >= 950").agg(
        F.sum(F.col("v") - F.col("id") * 2)
    ).collect()[0][0] == 50
