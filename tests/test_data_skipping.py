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


def test_merge_key_range_pruning(spark, tmp_path):
    """MERGE prunes its identify/insert-dedup scan to files whose key
    stats intersect the source key range (two-phase merge): narrow
    upserts touch only the matching range's files, disjoint-range
    sources insert everything without scanning any target file, and
    results always equal the unpruned semantics."""
    from rtdl_spark.sources.delta_writer import merge_into_delta_native

    root = str(tmp_path / "t")
    df = spark.range(0, 2000).select(
        "id", (F.col("id") * 2).alias("v")
    ).repartitionByRange(20, "id")
    write_delta_native(spark, df, root, checkpoint_interval=0)

    # narrow upsert: updates 2 keys, inserts 1 — only ~1 file rewritten
    upd = spark.createDataFrame(
        [(100, -1), (101, -2), (5000, 1)], "id long, v long"
    )
    res = merge_into_delta_native(spark, root, upd, on=["id"])
    assert res["files_rewritten"] <= 2
    got = read_delta_native(spark, root)
    assert got.count() == 2001
    assert got.filter("id = 100").collect()[0]["v"] == -1
    assert got.filter("id = 5000").collect()[0]["v"] == 1
    assert got.filter("id = 300").collect()[0]["v"] == 600

    # fully-disjoint source range: zero files rewritten, pure insert
    ins = spark.range(9000, 9010).select(
        "id", F.lit(0).cast("long").alias("v")
    )
    res2 = merge_into_delta_native(spark, root, ins, on=["id"])
    assert res2["files_rewritten"] == 0
    assert read_delta_native(spark, root).count() == 2011


def test_skipping_improves_after_clustering(spark, tmp_path):
    """The clustering ↔ skipping composition that matters at 100 TB:
    on randomly-laid-out files a selective predicate prunes nothing
    (every file's range spans the domain); after OPTIMIZE reclusters by
    the column, file ranges tighten and the same predicate prunes most
    of the table — stats are harvested from the rewritten files'
    footers automatically."""
    from rtdl_spark.sources.delta_writer import (
        optimize_delta_native,
        write_delta_native,
    )

    root = str(tmp_path / "t")
    df = spark.range(0, 16000).select(
        # hash-scatter v so every pre-cluster file spans the domain
        (F.hash(F.col("id")) % 16000).alias("v"), "id"
    ).repartition(8)
    write_delta_native(spark, df, root, cluster_by=["v"],
                       checkpoint_interval=0)
    before = data_skipping_report(spark, root, "v >= 14000")
    assert before["pruned"] == 0  # scattered layout: nothing provable

    optimize_delta_native(spark, root, target_file_bytes=1 << 14,
                          min_files=1)  # reclusters by the domain's v
    after = data_skipping_report(spark, root, "v >= 14000")
    assert after["total"] >= 4
    assert after["pruned"] >= after["total"] // 2, after
    got = read_delta_native(spark, root, where="v >= 14000")
    want = read_delta_native(spark, root).filter("v >= 14000")
    assert got.count() == want.count()


def test_in_list_and_like_prefix_pruning(spark, tmp_path):
    """IN-lists prune when every element misses a file's range; LIKE
    'prefix%' prunes via the standard prefix interval [prefix,
    prefix+1). Wildcards beyond the single trailing %, non-ASCII
    prefixes, and unusable IN elements conservatively keep."""
    root = str(tmp_path / "t")
    _range_table(spark, root, n=1000, files=10)
    full = read_delta_native(spark, root)

    rep = data_skipping_report(spark, root, "id IN (3, 5, 907)")
    assert rep["pruned"] >= 7
    got = read_delta_native(spark, root, where="id IN (3, 5, 907)")
    assert sorted(r["id"] for r in got.collect()) == [3, 5, 907]

    rep = data_skipping_report(spark, root, "s LIKE 'k09%'")
    assert rep["pruned"] >= 8
    got = read_delta_native(spark, root, where="s LIKE 'k09%'")
    want = full.filter("s LIKE 'k09%'")
    assert got.count() == want.count() == 100

    # conservative keeps: inner wildcard, non-ASCII, expression in IN
    for where in ("s LIKE 'k%9'", "s LIKE 'ké%'", "id IN (1, 2+3)"):
        rep = data_skipping_report(spark, root, where)
        assert rep["pruned"] == 0, where
        got = read_delta_native(spark, root, where=where)
        assert got.count() == full.filter(where).count(), where
