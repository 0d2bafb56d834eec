"""Streaming SOURCE over native Delta tables
(sources/delta_stream_source.py): the commit log is the offset axis —
micro-batches are exactly the files added by new commits, OPTIMIZE's
dataChange=false rewrites are never re-emitted, schema evolution
null-fills, and a cleaned-up tail fails loudly."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from rtdl_spark.sources.delta_stream_source import DeltaStreamDataSource
from rtdl_spark.sources.delta_writer import (
    optimize_delta_native,
    write_delta_native,
)


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(DeltaStreamDataSource)
    return spark


def _run_once(spark, table, out, ckpt):
    q = (
        spark.readStream.format("rtdl_delta_stream")
        .option("path", table)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stream_source_tails_commits_and_skips_optimize(
    registered, tmp_path
):
    """Initial snapshot, then ONLY new commits on restart; an OPTIMIZE
    between runs re-emits nothing (dataChange=false)."""
    spark = registered
    table, out, ckpt = (
        str(tmp_path / "t"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    df = spark.range(0, 12).select(
        "id", (F.col("id") % 3).cast("int").alias("p")
    )
    write_delta_native(
        spark, df, table, partition_by=["p"], checkpoint_interval=0
    )
    _run_once(spark, table, out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == 12
    assert dict(got.dtypes)["p"] == "int"  # partition col injected, typed
    assert got.filter("p = 2").count() == 4

    write_delta_native(
        spark,
        spark.range(12, 17).select(
            "id", (F.col("id") % 3).cast("int").alias("p")
        ),
        table,
        checkpoint_interval=0,
    )
    optimize_delta_native(spark, table, target_file_bytes=1 << 30)
    _run_once(spark, table, out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == 17  # 5 new rows, ZERO re-emitted by optimize
    assert got.distinct().count() == 17
    assert sorted(r["id"] for r in got.collect()) == list(range(17))

    # nothing new -> the next run emits nothing
    _run_once(spark, table, out, ckpt)
    assert spark.read.parquet(out).count() == 17


def test_stream_source_schema_evolution_null_fills(registered, tmp_path):
    """Files written before an evolved column appeared stream with that
    column null-filled (the reader plans against the LATEST schema)."""
    spark = registered
    table = str(tmp_path / "t2")
    write_delta_native(
        spark, spark.range(0, 4).select("id"), table, checkpoint_interval=0
    )
    write_delta_native(
        spark,
        spark.range(4, 6).select("id", F.lit(1.5).alias("score")),
        table,
        merge_schema=True,
        checkpoint_interval=0,
    )
    out, ckpt = str(tmp_path / "out2"), str(tmp_path / "ckpt2")
    _run_once(spark, table, out, ckpt)
    got = spark.read.parquet(out)
    assert set(got.columns) == {"id", "score"}
    assert got.filter("score IS NULL").count() == 4
    assert got.filter("score = 1.5").count() == 2


def test_stream_source_starting_version(registered, tmp_path):
    """startingVersion=N begins AT commit N; 'latest' streams only
    commits after the current tip — the regime a VACUUMed table needs,
    since its early files are gone (same option as delta-spark)."""
    spark = registered
    table = str(tmp_path / "t4")
    for i in range(3):
        write_delta_native(
            spark,
            spark.range(i * 10, i * 10 + 10).select("id"),
            table,
            checkpoint_interval=0,
        )

    out1, ck1 = str(tmp_path / "o1"), str(tmp_path / "c1")
    q = (
        spark.readStream.format("rtdl_delta_stream")
        .option("path", table)
        .option("startingVersion", "2")
        .load()
        .writeStream.format("parquet")
        .option("path", out1)
        .option("checkpointLocation", ck1)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["id"] for r in spark.read.parquet(out1).collect())
    assert got == list(range(20, 30))  # only commit 2

    # 'latest': nothing until a NEW commit lands
    out2, ck2 = str(tmp_path / "o2"), str(tmp_path / "c2")

    def run_latest():
        q = (
            spark.readStream.format("rtdl_delta_stream")
            .option("path", table)
            .option("startingVersion", "latest")
            .load()
            .writeStream.format("parquet")
            .option("path", out2)
            .option("checkpointLocation", ck2)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_latest()
    write_delta_native(
        spark, spark.range(100, 103).select("id"), table,
        checkpoint_interval=0,
    )
    run_latest()
    got = sorted(r["id"] for r in spark.read.parquet(out2).collect())
    assert got == [100, 101, 102]


def test_stream_source_missing_commit_fails_loudly(registered, tmp_path):
    """A cleaned-up tail inside the replay range is an error, never a
    silent gap."""
    spark = registered
    table = str(tmp_path / "t3")
    for i in range(3):
        write_delta_native(
            spark,
            spark.range(i * 2, i * 2 + 2).select("id"),
            table,
            checkpoint_interval=0,
        )
    os.remove(os.path.join(table, "_delta_log", f"{1:020d}.json"))
    out, ckpt = str(tmp_path / "out3"), str(tmp_path / "ckpt3")
    with pytest.raises(Exception, match="cleaned up|missing"):
        _run_once(spark, table, out, ckpt)


def test_max_files_per_trigger_bounds_each_batch(spark, tmp_path):
    """maxFilesPerTrigger (the r5 verdict item): each latestOffset
    advances at most N dataChange add files; a commit bigger than N is
    still admitted whole (at-least-one); dataChange=false rewrites are
    free to cross. Driven against the reader directly so the per-batch
    offset sequence is pinned deterministically."""
    from rtdl_spark.sources.delta_stream_source import (
        _DeltaStreamReader,
        _latest_schema,
    )

    table = str(tmp_path / "mft")
    # commit 0: 3 files, commit 1: 2 files, commit 2: 2 files, commit 3: 1
    for lo, hi, nfiles in ((0, 30, 3), (30, 50, 2), (50, 70, 2), (70, 80, 1)):
        write_delta_native(
            spark,
            spark.range(lo, hi).select("id").repartition(nfiles),
            table,
        )

    opts = {"path": table, "maxFilesPerTrigger": "3"}
    sch = _latest_schema(table, 10)
    r = _DeltaStreamReader(sch, opts)
    start = r.initialOffset()
    assert start == {"version": -1}

    ends, sizes = [], []
    prev = start
    for _ in range(4):
        end = r.latestOffset()
        if end == prev:
            break
        parts = [
            p for p in r.partitions(prev, end) if p.path
        ]
        ends.append(end["version"])
        sizes.append(len(parts))
        prev = end
    # batch 1: commit 0 alone (3 files = limit); batch 2: commit 1 only
    # (adding commit 2 would make 4 > 3); batch 3: commits 2+3 (2+1 = 3)
    assert ends == [0, 1, 3]
    assert sizes == [3, 2, 3]

    # at-least-one: limit 1 still admits the 3-file commit 0 whole
    r1 = _DeltaStreamReader(sch, {"path": table, "maxFilesPerTrigger": "1"})
    prev = r1.initialOffset()
    seq = []
    for _ in range(6):
        end = r1.latestOffset()
        if end == prev:
            break
        seq.append(end["version"])
        prev = end
    assert seq == [0, 1, 2, 3]

    # unbounded reader: one batch straight to the tip (unchanged default)
    r2 = _DeltaStreamReader(sch, {"path": table})
    r2.initialOffset()
    assert r2.latestOffset() == {"version": 3}


def test_max_files_per_trigger_restart_recovers_position(spark, tmp_path):
    """A fresh reader (restart) whose first engine call is partitions()
    (the offset-log replay path) anchors the position there and bounded
    advance resumes FORWARD from it — never from -1."""
    from rtdl_spark.sources.delta_stream_source import (
        _DeltaStreamReader,
        _latest_schema,
    )

    table = str(tmp_path / "mft_restart")
    for lo in range(0, 50, 10):
        write_delta_native(
            spark,
            spark.range(lo, lo + 10).select("id").repartition(2),
            table,
        )  # 5 commits x 2 files

    r = _DeltaStreamReader(_latest_schema(table, 10), {"path": table, "maxFilesPerTrigger": "2"})
    # simulate restart: engine replays the last planned range (2, 3]
    # from its offset log without calling initialOffset first
    parts = [p for p in r.partitions({"version": 2}, {"version": 3}) if p.path]
    assert len(parts) == 2
    # bounded advance resumes from version 3, not from -1
    assert r.latestOffset() == {"version": 4}


def test_max_files_per_trigger_available_now_drains_across_runs(
    spark, tmp_path
):
    """Measured trigger semantics, pinned: with maxFilesPerTrigger,
    Trigger.AvailableNow captures latestOffset once, so each RUN is one
    batch. A brand-new query's FIRST batch is unbounded (the Python
    runner asks latestOffset before any anchoring call, and a bounded
    unanchored answer could regress behind a crash-restart's
    checkpointed position — correctness wins; see latestOffset); every
    graceful restart re-anchors via the replayed trailing offset entry,
    so later runs ARE bounded and drain the backlog exactly once."""
    from rtdl_spark.sources.delta_stream_source import DeltaStreamDataSource

    table = str(tmp_path / "mft_an")
    write_delta_native(
        spark, spark.range(0, 10).select("id").repartition(2), table
    )  # commit 0: 2 files
    spark.dataSource.register(DeltaStreamDataSource)
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            spark.readStream.format("rtdl_delta_stream")
            .option("path", table)
            .option("maxFilesPerTrigger", "4")
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return spark.read.parquet(sink).count()

    assert run_once() == 10  # fresh: one (here small) snapshot batch

    # backlog lands while the query is down: 5 commits x 2 files
    for lo in range(10, 60, 10):
        write_delta_native(
            spark,
            spark.range(lo, lo + 10).select("id").repartition(2),
            table,
        )
    counts = []
    for _run in range(5):
        counts.append(run_once())
        if counts[-1] == 60:
            break
    # anchored restarts advance ≤4 files (= 2 commits = 20 rows) per run
    assert counts == [30, 50, 60]
    got = sorted(r["id"] for r in spark.read.parquet(sink).collect())
    assert got == list(range(60)), "drain must be exactly-once"


def test_stream_source_reads_column_mapped_tables(spark, tmp_path):
    """The streaming source resolves column mapping in its Arrow lane:
    name-mode physical columns (nested struct children realigned
    positionally) and physically-keyed partition values come out under
    logical names — the same hand-built spec fixture the batch reader
    test uses, streamed end-to-end."""
    import json as _json
    import os

    from rtdl_spark.sources.delta_stream_source import DeltaStreamDataSource

    root = str(tmp_path / "cmstream")
    os.makedirs(os.path.join(root, "_delta_log"))
    pdf = spark.createDataFrame(
        [(1, ("x", 10)), (2, ("y", 20))],
        "`col-aaa` bigint, `col-sss` struct<`col-inn`:string, `col-jjj`:bigint>",
    )
    pdf.coalesce(1).write.parquet(os.path.join(root, "d"))
    part = next(
        f
        for f in os.listdir(os.path.join(root, "d"))
        if f.endswith(".parquet")
    )
    schema = {
        "type": "struct",
        "fields": [
            {
                "name": "id", "type": "long", "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 1,
                    "delta.columnMapping.physicalName": "col-aaa",
                },
            },
            {
                "name": "s",
                "type": {
                    "type": "struct",
                    "fields": [
                        {"name": "inner", "type": "string", "nullable": True,
                         "metadata": {
                             "delta.columnMapping.id": 3,
                             "delta.columnMapping.physicalName": "col-inn"}},
                        {"name": "j", "type": "long", "nullable": True,
                         "metadata": {
                             "delta.columnMapping.id": 4,
                             "delta.columnMapping.physicalName": "col-jjj"}},
                    ],
                },
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 2,
                    "delta.columnMapping.physicalName": "col-sss",
                },
            },
            {
                "name": "p", "type": "string", "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 5,
                    "delta.columnMapping.physicalName": "col-ppp",
                },
            },
        ],
    }
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as f:
        f.write(_json.dumps({"commitInfo": {"timestamp": 1, "operation": "WRITE"}}) + "\n")
        f.write(_json.dumps({"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}}) + "\n")
        f.write(_json.dumps({"metaData": {
            "id": "cms", "format": {"provider": "parquet", "options": {}},
            "schemaString": _json.dumps(schema),
            "partitionColumns": ["p"],
            "configuration": {"delta.columnMapping.mode": "name",
                              "delta.columnMapping.maxColumnId": "5"},
            "createdTime": 1}}) + "\n")
        f.write(_json.dumps({"add": {
            "path": "d/" + part,
            "partitionValues": {"col-ppp": "east"},
            "size": os.path.getsize(os.path.join(root, "d", part)),
            "modificationTime": 1, "dataChange": True}}) + "\n")

    spark.dataSource.register(DeltaStreamDataSource)
    sink = str(tmp_path / "sink")
    q = (
        spark.readStream.format("rtdl_delta_stream")
        .option("path", root)
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.read.parquet(sink)
    assert got.columns == ["id", "s", "p"]
    rows = sorted(
        (r["id"], r["s"]["inner"], r["s"]["j"], r["p"])
        for r in got.collect()
    )
    assert rows == [(1, "x", 10, "east"), (2, "y", 20, "east")]


def test_stream_source_reads_id_mode_column_mapping(spark, tmp_path):
    """id-mode CM through the STREAM: the parquet column names are
    garbage; the Arrow lane maps delta.columnMapping.id to the file's
    PARQUET:field_id metadata and still emits logical columns."""
    import json as _json
    import os

    from pyspark.sql.types import LongType, StringType, StructField, StructType
    from rtdl_spark.sources.delta_stream_source import DeltaStreamDataSource

    root = str(tmp_path / "cmidstream")
    os.makedirs(os.path.join(root, "_delta_log"))
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    try:
        w_schema = StructType(
            [
                StructField("junk-a", LongType(), True, {"parquet.field.id": 1}),
                StructField("junk-b", StringType(), True, {"parquet.field.id": 2}),
            ]
        )
        pdf = spark.createDataFrame([(5, "u"), (6, "v")], w_schema)
        pdf.coalesce(1).write.parquet(os.path.join(root, "d"))
    finally:
        spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "false")
    part = next(
        f for f in os.listdir(os.path.join(root, "d"))
        if f.endswith(".parquet")
    )
    schema = {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "junk-a"}},
            {"name": "tag", "type": "string", "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": "junk-b"}},
        ],
    }
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as f:
        f.write(_json.dumps({"commitInfo": {"timestamp": 1, "operation": "WRITE"}}) + "\n")
        f.write(_json.dumps({"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}}) + "\n")
        f.write(_json.dumps({"metaData": {
            "id": "cmids", "format": {"provider": "parquet", "options": {}},
            "schemaString": _json.dumps(schema), "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "id",
                              "delta.columnMapping.maxColumnId": "2"},
            "createdTime": 1}}) + "\n")
        f.write(_json.dumps({"add": {
            "path": "d/" + part, "partitionValues": {},
            "size": os.path.getsize(os.path.join(root, "d", part)),
            "modificationTime": 1, "dataChange": True}}) + "\n")

    spark.dataSource.register(DeltaStreamDataSource)
    sink = str(tmp_path / "sink")
    q = (
        spark.readStream.format("rtdl_delta_stream")
        .option("path", root)
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.read.parquet(sink)
    assert got.columns == ["id", "tag"]
    assert sorted((r["id"], r["tag"]) for r in got.collect()) == [
        (5, "u"), (6, "v"),
    ]


def test_latest_offset_first_restart_never_regresses(spark, tmp_path):
    """r6 ADVICE: a restarted reader whose last batch was FULLY
    committed can be asked latestOffset() before any anchoring call
    (initialOffset / partitions / commit). Bounding from initialOffset
    would answer BEHIND the checkpointed position — Spark writes that
    regressed offset into its offset log and uses it as the NEXT
    batch's start, replaying already-delivered commits. The first
    answer with an unknown position must therefore be the UNBOUNDED
    tip (one catch-up batch, never a regression); bounding resumes
    once the position is anchored."""
    from rtdl_spark.sources.delta_stream_source import (
        _DeltaStreamReader,
        _latest_schema,
    )

    table = str(tmp_path / "mft_lof")
    for lo in range(0, 50, 10):
        write_delta_native(
            spark,
            spark.range(lo, lo + 10).select("id").repartition(2),
            table,
        )  # 5 commits (versions 0..4) x 2 files

    # simulated prior run: checkpointed position is version 3
    sch = _latest_schema(table, 10)
    r = _DeltaStreamReader(sch, {"path": table, "maxFilesPerTrigger": "2"})
    off = r.latestOffset()  # latestOffset()-FIRST path
    assert off == {"version": 4}, (
        "unknown position must answer the unbounded tip, not a bounded "
        "offset from -1 (which would regress behind the checkpoint)"
    )
    # the engine then plans (3, 4] from its own offset log; subsequent
    # answers are bounded and never move backward
    parts = [p for p in r.partitions({"version": 3}, off) if p.path]
    assert len(parts) == 2
    assert r.latestOffset() == {"version": 4}

    # startingVersion="latest" with an unknown position also answers
    # the tip (not beyond), still no regression
    r2 = _DeltaStreamReader(
        sch,
        {"path": table, "maxFilesPerTrigger": "1",
         "startingVersion": "latest"},
    )
    assert r2.latestOffset() == {"version": 4}


def test_stream_cm_nested_struct_resolved_by_physical_name(
    registered, tmp_path
):
    """r6 ADVICE: under name-mode CM the file's struct children may be
    REORDERED or DROPPED relative to the logical schema (that is what
    DROP/RENAME COLUMN leaves behind) — positional alignment would
    silently attribute one child's values to another. The Arrow lane
    must match nested children by PHYSICAL NAME: reordered children
    land under the right logical names, a child the file lacks
    null-fills, and a file child the schema dropped is ignored."""
    spark = registered
    root = str(tmp_path / "cmnest")
    os.makedirs(os.path.join(root, "_delta_log"))
    # file struct children in REVERSE order vs the logical schema, plus
    # a dropped child `col-old` the logical schema no longer has; the
    # logical schema also has a NEW child (col-kk) the file predates
    pdf = spark.createDataFrame(
        [(1, (10, "x", 7)), (2, (20, "y", 8))],
        "`col-aaa` bigint, `col-sss` struct<`col-jjj`:bigint, "
        "`col-inn`:string, `col-old`:bigint>",
    )
    pdf.coalesce(1).write.parquet(os.path.join(root, "d"))
    part = next(
        f for f in os.listdir(os.path.join(root, "d"))
        if f.endswith(".parquet")
    )
    schema = {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "col-aaa"}},
            {"name": "s",
             "type": {"type": "struct", "fields": [
                 {"name": "inner", "type": "string", "nullable": True,
                  "metadata": {"delta.columnMapping.id": 3,
                               "delta.columnMapping.physicalName": "col-inn"}},
                 {"name": "j", "type": "long", "nullable": True,
                  "metadata": {"delta.columnMapping.id": 4,
                               "delta.columnMapping.physicalName": "col-jjj"}},
                 {"name": "k", "type": "long", "nullable": True,
                  "metadata": {"delta.columnMapping.id": 6,
                               "delta.columnMapping.physicalName": "col-kk"}},
             ]},
             "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": "col-sss"}},
        ],
    }
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as f:
        f.write(json.dumps({"commitInfo": {"timestamp": 1, "operation": "WRITE"}}) + "\n")
        f.write(json.dumps({"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}}) + "\n")
        f.write(json.dumps({"metaData": {
            "id": "cmn", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema), "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "name",
                              "delta.columnMapping.maxColumnId": "6"},
            "createdTime": 1}}) + "\n")
        f.write(json.dumps({"add": {
            "path": "d/" + part, "partitionValues": {},
            "size": os.path.getsize(os.path.join(root, "d", part)),
            "modificationTime": 1, "dataChange": True}}) + "\n")

    sink = str(tmp_path / "sink")
    _run_once(spark, root, sink, str(tmp_path / "ckpt"))
    got = spark.read.parquet(sink)
    assert got.columns == ["id", "s"]
    rows = sorted(
        (r["id"], r["s"]["inner"], r["s"]["j"], r["s"]["k"])
        for r in got.collect()
    )
    assert rows == [(1, "x", 10, None), (2, "y", 20, None)], (
        "nested children must resolve by physical name — positional "
        "alignment would put col-jjj's longs under `inner`"
    )


def test_stream_cm_list_and_map_of_struct(registered, tmp_path):
    """list-of-struct and map-of-struct under name-mode CM stream
    correctly (the r6 refusal is lifted): element/value struct children
    resolve by physical name at every level, list/map offsets and
    null slots survive the realignment."""
    spark = registered
    root = str(tmp_path / "cmlist")
    os.makedirs(os.path.join(root, "_delta_log"))
    pdf = spark.createDataFrame(
        [
            (1, [(10, "a"), (11, "b")], {"k1": (100,)}),
            (2, None, None),
            (3, [], {}),
            (4, [(40, "d")], {"k4": (400,), "k5": (500,)}),
        ],
        "`col-aaa` bigint, "
        "`col-lst` array<struct<`col-pp`:bigint, `col-qq`:string>>, "
        "`col-map` map<string, struct<`col-vv`:bigint>>",
    )
    pdf.coalesce(1).write.parquet(os.path.join(root, "d"))
    part = next(
        f for f in os.listdir(os.path.join(root, "d"))
        if f.endswith(".parquet")
    )
    schema = {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "col-aaa"}},
            {"name": "lst",
             "type": {"type": "array", "containsNull": True,
                      "elementType": {"type": "struct", "fields": [
                          # logical order REVERSED vs the file
                          {"name": "q", "type": "string", "nullable": True,
                           "metadata": {"delta.columnMapping.id": 4,
                                        "delta.columnMapping.physicalName": "col-qq"}},
                          {"name": "p", "type": "long", "nullable": True,
                           "metadata": {"delta.columnMapping.id": 3,
                                        "delta.columnMapping.physicalName": "col-pp"}},
                      ]}},
             "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": "col-lst"}},
            {"name": "m",
             "type": {"type": "map", "keyType": "string",
                      "valueContainsNull": True,
                      "valueType": {"type": "struct", "fields": [
                          {"name": "v", "type": "long", "nullable": True,
                           "metadata": {"delta.columnMapping.id": 6,
                                        "delta.columnMapping.physicalName": "col-vv"}},
                      ]}},
             "nullable": True,
             "metadata": {"delta.columnMapping.id": 5,
                          "delta.columnMapping.physicalName": "col-map"}},
        ],
    }
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as f:
        f.write(json.dumps({"commitInfo": {"timestamp": 1, "operation": "WRITE"}}) + "\n")
        f.write(json.dumps({"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}}) + "\n")
        f.write(json.dumps({"metaData": {
            "id": "cml", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema), "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "name",
                              "delta.columnMapping.maxColumnId": "6"},
            "createdTime": 1}}) + "\n")
        f.write(json.dumps({"add": {
            "path": "d/" + part, "partitionValues": {},
            "size": os.path.getsize(os.path.join(root, "d", part)),
            "modificationTime": 1, "dataChange": True}}) + "\n")

    sink = str(tmp_path / "sink")
    _run_once(spark, root, sink, str(tmp_path / "ckpt"))
    got = spark.read.parquet(sink)
    assert got.columns == ["id", "lst", "m"]
    by_id = {r["id"]: r for r in got.collect()}
    r1 = by_id[1]
    assert [(e["q"], e["p"]) for e in r1["lst"]] == [("a", 10), ("b", 11)]
    assert r1["m"]["k1"]["v"] == 100
    assert by_id[2]["lst"] is None and by_id[2]["m"] is None
    assert by_id[3]["lst"] == [] and dict(by_id[3]["m"]) == {}
    r4 = by_id[4]
    assert [(e["q"], e["p"]) for e in r4["lst"]] == [("d", 40)]
    assert sorted((k, v["v"]) for k, v in r4["m"].items()) == [
        ("k4", 400), ("k5", 500),
    ]


def test_stream_cm_id_mode_nested_field_ids(registered, tmp_path):
    """id-mode CM with NESTED struct children: parquet names are
    garbage at every level; the Arrow lane matches nested children by
    PARQUET:field_id against delta.columnMapping.id."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    spark = registered
    root = str(tmp_path / "cmidnest")
    os.makedirs(os.path.join(root, "_delta_log"))
    os.makedirs(os.path.join(root, "d"))
    fschema = pa.schema([
        pa.field("junk-a", pa.int64(),
                 metadata={b"PARQUET:field_id": b"1"}),
        pa.field("junk-s", pa.struct([
            # file order reversed vs logical; ids are the truth
            pa.field("junk-j", pa.int64(),
                     metadata={b"PARQUET:field_id": b"4"}),
            pa.field("junk-i", pa.string(),
                     metadata={b"PARQUET:field_id": b"3"}),
        ]), metadata={b"PARQUET:field_id": b"2"}),
    ])
    tab = pa.table(
        {
            "junk-a": pa.array([1, 2]),
            "junk-s": pa.array(
                [{"junk-j": 10, "junk-i": "x"},
                 {"junk-j": 20, "junk-i": "y"}],
                type=fschema.field("junk-s").type,
            ),
        },
        schema=fschema,
    )
    pq.write_table(tab, os.path.join(root, "d", "f.parquet"))
    schema = {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "junk-a"}},
            {"name": "s",
             "type": {"type": "struct", "fields": [
                 {"name": "inner", "type": "string", "nullable": True,
                  "metadata": {"delta.columnMapping.id": 3,
                               "delta.columnMapping.physicalName": "junk-i"}},
                 {"name": "j", "type": "long", "nullable": True,
                  "metadata": {"delta.columnMapping.id": 4,
                               "delta.columnMapping.physicalName": "junk-j"}},
             ]},
             "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": "junk-s"}},
        ],
    }
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as f:
        f.write(json.dumps({"commitInfo": {"timestamp": 1, "operation": "WRITE"}}) + "\n")
        f.write(json.dumps({"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}}) + "\n")
        f.write(json.dumps({"metaData": {
            "id": "cmidn", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema), "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "id",
                              "delta.columnMapping.maxColumnId": "4"},
            "createdTime": 1}}) + "\n")
        f.write(json.dumps({"add": {
            "path": "d/f.parquet", "partitionValues": {},
            "size": os.path.getsize(os.path.join(root, "d", "f.parquet")),
            "modificationTime": 1, "dataChange": True}}) + "\n")

    sink = str(tmp_path / "sink")
    _run_once(spark, root, sink, str(tmp_path / "ckpt"))
    got = spark.read.parquet(sink)
    rows = sorted(
        (r["id"], r["s"]["inner"], r["s"]["j"]) for r in got.collect()
    )
    assert rows == [(1, "x", 10), (2, "y", 20)]


def test_change_commits_fail_skip_or_reemit(spark, tmp_path):
    """delta-spark's change-commit posture, mirrored: a commit that
    REMOVES data (DELETE rewrite) fails the stream BY DEFAULT (already-
    emitted rows cannot be retracted); skipChangeCommits drops the
    commit entirely; ignoreChanges re-emits its rewritten files
    (documented at-least-once duplicates). OPTIMIZE (dataChange=false
    removes) stays transparent under the default."""
    from rtdl_spark.sources.delta_stream_source import (
        _DeltaStreamReader,
        _latest_schema,
    )
    from rtdl_spark.sources.delta_writer import delete_where_delta_native

    table = str(tmp_path / "chg")
    write_delta_native(
        spark, spark.range(0, 10).select("id").coalesce(1), table,
        checkpoint_interval=0,
    )
    write_delta_native(
        spark, spark.range(10, 20).select("id").coalesce(1), table,
        checkpoint_interval=0,
    )
    optimize_delta_native(spark, table, target_file_bytes=1 << 30)  # v2
    delete_where_delta_native(spark, table, "id % 2 = 0")           # v3

    sch = _latest_schema(table, 10)

    # default: the OPTIMIZE commit passes silently, the DELETE raises
    r = _DeltaStreamReader(sch, {"path": table})
    parts = [p for p in r.partitions({"version": 1}, {"version": 2}) if p.path]
    assert parts == []  # dataChange=false rewrite: nothing re-emitted
    with pytest.raises(ValueError, match="changes existing data"):
        r.partitions({"version": 2}, {"version": 3})

    # skipChangeCommits: the DELETE commit is dropped entirely
    r2 = _DeltaStreamReader(
        sch, {"path": table, "skipChangeCommits": "true"}
    )
    parts = [p for p in r2.partitions({"version": 2}, {"version": 3}) if p.path]
    assert parts == []

    # ignoreChanges: the rewritten file IS re-emitted (duplicates are
    # the caller's explicit choice)
    r3 = _DeltaStreamReader(sch, {"path": table, "ignoreChanges": "true"})
    parts = [p for p in r3.partitions({"version": 2}, {"version": 3}) if p.path]
    assert len(parts) == 1


def test_ignore_deletes_tolerates_delete_only_commits(spark, tmp_path):
    """ignoreDeletes (delta-spark parity): a DELETE-ONLY commit (all
    matched rows filled whole files — removes without adds, the
    partition-drop shape) passes silently under the option; a REWRITE
    commit (removes + adds) still fails — that one needs
    ignoreChanges/skipChangeCommits."""
    from rtdl_spark.sources.delta_stream_source import (
        _DeltaStreamReader,
        _latest_schema,
    )
    from rtdl_spark.sources.delta_writer import delete_where_delta_native

    table = str(tmp_path / "igd")
    df = spark.range(0, 12).select(
        "id", (F.col("id") % 3).cast("string").alias("p")
    )
    write_delta_native(
        spark, df.repartition(1), table, partition_by=["p"],
        checkpoint_interval=0,
    )
    # v1: delete a WHOLE partition -> removes only, no adds
    delete_where_delta_native(spark, table, "p = '0'")
    # v2: partial delete -> rewrite (remove + add)
    delete_where_delta_native(spark, table, "id = 1")

    sch = _latest_schema(table, 10)
    r = _DeltaStreamReader(sch, {"path": table, "ignoreDeletes": "true"})
    parts = [p for p in r.partitions({"version": 0}, {"version": 1}) if p.path]
    assert parts == []  # tolerated, nothing re-emitted
    with pytest.raises(ValueError, match="changes existing data"):
        r.partitions({"version": 1}, {"version": 2})


def test_dv_adds_emit_visible_rows_only(spark, tmp_path):
    """Deletion vectors in the stream lane (r7): an EMITTED add that
    carries a DV descriptor yields its VISIBLE rows — the mask is
    applied worker-side on the physical row index. A DV DELETE is a
    change commit (remove+add of the same path): fails by default;
    under ignoreChanges the marked files re-emit WITHOUT the deleted
    rows (the old behavior refused DV adds outright)."""
    import json as _json
    import os as _os

    from rtdl_spark.sources.delta_reader import snapshot_actions
    from rtdl_spark.sources.delta_stream_source import (
        DeltaStreamDataSource,
    )
    from rtdl_spark.sources.delta_writer import delete_where_delta_dv

    root = str(tmp_path / "dvs")
    df = spark.range(0, 30).select(
        "id", (F.col("id") % 3).cast("string").alias("p")
    ).repartition(2)
    write_delta_native(
        spark, df, root, partition_by=["p"], checkpoint_interval=0
    )
    _, meta, _, current, _ = snapshot_actions(spark, root)
    with open(
        _os.path.join(root, "_delta_log", f"{current + 1:020d}.json"), "w"
    ) as f:
        f.write(_json.dumps({"commitInfo": {
            "timestamp": 2, "operation": "UPGRADE"}}) + "\n")
        f.write(_json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": ["deletionVectors", "appendOnly",
                               "invariants"]}}) + "\n")
        f.write(_json.dumps({"metaData": {
            **meta,
            "configuration": {"delta.enableDeletionVectors": "true"}}})
            + "\n")

    spark.dataSource.register(DeltaStreamDataSource)
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def _run(opts=None):
        r = spark.readStream.format("rtdl_delta_stream").option(
            "path", root
        )
        for k, v in (opts or {}).items():
            r = r.option(k, v)
        q = (
            r.load().writeStream.format("parquet").option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    _run()
    assert sorted(
        r["id"] for r in spark.read.parquet(sink).collect()
    ) == list(range(30))

    res = delete_where_delta_dv(spark, root, "id % 5 = 0")
    n_marked = res["files_marked"]
    assert n_marked >= 1

    with pytest.raises(Exception, match="changes existing data"):
        _run()

    _run({"ignoreChanges": "true"})
    from collections import Counter

    c = Counter(r["id"] for r in spark.read.parquet(sink).collect())
    deleted = [i for i in range(30) if i % 5 == 0]
    # the deleted rows were NEVER re-emitted (the mask applied)...
    assert all(c[i] == 1 for i in deleted), c
    # ...while the marked files' SURVIVORS re-emitted exactly once
    assert sum(1 for i, n in c.items() if n == 2) > 0
    assert all(n <= 2 for n in c.values())


def test_read_change_feed_streams_change_rows(spark, tmp_path):
    """readChangeFeed (r7, delta-spark parity): the stream emits CHANGE
    ROWS — creation/appends derived as inserts, cdc commits read from
    their _change_data files — with _change_type/_commit_version/
    _commit_timestamp stamped; an incremental restart emits only the
    new commits' changes."""
    import json as _json
    import os as _os

    from rtdl_spark.sources.delta_reader import snapshot_actions
    from rtdl_spark.sources.delta_stream_source import (
        DeltaStreamDataSource,
    )
    from rtdl_spark.sources.delta_writer import (
        delete_where_delta_native,
        update_where_delta_native,
    )

    spark.dataSource.register(DeltaStreamDataSource)
    root = str(tmp_path / "rcf")
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    df = spark.range(0, 20).select(
        "id", (F.col("id") % 2).cast("string").alias("p")
    )
    write_delta_native(
        spark, df, root, partition_by=["p"], checkpoint_interval=0
    )
    _, meta, _, current, _ = snapshot_actions(spark, root)
    with open(
        _os.path.join(root, "_delta_log", f"{current + 1:020d}.json"), "w"
    ) as f:
        f.write(_json.dumps({"commitInfo": {
            "timestamp": 2, "operation": "SET"}}) + "\n")
        f.write(_json.dumps({"protocol": {
            "minReaderVersion": 1, "minWriterVersion": 4}}) + "\n")
        f.write(_json.dumps({"metaData": {
            **meta,
            "configuration": {"delta.enableChangeDataFeed": "true"}}})
            + "\n")
    delete_where_delta_native(spark, root, "id IN (3, 5)")            # v2
    update_where_delta_native(spark, root, "id = 8", {"id": "id + 100"})

    def run():
        q = (
            spark.readStream.format("rtdl_delta_stream")
            .option("path", root).option("readChangeFeed", "true")
            # v0 predates enableChangeDataFeed=true (v1): strict mode
            # refuses feed-less commits; this opt-in derives the pure
            # append as inserts
            .option("allowUnrecordedChanges", "true").load()
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    # strictness (r8 ADVICE): WITHOUT the opt-in, planning the
    # pre-enable creation commit refuses by name (the refusal fires
    # during planning, before any schema-dependent read)
    from rtdl_spark.sources.delta_stream_source import (
        _DeltaStreamReader,
        _latest_schema,
    )
    strict = _DeltaStreamReader(
        _latest_schema(root, 3),
        {"path": root, "readChangeFeed": "true"},
    )
    with pytest.raises(ValueError, match="not 'true'"):
        strict.partitions({"version": -1}, {"version": 3})

    run()
    got = spark.read.parquet(out)
    rows = sorted(
        (r["_commit_version"], r["_change_type"], r["id"])
        for r in got.collect()
    )
    exp = (
        [(0, "insert", i) for i in range(20)]
        + [(2, "delete", 3), (2, "delete", 5)]
        + [(3, "update_preimage", 8), (3, "update_postimage", 108)]
    )
    assert rows == sorted(exp)
    assert all(r["_commit_timestamp"] is not None for r in got.collect())
    # partition column present and typed on change rows
    assert {r["id"]: r["p"] for r in got.collect()}[3] == "1"

    # incremental: only the NEW commit's changes on restart
    delete_where_delta_native(spark, root, "id = 10")
    run()
    rows2 = sorted(
        (r["_commit_version"], r["_change_type"], r["id"])
        for r in spark.read.parquet(out).collect()
    )
    assert len(rows2) == len(exp) + 1
    assert (4, "delete", 10) in rows2


def test_read_change_feed_covers_dv_delete_via_cdc(spark, tmp_path):
    """readChangeFeed x deletion vectors: a DV DELETE on a CDF table
    commits cdc change files (test_cdf.py), so the CDF STREAM reads
    those instead of refusing — the DV-attach commit's change rows are
    exactly the newly deleted rows."""
    import json as _json
    import os as _os

    from rtdl_spark.sources.delta_reader import snapshot_actions
    from rtdl_spark.sources.delta_stream_source import (
        DeltaStreamDataSource,
    )
    from rtdl_spark.sources.delta_writer import delete_where_delta_dv

    spark.dataSource.register(DeltaStreamDataSource)
    root = str(tmp_path / "rcfdv")
    df = spark.range(0, 30).select(
        "id", (F.col("id") % 3).cast("string").alias("p")
    ).repartition(2)
    write_delta_native(
        spark, df, root, partition_by=["p"], checkpoint_interval=0
    )
    _, meta, _, current, _ = snapshot_actions(spark, root)
    with open(
        _os.path.join(root, "_delta_log", f"{current + 1:020d}.json"), "w"
    ) as f:
        f.write(_json.dumps({"commitInfo": {
            "timestamp": 2, "operation": "UPGRADE"}}) + "\n")
        f.write(_json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": ["deletionVectors", "appendOnly",
                               "invariants", "changeDataFeed"]}}) + "\n")
        f.write(_json.dumps({"metaData": {
            **meta,
            "configuration": {
                "delta.enableDeletionVectors": "true",
                "delta.enableChangeDataFeed": "true",
            }}}) + "\n")
    res = delete_where_delta_dv(spark, root, "id % 5 = 0")
    assert res["cdc_files"] >= 1

    out, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("rtdl_delta_stream")
        .option("path", root).option("readChangeFeed", "true")
        .option("allowUnrecordedChanges", "true")  # v0 pre-enable append
        .load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    deletes = sorted(
        r["id"] for r in got.filter("_change_type = 'delete'").collect()
    )
    assert deletes == [i for i in range(30) if i % 5 == 0]
    inserts = got.filter("_change_type = 'insert'").count()
    assert inserts == 30  # the creation commit derives as inserts


def test_read_change_feed_derives_dv_attach_from_mask_diff(
    spark, tmp_path
):
    """readChangeFeed x cdc-less DV commits (r8, was a refusal): a DV
    DELETE made while CDF was off pairs remove+add of the same path;
    the stream derives its change rows from the MASK DIFF — only the
    newly masked positions emit as deletes, already-masked rows never
    re-report (needs allowUnrecordedChanges: the commits predate the
    feed)."""
    import json as _json
    import os as _os

    from rtdl_spark.sources.delta_reader import snapshot_actions
    from rtdl_spark.sources.delta_stream_source import (
        DeltaStreamDataSource,
    )
    from rtdl_spark.sources.delta_writer import delete_where_delta_dv

    spark.dataSource.register(DeltaStreamDataSource)
    root = str(tmp_path / "rcfdvd")
    df = spark.range(0, 30).select(
        "id", (F.col("id") % 3).cast("string").alias("p")
    ).repartition(2)
    write_delta_native(
        spark, df, root, partition_by=["p"], checkpoint_interval=0
    )
    _, meta, _, current, _ = snapshot_actions(spark, root)
    with open(
        _os.path.join(root, "_delta_log", f"{current + 1:020d}.json"), "w"
    ) as f:
        f.write(_json.dumps({"commitInfo": {
            "timestamp": 2, "operation": "UPGRADE"}}) + "\n")
        f.write(_json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": ["deletionVectors", "appendOnly",
                               "invariants"]}}) + "\n")
        f.write(_json.dumps({"metaData": {
            **meta,
            "configuration": {"delta.enableDeletionVectors": "true"},
        }}) + "\n")
    # two OVERLAPPING DV DELETEs, both cdc-less (no CDF yet)
    delete_where_delta_dv(spark, root, "id IN (3, 9)")
    delete_where_delta_dv(spark, root, "id IN (9, 12)")

    out, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("rtdl_delta_stream")
        .option("path", root).option("readChangeFeed", "true")
        .option("allowUnrecordedChanges", "true")
        .load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    deletes = sorted(
        (r["_commit_version"], r["id"])
        for r in got.filter("_change_type = 'delete'").collect()
    )
    assert deletes == [(2, 3), (2, 9), (3, 12)], (
        "mask-diff only: 9 must not re-report at v3"
    )
    assert got.filter("_change_type = 'insert'").count() == 30


def test_max_bytes_per_trigger_bounds_each_batch(spark, tmp_path):
    """maxBytesPerTrigger (r8, delta-spark parity): each latestOffset
    advances while the batch's dataChange add-file BYTE total stays
    within the limit; a commit bigger than the limit is still admitted
    whole (at-least-one); composes with maxFilesPerTrigger — either
    limit being hit stops admission."""
    from rtdl_spark.sources.delta_stream_source import (
        _DeltaStreamReader,
        _latest_schema,
    )

    table = str(tmp_path / "mbt")
    # 4 commits, 1 file each
    for lo, hi in ((0, 30), (30, 60), (60, 90), (90, 120)):
        write_delta_native(
            spark,
            spark.range(lo, hi).select("id").repartition(1),
            table,
        )
    sizes = []
    log = os.path.join(table, "_delta_log")
    for v in range(4):
        for line in open(os.path.join(log, f"{v:020d}.json")):
            a = json.loads(line)
            if "add" in a:
                sizes.append(int(a["add"]["size"]))
    assert len(sizes) == 4

    # limit of two files' bytes: batches advance two commits at a time
    # (parquet sizes differ by a few bytes commit-to-commit — take the
    # larger pair so both two-commit batches fit exactly)
    sch = _latest_schema(table, 10)
    two = max(sizes[0] + sizes[1], sizes[2] + sizes[3])
    r = _DeltaStreamReader(
        sch,
        {"path": table, "maxBytesPerTrigger": str(two)},
    )
    prev = r.initialOffset()
    ends = []
    for _ in range(4):
        end = r.latestOffset()
        if end == prev:
            break
        list(r.partitions(prev, end))
        ends.append(end["version"])
        prev = end
    assert ends == [1, 3]

    # a limit SMALLER than any single file: one commit per batch
    # (at-least-one admission)
    r2 = _DeltaStreamReader(
        sch, {"path": table, "maxBytesPerTrigger": "1"}
    )
    prev = r2.initialOffset()
    ends2 = []
    for _ in range(6):
        end = r2.latestOffset()
        if end == prev:
            break
        list(r2.partitions(prev, end))
        ends2.append(end["version"])
        prev = end
    assert ends2 == [0, 1, 2, 3]

    # composes with maxFilesPerTrigger: the tighter limit wins
    r3 = _DeltaStreamReader(
        sch,
        {"path": table, "maxFilesPerTrigger": "3",
         "maxBytesPerTrigger": str(sizes[0])},
    )
    prev = r3.initialOffset()
    end = r3.latestOffset()
    assert end["version"] == 0  # bytes cap stops before the file cap

    with pytest.raises(ValueError, match="maxBytesPerTrigger"):
        _DeltaStreamReader(
            sch, {"path": table, "maxBytesPerTrigger": "0"}
        )
