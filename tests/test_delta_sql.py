"""SQL-text front end (sources/delta_sql.py): each statement routes to
the tested native API; unrecognized syntax refuses naming the API."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from rtdl_spark.sources.delta_reader import (
    read_delta_native,
    snapshot_actions,
)
from rtdl_spark.sources.delta_sql import delta_sql


def test_create_alter_dml_lifecycle_via_sql(spark, tmp_path):
    """The whole lifecycle in SQL strings: CREATE with identity +
    generated + NOT NULL + properties, inserts via the write API,
    ALTER properties/constraints, UPDATE/DELETE, OPTIMIZE ZORDER,
    DESCRIBE — every statement hitting the native lane."""
    from rtdl_spark.sources.delta_writer import write_delta_native

    p = str(tmp_path / "t")
    res = delta_sql(spark, f"""
        CREATE TABLE delta.`{p}` (
          uid BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 10 INCREMENT BY 5),
          k BIGINT NOT NULL,
          price DOUBLE,
          bucket INT GENERATED ALWAYS AS (CAST(k % 3 AS INT))
        ) USING DELTA TBLPROPERTIES ('delta.enableChangeDataFeed' = 'true')
    """)
    assert res["version"] == 0
    write_delta_native(
        spark,
        spark.range(0, 30).select(
            F.col("id").alias("k"), (F.col("id") * 1.5).alias("price")
        ),
        p, checkpoint_interval=0,
    )
    got = read_delta_native(spark, p)
    assert got.count() == 30
    uids = sorted(r["uid"] for r in got.collect())
    assert uids == [10 + 5 * i for i in range(30)]
    assert got.filter("bucket != CAST(k % 3 AS INT)").count() == 0

    delta_sql(
        spark,
        f"ALTER TABLE delta.`{p}` ADD CONSTRAINT posp CHECK (price >= 0)",
    )
    with pytest.raises(Exception, match="posp"):
        write_delta_native(
            spark,
            spark.createDataFrame([(1, -5.0)], "k long, price double"),
            p, checkpoint_interval=0,
        )
    delta_sql(spark, f"ALTER TABLE delta.`{p}` DROP CONSTRAINT posp")

    d = delta_sql(spark, f"DELETE FROM delta.`{p}` WHERE k % 5 = 0")
    assert d["files_rewritten"] >= 1
    assert d["cdc_files"] >= 1  # CDF came from CREATE's TBLPROPERTIES
    u = delta_sql(
        spark,
        f"UPDATE delta.`{p}` SET price = price + 100 WHERE k = 7",
    )
    assert u["files_rewritten"] == 1
    got = read_delta_native(spark, p)
    assert got.count() == 24
    assert got.filter("k = 7").collect()[0]["price"] == 10.5 + 100

    delta_sql(spark, f"OPTIMIZE delta.`{p}` ZORDER BY (k)")
    assert read_delta_native(spark, p).count() == 24

    hist = delta_sql(spark, f"DESCRIBE HISTORY delta.`{p}`")
    ops = [r["operation"] for r in hist.collect()]
    assert "CREATE TABLE" in ops and "ADD CONSTRAINT" in ops
    detail = delta_sql(spark, f"DESCRIBE DETAIL delta.`{p}`").collect()[0]
    assert detail["numFiles"] >= 1
    assert json.loads(detail["properties"])[
        "delta.enableChangeDataFeed"
    ] == "true"


def test_merge_clone_vacuum_restore_via_sql(spark, tmp_path):
    from rtdl_spark.sources.delta_writer import write_delta_native

    p = str(tmp_path / "t")
    write_delta_native(
        spark,
        spark.range(0, 20).select("id", (F.col("id") * 2).alias("v")),
        p, checkpoint_interval=0,
    )
    spark.range(15, 25).select(
        "id", F.lit(-1).cast("long").alias("v")
    ).createOrReplaceTempView("merge_src")
    res = delta_sql(spark, f"""
        MERGE INTO delta.`{p}` t USING merge_src s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
    """)
    assert res["version"] is not None
    got = read_delta_native(spark, p)
    assert got.count() == 25
    assert got.filter("v = -1").count() == 10

    # subquery source form
    delta_sql(spark, f"""
        MERGE INTO delta.`{p}` AS t
        USING (SELECT CAST(100 AS BIGINT) AS id, CAST(7 AS BIGINT) AS v) AS s
        ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *
    """)
    assert read_delta_native(spark, p).count() == 26

    clone = str(tmp_path / "c")
    delta_sql(
        spark,
        f"CREATE TABLE delta.`{clone}` SHALLOW CLONE delta.`{p}`",
    )
    assert read_delta_native(spark, clone).count() == 26

    r = delta_sql(
        spark, f"RESTORE TABLE delta.`{p}` TO VERSION AS OF 0"
    )
    assert r["version"] is not None
    assert read_delta_native(spark, p).count() == 20
    assert read_delta_native(spark, clone).count() == 26  # isolated

    victims = delta_sql(spark, f"VACUUM delta.`{p}` RETAIN 0 HOURS")
    assert isinstance(victims, list)
    assert read_delta_native(spark, p).count() == 20


def test_sql_refusals_name_the_native_api(spark, tmp_path):
    from rtdl_spark.sources.delta_writer import write_delta_native

    p = str(tmp_path / "t")
    write_delta_native(
        spark, spark.range(3).select("id"), p, checkpoint_interval=0
    )
    # SELECT over delta.`path` refs became supported in r10 — the
    # refusal now fires only when no delta reference appears
    with pytest.raises(ValueError, match="no delta"):
        delta_sql(spark, "SELECT 1 AS one")
    with pytest.raises(ValueError, match="unrecognized Delta SQL"):
        delta_sql(spark, f"TRUNCATE TABLE delta.`{p}`")
    with pytest.raises(ValueError, match="unsupported ALTER TABLE"):
        delta_sql(spark, f"ALTER TABLE delta.`{p}` FROB THE KNOB")
    # column-level SET became a supported clause in r10 — the refusal
    # now only fires on genuinely unparseable clause bodies
    with pytest.raises(ValueError, match="WHEN clause"):
        delta_sql(spark, f"""
            MERGE INTO delta.`{p}` t USING x s ON t.id = s.id
            WHEN MATCHED THEN FROB THE ROW
        """)
    with pytest.raises(ValueError, match="t.col = s.col"):
        delta_sql(spark, f"""
            MERGE INTO delta.`{p}` t USING x s ON t.id = s.other
            WHEN MATCHED THEN UPDATE SET *
        """)


def test_vacuum_dry_run_sql(spark, tmp_path):
    """VACUUM ... DRY RUN returns the deletable paths as a one-column
    frame and deletes NOTHING (r10 grammar growth)."""
    import os

    from rtdl_spark.sources.delta_writer import (
        delete_where_delta_native,
        write_delta_native,
    )

    root = str(tmp_path / "t")
    df = spark.range(0, 100).select("id").repartition(4)
    write_delta_native(spark, df, root, checkpoint_interval=0)
    delete_where_delta_native(spark, root, "id < 100")  # all files dead
    out = delta_sql(
        spark, f"VACUUM delta.`{root}` RETAIN 0 HOURS DRY RUN"
    )
    victims = [r["path"] for r in out.collect()]
    assert len(victims) >= 1
    for p in victims:
        assert os.path.exists(p), "DRY RUN must not delete"
    # and the non-dry form actually deletes them
    deleted = delta_sql(spark, f"VACUUM delta.`{root}` RETAIN 0 HOURS")
    assert sorted(deleted) == sorted(victims)
    for p in victims:
        assert not os.path.exists(p)


def test_restore_timestamp_as_of_sql(spark, tmp_path):
    """RESTORE ... TO TIMESTAMP AS OF resolves through the same
    timestamp rule as read-side time travel (last version at-or-before,
    UTC) and restores that version."""
    import json
    import os
    import time

    from rtdl_spark.sources.delta_reader import read_delta_native
    from rtdl_spark.sources.delta_writer import write_delta_native

    root = str(tmp_path / "t")
    write_delta_native(
        spark, spark.range(0, 5).select("id"), root, checkpoint_interval=0
    )
    write_delta_native(
        spark, spark.range(5, 9).select("id"), root, checkpoint_interval=0
    )
    # pin distinct commit timestamps so the cutoff is unambiguous
    log = os.path.join(root, "_delta_log")
    for v, ts in ((0, 1_700_000_000_000), (1, 1_700_000_600_000)):
        p = os.path.join(log, f"{v:020d}.json")
        lines = []
        for line in open(p):
            a = json.loads(line)
            if "commitInfo" in a:
                a["commitInfo"]["timestamp"] = ts
            lines.append(json.dumps(a))
        open(p, "w").write("\n".join(lines) + "\n")
    # a wall time between the two commits -> restore to v0
    cut = time.strftime(
        "%Y-%m-%d %H:%M:%S", time.gmtime(1_700_000_300)
    )
    res = delta_sql(
        spark,
        f"RESTORE TABLE delta.`{root}` TO TIMESTAMP AS OF '{cut}'",
    )
    assert res["version"] is not None
    assert read_delta_native(spark, root).count() == 5


def test_create_or_replace_and_comments_sql(spark, tmp_path):
    """CREATE OR REPLACE commits a REPLACE TABLE version: new schema/
    properties, all prior files removed, table id + history preserved,
    old data still time-travelable; COMMENT clauses land in the field
    metadata and metaData.description; IF NOT EXISTS no-ops on an
    existing table."""
    import json as _json

    from rtdl_spark.sources.delta_reader import (
        read_delta_native,
        snapshot_actions,
    )
    from rtdl_spark.sources.delta_writer import write_delta_native

    root = str(tmp_path / "t")
    delta_sql(spark, f"""
        CREATE TABLE delta.`{root}` (
            id BIGINT NOT NULL COMMENT 'the key',
            v DOUBLE
        ) USING DELTA COMMENT 'first definition'
    """)
    _, meta0, _, _, _ = snapshot_actions(spark, root)
    assert meta0.get("description") == "first definition"
    f_id = next(
        f for f in _json.loads(meta0["schemaString"])["fields"]
        if f["name"] == "id"
    )
    assert f_id["metadata"]["comment"] == "the key"
    assert f_id["nullable"] is False
    write_delta_native(
        spark,
        spark.range(0, 7).select(
            "id", (F.col("id") * 1.0).alias("v")
        ),
        root, checkpoint_interval=0,
    )
    # IF NOT EXISTS: no-op
    res = delta_sql(spark, f"""
        CREATE TABLE IF NOT EXISTS delta.`{root}` (x BIGINT)
    """)
    assert res == {"version": None, "created": False}
    # OR REPLACE: new definition, empty table, history intact
    res = delta_sql(spark, f"""
        CREATE OR REPLACE TABLE delta.`{root}` (
            k BIGINT,
            label STRING
        ) USING DELTA COMMENT 'second definition'
        TBLPROPERTIES ('delta.enableChangeDataFeed' = 'true')
    """)
    assert res["version"] == 2
    _, meta2, active2, v2, _ = snapshot_actions(spark, root)
    assert v2 == 2
    assert active2 == {}
    assert meta2["id"] == meta0["id"], "REPLACE must keep the table id"
    assert meta2.get("description") == "second definition"
    assert meta2["configuration"]["delta.enableChangeDataFeed"] == "true"
    assert read_delta_native(spark, root).count() == 0
    assert [
        f["name"]
        for f in _json.loads(meta2["schemaString"])["fields"]
    ] == ["k", "label"]
    # the pre-replace snapshot is still readable by version
    assert read_delta_native(spark, root, version=1).count() == 7
    # and the new definition accepts appends
    write_delta_native(
        spark,
        spark.createDataFrame([(1, "a")], "k long, label string"),
        root, checkpoint_interval=0,
    )
    assert read_delta_native(spark, root).count() == 1


def test_select_show_and_history_params(spark, tmp_path):
    """r10 read-side grammar: SELECT/WITH over delta.`path` references
    (incl. time travel) execute through native-reader temp views; SHOW
    TBLPROPERTIES lists the configuration; DESCRIBE HISTORY carries
    operationParameters."""
    import json as _json

    from rtdl_spark.sources.delta_writer import write_delta_native

    root = str(tmp_path / "t")
    write_delta_native(
        spark, spark.range(0, 10).select("id"), root, checkpoint_interval=0
    )
    write_delta_native(
        spark, spark.range(10, 15).select("id"), root, checkpoint_interval=0
    )
    got = delta_sql(
        spark, f"SELECT COUNT(*) AS n FROM delta.`{root}`"
    ).collect()[0]["n"]
    assert got == 15
    got0 = delta_sql(
        spark,
        f"SELECT COUNT(*) AS n FROM delta.`{root}` VERSION AS OF 0",
    ).collect()[0]["n"]
    assert got0 == 10
    # a join of two refs (same table twice) rewrites both
    j = delta_sql(spark, f"""
        WITH a AS (SELECT id FROM delta.`{root}` VERSION AS OF 0)
        SELECT COUNT(*) AS n
        FROM a JOIN delta.`{root}` b ON a.id = b.id
    """).collect()[0]["n"]
    assert j == 10

    from rtdl_spark.sources.delta_alter import alter_set_tblproperties

    alter_set_tblproperties(spark, root, {"delta.appendOnly": "false"})
    props = {
        r["key"]: r["value"]
        for r in delta_sql(
            spark, f"SHOW TBLPROPERTIES delta.`{root}`"
        ).collect()
    }
    assert props.get("delta.appendOnly") == "false"

    hist = delta_sql(
        spark, f"DESCRIBE HISTORY delta.`{root}`"
    ).collect()
    assert hist[0]["version"] == 0
    assert all("operationParameters" in r.asDict() for r in hist)
    assert isinstance(
        _json.loads(hist[-1]["operationParameters"]), dict
    )


def test_delete_without_where_removes_everything(spark, tmp_path):
    from rtdl_spark.sources.delta_writer import write_delta_native

    root = str(tmp_path / "t")
    write_delta_native(
        spark, spark.range(0, 9).select("id"), root, checkpoint_interval=0
    )
    res = delta_sql(spark, f"DELETE FROM delta.`{root}`")
    assert res["version"] is not None
    assert read_delta_native(spark, root).count() == 0
    # history intact: the pre-delete version still reads
    assert read_delta_native(spark, root, version=0).count() == 9


def test_insert_into_and_overwrite_sql(spark, tmp_path):
    """INSERT INTO (VALUES / column list / SELECT from another delta
    ref) and INSERT OVERWRITE route to the native writer; omitted
    generated/identity columns via an explicit column list are computed
    by the append lane."""
    from rtdl_spark.sources.delta_writer import write_delta_native

    root = str(tmp_path / "t")
    delta_sql(spark, f"""
        CREATE TABLE delta.`{root}` (
            uid BIGINT GENERATED ALWAYS AS IDENTITY,
            k BIGINT NOT NULL,
            v DOUBLE
        ) USING DELTA
    """)
    delta_sql(spark, f"""
        INSERT INTO delta.`{root}` (k, v) VALUES (1, 1.5), (2, 2.5)
    """)
    got = read_delta_native(spark, root)
    assert got.count() == 2
    assert sorted(r["uid"] for r in got.collect()) == [1, 2]

    # INSERT ... SELECT from another delta table
    other = str(tmp_path / "o")
    write_delta_native(
        spark,
        spark.range(10, 13).select(
            "id", (F.col("id") * 1.0).alias("x")
        ),
        other, checkpoint_interval=0,
    )
    delta_sql(spark, f"""
        INSERT INTO delta.`{root}` (k, v)
        SELECT id, x FROM delta.`{other}` WHERE id <> 11
    """)
    assert read_delta_native(spark, root).count() == 4
    ks = sorted(r["k"] for r in read_delta_native(spark, root).collect())
    assert ks == [1, 2, 10, 12]

    # INSERT OVERWRITE replaces content (full-width positional)
    plain = str(tmp_path / "p")
    write_delta_native(
        spark,
        spark.createDataFrame([(1, 10.0)], "k long, v double"),
        plain, checkpoint_interval=0,
    )
    delta_sql(spark, f"""
        INSERT OVERWRITE delta.`{plain}` VALUES (7, 70.0), (8, 80.0)
    """)
    rows = sorted(
        (r["k"], r["v"])
        for r in read_delta_native(spark, plain).collect()
    )
    assert rows == [(7, 70.0), (8, 80.0)]
    assert read_delta_native(spark, plain, version=0).count() == 1

    # arity mismatch refuses
    with pytest.raises(ValueError, match="arity"):
        delta_sql(spark, f"INSERT INTO delta.`{plain}` VALUES (1)")


def test_update_without_where_touches_every_row(spark, tmp_path):
    from rtdl_spark.sources.delta_writer import write_delta_native

    root = str(tmp_path / "t")
    write_delta_native(
        spark,
        spark.range(0, 6).select("id", (F.col("id") * 2).alias("v")),
        root, checkpoint_interval=0,
    )
    delta_sql(spark, f"UPDATE delta.`{root}` SET v = v + 1000")
    assert read_delta_native(spark, root).filter("v < 1000").count() == 0
