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
    with pytest.raises(ValueError, match="unrecognized Delta SQL"):
        delta_sql(spark, f"SELECT * FROM delta.`{p}`")
    with pytest.raises(ValueError, match="unsupported ALTER TABLE"):
        delta_sql(spark, f"ALTER TABLE delta.`{p}` FROB THE KNOB")
    with pytest.raises(ValueError, match="merge_into_delta_native"):
        delta_sql(spark, f"""
            MERGE INTO delta.`{p}` t USING x s ON t.id = s.id
            WHEN MATCHED THEN UPDATE SET v = s.v + 1
        """)
    with pytest.raises(ValueError, match="t.col = s.col"):
        delta_sql(spark, f"""
            MERGE INTO delta.`{p}` t USING x s ON t.id = s.other
            WHEN MATCHED THEN UPDATE SET *
        """)
