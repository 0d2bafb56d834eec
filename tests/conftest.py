"""Shared pytest fixtures.

The SparkSession here deliberately mimics the *driver's* session (plain
builder, none of our engine confs) so tests prove the queries work on a
session we did not configure — rtdl_spark.session.ensure_runtime_confs must
do its job at call time.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("rtdl_spark_tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "6g")
        .getOrCreate()
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the fixture tables registered as views,
    matching the driver's oracle environment."""
    import duckdb

    con = duckdb.connect()
    for name in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        con.sql(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{name}.parquet')"
        )
    yield con
    con.close()


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "gated: environment-gated integration test — skips with a reason "
        "when the dependency (kafka package/broker, delta-spark, "
        "transformWithStateInPandas) is absent in this image, and goes "
        "green automatically the round it appears. Probe the round's "
        "image with `pytest -m gated -rs`.",
    )
