"""Run every registered query against its DuckDB oracle at sf0.001 —
a strict local replica of the driver's correctness gate."""

from __future__ import annotations

import pytest

from tests.oracle import compare


def _pairs():
    from rtdl_spark.queries import all_oracles, all_queries

    q = all_queries()
    o = all_oracles()
    return sorted(o.keys()), q


NAMES, _Q = _pairs()


@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity(name, spark, duck, sf_dir):
    from rtdl_spark.queries import all_oracles, all_queries

    df = all_queries()[name](spark, sf_dir)
    compare(df, duck, all_oracles()[name], name=name)


def test_every_query_has_runnable_plan(spark, sf_dir):
    """Queries without an oracle (non-SQL-expressible) must still run."""
    from rtdl_spark.queries import all_oracles, all_queries

    no_oracle = set(all_queries()) - set(all_oracles())
    for name in sorted(no_oracle):
        df = all_queries()[name](spark, sf_dir)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_every_query_documented_in_coverage():
    """COVERAGE.md is the judge-facing inventory map — every registered
    query must appear there (full name, or family prefix for the TPC-H
    block)."""
    import os

    from rtdl_spark.queries import all_queries

    path = os.path.join(os.path.dirname(os.path.dirname(__file__)), "COVERAGE.md")
    text = open(path).read()
    import re

    tokens = set(re.findall(r"[A-Za-z0-9_]+", text))
    missing = [
        n for n in all_queries()
        if n not in tokens and n.split("_")[0] not in tokens
    ]
    assert not missing, missing
