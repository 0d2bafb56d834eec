"""Bytes-gated small-plan execution scope (r11; guide §1.2, §2.2).

AQE materializes every shuffle stage as its OWN Spark job with a driver
re-planning gap between jobs; that buys runtime re-planning (partition
coalescing, skew splits, join demotion) which cannot pay off when the
whole input is a few shuffle partitions' worth of data. Inside the
scope, adaptive execution is off and shuffle parallelism is re-derived
from the DATA VOLUME (~64 MiB per partition — exactly what AQE's
coalescing would have produced at runtime), so a small internal action
(an identify probe, a staging write, an ingest batch probe) runs as ONE
job instead of one job per stage.

The gate is DATA-derived, never core-count derived: at 100 TB every
real action far exceeds it and AQE stays on exactly where it is
load-bearing. Override per session with spark.rtdl.dml.smallPlanMaxBytes
(tests raise/lower it to pin both paths). Conf changes are
session-scoped, not thread-scoped — the scope window is one action; a
concurrently planned query in another thread would at worst plan that
one query without AQE (results unaffected)."""

from __future__ import annotations

import contextlib

from pyspark.sql import DataFrame, SparkSession

_SMALL_PLAN_MAX_BYTES = 256 << 20
_SMALL_PLAN_CONF = "spark.rtdl.dml.smallPlanMaxBytes"


def _plan_size_estimate(df: DataFrame) -> int:
    """Catalyst's sizeInBytes estimate of a frame (driver-side, no job).
    Opaque sources estimate conservatively LARGE, which fails the
    small-plan gate — the safe direction (AQE stays on)."""
    try:
        return int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return 1 << 62


def _is_small_plan(spark: SparkSession, involved_bytes: int) -> bool:
    try:
        gate = int(spark.conf.get(_SMALL_PLAN_CONF, ""))
    except (TypeError, ValueError):
        gate = _SMALL_PLAN_MAX_BYTES
    return 0 <= involved_bytes < gate


@contextlib.contextmanager
def _small_plan_scope(spark: SparkSession, involved_bytes: int):
    """Scoped AQE-off + data-derived shuffle parallelism for an internal
    action over ``involved_bytes`` of input. Restores both settings even
    on error; a no-op above the gate or when the session already runs
    without AQE."""
    if not _is_small_plan(spark, involved_bytes):
        yield False
        return
    try:
        prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    except Exception:
        prev = "true"
    if prev != "true":
        yield False
        return
    try:
        prev_sp = spark.conf.get("spark.sql.shuffle.partitions", "200")
    except Exception:
        prev_sp = "200"
    n_parts = max(1, -(-involved_bytes // (64 << 20)))
    try:
        n_parts = min(n_parts, int(prev_sp))
    except (TypeError, ValueError):
        pass
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
    try:
        yield True
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
