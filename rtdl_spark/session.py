"""SparkSession factory tuned for the lake workload.

Defaults are chosen for correctness parity with the DuckDB oracle (UTC
session timezone; ANSI mode stays at the Spark 4 default of ON — every
division/overflow in the engine is written to be ANSI-safe) and for scale
(AQE on, skew-join handling, partition coalescing; dynamic partition
pruning and runtime bloom-filter join injection stay at their ON defaults
— tests/test_plans.py proves both engage). On a real cluster the same settings hold; only
``shuffle.partitions`` / ``maxPartitionBytes`` need re-sizing to the
executor fleet (see ``tune_for_scale``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Session-level defaults applied both when we build the session ourselves and
# when the driver hands us one (see ensure_runtime_confs).
RUNTIME_CONFS: dict[str, str] = {
    # The fixture `events.ts` is parquet TIMESTAMP(NANOS) which Spark cannot
    # read natively; read as long and convert (rtdl_spark.catalog).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # DuckDB timestamps are UTC-naive; pin Spark to UTC for oracle parity.
    "spark.sql.session.timeZone": "UTC",
    # Adaptive execution: runtime re-plan, partition coalescing, skew joins.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for any pandas/Pandas-UDF exchange (vectorized, not per-row).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Partition bucket columns (rtdl_bucket) are strings by contract;
    # without this, daily buckets read back as DATE while weekly/quarterly
    # stay strings — an inconsistent schema across grains.
    "spark.sql.sources.partitionColumnTypeInference.enabled": "false",
    # r11: PySpark's DataFrame-debugging origin capture (default ON) adds
    # a stack inspection plus ~4 py4j round trips to EVERY DataFrame/
    # Column/functions API call (getActiveSession + depth conf read +
    # JVM origin set/clear) purely to enrich error messages with user
    # call sites. Plan construction is inside the bench's timed region
    # and dominates the DML lane's driver gap, so the capture is off.
    "spark.python.sql.dataFrameDebugging.enabled": "false",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "rtdl_spark", master: str | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults."""
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    ensure_runtime_confs(spark)
    return spark


def ensure_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine confs to an externally-built session.

    The verification driver constructs its own SparkSession; every public
    query entrypoint routes through here so behavior does not depend on who
    built the session.

    Applied once per session object (r11): the confs are idempotent and
    table()/reader entrypoints call this on every invocation, so the
    repeated conf.set round trips were pure py4j overhead inside the
    bench's timed region — and re-applying mid-operation could stomp a
    scoped conf override (functions/smallplan.py).
    """
    if getattr(spark, "_rtdl_confs_applied", False):
        return spark
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Static conf on this build — builder path already set it.
            pass
    spark._rtdl_confs_applied = True
    return spark


def tune_for_scale(spark: SparkSession, input_bytes: int) -> SparkSession:
    """Size shuffle parallelism for a given input volume.

    Rule of thumb: target ~128 MiB IN MEMORY per shuffle partition,
    bounded below by the cluster's default parallelism. ``input_bytes``
    is on-disk (compressed columnar) size, which under-states the
    shuffled row size ~8× for numeric-heavy tables (snappy + dictionary/
    RLE encoding vs row-wise unsafe rows — measured on the 100× soak:
    60M lineitem rows are 1.1 GB on disk, ~9 GB as rows; the factor took
    a 100× window sort from 17.6s at 32 partitions to 13.9s at the ~64
    this sizing now picks, while 128 regressed to 17.9s). With AQE
    enabled this only sets the *initial* count; AQE coalesces at
    runtime, so erring high is cheap while erring low spills.
    """
    in_memory = input_bytes * 8
    target = max(default_parallelism(), in_memory // (128 << 20))
    spark.conf.set("spark.sql.shuffle.partitions", str(int(target)))
    return spark
