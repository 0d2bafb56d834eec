"""r11 optimization-round profiler.

Captures ``.explain("formatted")`` for every bench entry into
``plans/r11/<name>_<tag>.txt``, times entries with the exact bench
methodology, and (new this round) times the x_delta_lifecycle_full twin
PER STEP with Spark job counts per step (statusTracker job-group ids).

Usage:
  python tools/profile_r11.py plans <tag>          # capture plans only
  python tools/profile_r11.py time [reps]          # timings only (idle box!)
  python tools/profile_r11.py one <query> [reps]   # time one query
  python tools/profile_r11.py lifecycle [reps]     # per-step lifecycle A/B
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CORE_R5, HEADLINE  # noqa: E402


def _bench_names(registry) -> list[str]:
    return [n for n in HEADLINE if n in registry] + [
        n for n in sorted(registry) if n.startswith("x_") and n not in HEADLINE
    ]


def _lifecycle_steps(spark, sf_dir: str) -> dict[str, dict]:
    """One lifecycle replay with per-step wall + job counts."""
    from pyspark.sql import functions as F

    from rtdl_spark.catalog import table
    from rtdl_spark.queries._util import dec
    from rtdl_spark.sources.delta_reader import read_delta_native
    from rtdl_spark.sources.delta_writer import (
        delete_where_delta_native,
        merge_into_delta_native,
        optimize_delta_native,
        write_delta_native,
    )

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.when(F.col("o_orderkey") % 3 == 0, "a")
        .when(F.col("o_orderkey") % 3 == 1, "b")
        .otherwise("c")
        .alias("src"),
    )
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    workdir = tempfile.mkdtemp(prefix="rtdl_prof11_", dir=shm)
    out: dict[str, dict] = {}

    def step(name, fn):
        gid = f"prof11-{name}-{time.time_ns()}"
        sc.setJobGroup(gid, name)
        t0 = time.perf_counter()
        fn()
        wall = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        try:
            jobs = len(tracker.getJobIdsForGroup(gid))
        except Exception:
            jobs = -1
        out[name] = {"wall": round(wall, 4), "jobs": jobs}

    try:
        root = os.path.join(workdir, "dtab")
        step("write1", lambda: write_delta_native(
            spark, o.filter(F.col("o_orderkey") % 2 == 0).repartition(4),
            root, partition_by=["src"], checkpoint_interval=0))
        step("write2", lambda: write_delta_native(
            spark, o.filter(F.col("o_orderkey") % 2 == 1).repartition(4),
            root, checkpoint_interval=0))
        updates = o.filter(F.col("o_orderkey") % 7 == 0).withColumn(
            "o_totalprice", F.col("o_totalprice") + F.lit(100.0)
        )
        inserts = o.filter(F.col("o_orderkey") % 11 == 0).select(
            (-F.col("o_orderkey") - 1).alias("o_orderkey"),
            "o_totalprice",
            F.lit("z").alias("src"),
        )
        step("merge", lambda: merge_into_delta_native(
            spark, root, updates.unionByName(inserts), on=["o_orderkey"]))
        step("delete", lambda: delete_where_delta_native(
            spark, root, "o_totalprice > 250000.0"))
        step("optimize", lambda: optimize_delta_native(
            spark, root, target_file_bytes=64 << 20,
            zorder_by=["o_orderkey"], zorder_curve="morton"))
        step("read", lambda: (
            read_delta_native(spark, root)
            .groupBy("src")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(dec("o_totalprice")).cast("double").alias("total"))
            .collect()))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    return out


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "plans"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from rtdl_spark.queries import all_queries
    from rtdl_spark.session import get_spark

    spark = get_spark("rtdl_profile_r11")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    names = _bench_names(registry)

    if mode == "plans":
        tag = sys.argv[2] if len(sys.argv) > 2 else "before"
        outdir = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "plans", "r11")
        os.makedirs(outdir, exist_ok=True)
        for name in names:
            t0 = time.perf_counter()
            df = registry[name](spark, sf_dir)
            build = time.perf_counter() - t0
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            path = os.path.join(outdir, f"{name}_{tag}.txt")
            with open(path, "w") as f:
                f.write(f"-- {name} @ {sf_dir} (build {build:.2f}s)\n")
                f.write(plan)
            print(f"{name}: plan -> {path} (build {build:.2f}s)")
        return

    if mode == "lifecycle":
        reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
        # same warm-up as the bench: materialize the base tables once
        from rtdl_spark.catalog import TABLES, table

        for t in TABLES:
            table(spark, sf_dir, t).count()
        registry["q6_forecast_revenue"](spark, sf_dir).count()
        runs = []
        for i in range(reps):
            r = _lifecycle_steps(spark, sf_dir)
            total = round(sum(v["wall"] for v in r.values()), 4)
            print(json.dumps({"rep": i, "total": total, "steps": r}))
            runs.append((total, r))
        best = min(runs)[1]
        print(json.dumps({
            "best_total": min(r[0] for r in runs),
            "best_steps": best,
            "load1": round(os.getloadavg()[0], 2),
        }))
        spark.stop()
        return

    from rtdl_spark.catalog import TABLES, table

    for t in TABLES:
        table(spark, sf_dir, t).count()
    registry["q6_forecast_revenue"](spark, sf_dir).count()

    if mode == "one":
        only = [sys.argv[2]]
        reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    else:
        only = names
        reps = int(sys.argv[2]) if len(sys.argv) > 2 else 0

    load1 = round(os.getloadavg()[0], 2)
    out: dict[str, dict[str, float]] = {}
    for name in only:
        n = reps or (5 if name in CORE_R5 or name in HEADLINE else 3)
        runs = []
        for _ in range(n):
            t0 = time.perf_counter()
            registry[name](spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
        out[name] = {
            "med": round(sorted(runs)[len(runs) // 2], 4),
            "min": round(min(runs), 4),
        }
        print(f"{name}: med={out[name]['med']} min={out[name]['min']}")
    total_med = round(sum(v["med"] for v in out.values()), 4)
    total_min = round(sum(v["min"] for v in out.values()), 4)
    print(json.dumps({"load1_start": load1, "total_med": total_med,
                      "total_min": total_min,
                      "load1_end": round(os.getloadavg()[0], 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
