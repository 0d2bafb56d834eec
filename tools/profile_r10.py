"""r10 optimization-round profiler.

Captures ``.explain("formatted")`` for every bench entry into
``plans/r10/<name>_<tag>.txt`` and (optionally) times each entry with the
exact bench methodology (count() after warm-up, min/median of N reps).

Usage:
  python tools/profile_r10.py plans <tag>          # capture plans only
  python tools/profile_r10.py time [reps]          # timings only (idle box!)
  python tools/profile_r10.py one <query> [reps]   # time one query
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CORE_R5, HEADLINE  # noqa: E402


def _bench_names(registry) -> list[str]:
    return [n for n in HEADLINE if n in registry] + [
        n for n in sorted(registry) if n.startswith("x_") and n not in HEADLINE
    ]


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "plans"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from rtdl_spark.queries import all_queries
    from rtdl_spark.session import get_spark

    spark = get_spark("rtdl_profile_r10")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    names = _bench_names(registry)

    if mode == "plans":
        tag = sys.argv[2] if len(sys.argv) > 2 else "before"
        outdir = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "plans", "r10")
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
