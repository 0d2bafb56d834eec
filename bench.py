"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed end-to-end (plan + execute + collect-to-count) after a
shared session warm-up, which matches how a user would experience latency.

MEASUREMENT DISCIPLINE (r6 verdict item, encoded): take the OFFICIAL
per-round number FIRST in a session — before driver_sim sweeps, soaks, or
any other Spark run — and treat a run whose load1_start is elevated as
noise, not signal. Measured twice now (r6 idle datapoint, r7 back-to-back
runs): scan-heavy TPC-H entries inflate up to 2x purely from preceding
I/O load while CPU-bound entries (x_ingest_*, x_knn_*) stay flat; the
queries_min map is the noise-resistant comparison basis.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = (
    # TPC-H core: scan-agg, join+topk, 6-way join, pure filter-agg,
    # multi-join profit rollup, aggregate-subquery semi join
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q9_product_type_profit",
    "q18_large_volume_customer",
    # LLM-pipeline extensions: MinHash+LSH near-dup, embedding ANN,
    # text quality scoring, window analytics, C4 span dedup,
    # training-sequence packing
    "dedup_minhash_lsh",
    "sim_cosine_topk",
    "text_quality_scores",
    "win_running_revenue",
    "dedup_span_exact",
    "text_sequence_packing",
    # ANN scale path (IVF cells prune rows, PQ codes prune bytes) and
    # curriculum export (bucket-offset global rank, no single-task sort)
    "sim_ivf_pq_topk",
    "text_curriculum_shards",
    # time-series candle (single-aggregate OHLC) and rank statistics
    # (tie-corrected Spearman over value-binned ranks)
    "win_ohlc_resample",
    "agg_spearman_corr",
)

# The exact 20-entry set BENCH_r03 timed (16 headline + 4 x_ twins as of
# round 3) — frozen so core_r3_sec stays comparable across future rounds
# even as HEADLINE grows.
CORE_R3 = HEADLINE + (
    "x_allpairs_blocked_full",
    "x_ingest_json_replay",
    "x_ingest_pinned_replay",
    "x_knn_graph_full",
)

# The exact 22-entry set BENCH_r04 timed (core_r3 + the two r4 twins) —
# frozen for the same one-field round-over-round comparison.
CORE_R4 = CORE_R3 + (
    "x_image_ahash_full",
    "x_knn_graph_ivf_full",
)

# The exact 23-entry set of round 5 (core_r4 + the native-Delta lifecycle
# twin) — frozen so round 6 compares one field.
CORE_R5 = CORE_R4 + (
    "x_delta_lifecycle_full",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from rtdl_spark.queries import all_queries
    from rtdl_spark.session import get_spark

    spark = get_spark("rtdl_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    registry = all_queries()
    names = [n for n in HEADLINE if n in registry] + [
        n for n in sorted(registry) if n.startswith("x_") and n not in HEADLINE
    ]

    # Warm up the JVM + parquet footers + OS page cache once so per-query
    # times measure the query, not session startup / first-touch IO.
    from rtdl_spark.catalog import TABLES, table

    for t in TABLES:
        table(spark, sf_dir, t).count()
    registry["q6_forecast_revenue"](spark, sf_dir).count()

    # Median of 3 runs per query: single-run numbers on a shared machine
    # mix in page-cache and contention noise, which would read as phantom
    # regressions in round-over-round comparisons.  The per-query MIN is
    # reported alongside: on a contended box the min is the least-load-
    # biased estimate, so a loaded-run artifact is self-diagnosing
    # (BENCH_r03 read 1.3-3x high under external tenant load).
    load1_start = round(os.getloadavg()[0], 2)
    timings: dict[str, float] = {}
    timings_min: dict[str, float] = {}
    for name in names:
        # min-of-5 on the headline core (r4-brief bench hygiene: at ~10
        # loadavg the median-of-3 produced two false regression alarms),
        # 3 reps for the heavier x_ twins; "median" = middle of 5 / 3.
        reps = 5 if name in CORE_R4 else 3
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            registry[name](spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(sorted(runs)[len(runs) // 2], 4)
        timings_min[name] = round(min(runs), 4)
    load1_end = round(os.getloadavg()[0], 2)

    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None
    # Round-over-round hygiene: stable cores are reported as their own
    # subtotals so growing the headline set can never mask a regression on
    # carried-over queries (compare core16_sec / core_r3_sec across
    # BENCH_r*.json).  core_r3 pins the exact 20-entry set BENCH_r03 timed.
    core16 = [n for n in HEADLINE[:16] if n in timings]
    core_r3 = [n for n in CORE_R3 if n in timings]
    core_r4 = [n for n in CORE_R4 if n in timings]
    core_r5 = [n for n in CORE_R5 if n in timings]
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_sec",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "queries_min": timings_min,
                "core16_sec": round(sum(timings[n] for n in core16), 4),
                "core_r3_sec": round(sum(timings[n] for n in core_r3), 4),
                "core_r4_sec": round(sum(timings[n] for n in core_r4), 4),
                "core16_min_sec": round(
                    sum(timings_min[n] for n in core16), 4
                ),
                "core_r3_min_sec": round(
                    sum(timings_min[n] for n in core_r3), 4
                ),
                "core_r4_min_sec": round(
                    sum(timings_min[n] for n in core_r4), 4
                ),
                "core_r5_sec": round(sum(timings[n] for n in core_r5), 4),
                "core_r5_min_sec": round(
                    sum(timings_min[n] for n in core_r5), 4
                ),
                "load1_start": load1_start,
                "load1_end": load1_end,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
