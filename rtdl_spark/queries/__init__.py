"""Query registry: every operator from SURVEY.md §2 exposed as a named
(spark, sf_dir) -> DataFrame callable, with a matching DuckDB oracle SQL
string where the semantics are ANSI-SQL-expressible.

Modules self-register via the @query decorator at import time.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

# The driver's per-round correctness budget verifies queries() in
# registration order and may stop after the first ~50 entries.  Rounds 2-3
# pinned a fixed curated 50, which meant the SAME 50 got re-verified every
# round while ~150 registered queries never received an external
# correctness row.  The head is now CANARIES (a fixed one-per-category
# smoke set, cheap at sf0.01) + ROTATION (slots refilled each round from
# the pool of oracle-backed queries that have never had a driver
# correctness row — the served history lives in DRIVER_SERVED.json at the
# repo root, appended each round).  tests/test_queries_oracle.py enforces
# the invariants: head == first 50 registered, every entry oracle-backed,
# canaries span >= 8 categories, and every rotation slot is absent from
# all prior rounds' served sets.
CANARIES: tuple[str, ...] = (
    "q1_pricing_summary",        # TPC-H scan+agg
    "agg_stats_by_returnflag",   # aggregates
    "join_inner_segment_revenue",  # joins
    "win_running_revenue",       # windows
    "scalar_string_funcs",       # scalar fns
    "udaf_grouped_mad",          # UDF/UDAF lane
    "json_from_json_struct",     # JSON
    "sql_group_by_all",          # Spark-4 SQL
    "dedup_minhash_lsh",         # dedup (§2C)
    "sim_cosine_topk",           # similarity (§2C)
    "text_quality_scores",       # text (§2C)
    "multimodal_binary_stats",   # multimodal (§2C)
)

# Round-4 rotation: 38 never-driver-verified, oracle-backed queries —
# the 17 remaining TPC-H, the window bulk, the scalar families, and one
# each from the smaller never-served pools.
ROTATION: tuple[str, ...] = (
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_national_market_share",
    "q10_returned_items",
    "q11_important_stock",
    "q12_priority_shipping",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q19_theta_or_predicates",
    "q20_promo_part_suppliers",
    "q21_waiting_suppliers",
    "q22_global_sales_opportunity",
    "win_rank_parts_by_price",
    "win_lag_lead_order_gaps",
    "win_moving_avg_3",
    "win_range_frame_price_band",
    "win_ntile_customer_quartiles",
    "win_sliding_10min_5min",
    "win_percent_rank_cume_dist",
    "win_gaps_islands_sessions",
    "win_ewma_bounded",
    "win_cohort_retention",
    "scalar_regexp_funcs",
    "scalar_date_funcs",
    "scalar_math_funcs",
    "scalar_json_funcs",
    "scalar_array_funcs",
    "scalar_map_funcs",
    "scalar_try_funcs",
    "agg_collect_sorted_lists",
    "setop_multiset_ops",
    "join_null_safe_eq",
    "sim_ivf_topk",
)

DRIVER_HEAD: tuple[str, ...] = CANARIES + ROTATION


def query(name: str, oracle: str | None = None):
    """Register a query; ``oracle`` is the DuckDB-dialect equivalent SQL.

    Parity rules (so the driver's row-count + schema + value-hash compare
    passes):
    - alias every computed column identically on both sides;
    - money aggregates go through DECIMAL casts (exact, engine-independent)
      and are cast back to DOUBLE at the end;
    - genuinely floating results (avg/stddev/corr/cosine) are rounded to a
      fixed scale on BOTH sides;
    - no SELECT *: stable explicit projections only.
    """

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _head_ordered(d: dict) -> dict:
    """Reorder ``d`` so DRIVER_HEAD names come first (in head order),
    followed by the remaining entries in registration order."""
    head = {n: d[n] for n in DRIVER_HEAD if n in d}
    tail = {n: v for n, v in d.items() if n not in head}
    return {**head, **tail}


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _import_all()
    return _head_ordered(QUERIES)


def all_oracles() -> dict[str, str]:
    _import_all()
    return _head_ordered(ORACLE)


def _import_all() -> None:
    from rtdl_spark.queries import (  # noqa: F401
        aggregates,
        dedup,
        joins,
        json_schema,
        lake,
        mleval,
        scalars,
        similarity,
        sqltext,
        streaming_exec,
        text,
        tpch,
        tpch2,
        udfs,
        windows,
    )
