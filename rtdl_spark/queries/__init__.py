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
# registration order and may stop after the first ~50 entries.  This head
# list pins that window to a curated sample of EVERY category — TPC-H,
# aggregates, joins, windows, scalars, UDF lanes, set ops, ingest, JSON,
# Spark-4 SQL, dedup, graph, similarity, text, multimodal, lake, sources,
# ML eval — all oracle-backed and cheap at sf0.01, so the hard external
# signal covers the whole surface instead of whichever module imports
# first.  tests/test_queries_oracle.py enforces the invariants (every head
# name exists, has an oracle, and the head spans >= 8 categories).
DRIVER_HEAD: tuple[str, ...] = (
    # TPC-H core shapes (scan+agg, 6-join, profit rollup, semi-ish, top-k)
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "q9_product_type_profit",
    "q14_promo_revenue_share",
    "q18_large_volume_customer",
    # aggregates
    "agg_stats_by_returnflag",
    "agg_rollup_flag_status",
    "agg_grouping_sets",
    "agg_percentiles",
    "agg_weighted_median",
    # joins
    "join_inner_segment_revenue",
    "join_full_outer_nation_presence",
    "join_semi_customers_with_f_orders",
    "join_anti_parts_never_ordered",
    "join_asof_last_order",
    "join_interval_attribution",
    # windows / event analytics
    "win_topk_orders_per_segment",
    "win_running_revenue",
    "win_tumbling_5min",
    "win_session_30min",
    "win_funnel_conversion",
    "win_ohlc_resample",
    # scalar function families + UDF lane
    "scalar_string_funcs",
    "scalar_pii_mask",
    "scalar_partition_buckets",
    "udaf_grouped_mad",
    # set ops + ingest routing
    "setop_union_by_name_drift",
    "message_type_resolution",
    # JSON / VARIANT
    "json_from_json_struct",
    "json_variant_extract",
    # Spark-4 SQL surface
    "sql_recursive_cte",
    "sql_group_by_all",
    # dedup (§2C)
    "dedup_exact_by_source",
    "dedup_minhash_lsh",
    "dedup_span_exact",
    "dedup_er_pipeline",
    # graph
    "graph_kcore_docs",
    # similarity (§2C)
    "sim_cosine_topk",
    "sim_allpairs_blocked",
    "sim_hybrid_rrf",
    # text / curation (§2C)
    "text_quality_scores",
    "text_bm25_search",
    "text_sequence_packing",
    "text_decontaminate",
    # multimodal (§2C)
    "multimodal_binary_stats",
    "multimodal_phash_near_dup",
    # lake ops + sources
    "lake_profile_orders",
    "lake_versioned_diff",
    "source_csv_roundtrip",
    # ML eval
    "ml_auc_rank_sum",
)


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
        text,
        tpch,
        tpch2,
        udfs,
        windows,
    )
