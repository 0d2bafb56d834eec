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
# canaries span >= 8 categories, and every rotation slot is either absent
# from all prior rounds' served sets OR its most recent driver row was
# RED (r5 amendment per the r4 verdict: the never-served-only rule
# structurally barred re-serving a fixed query whose last external word
# was FAIL — red-latest names are now required back in the head until a
# green row supersedes them).
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

# Round-10 rotation (r9 verdict item 3): the 9 never-served
# oracle-backed queries lead — 6 lake surfaces added mid-r9 after that
# head was pinned, the two ML entries whose bound-style oracles arrived
# mid-r9 (sim_pca_projection, ml_logreg_quality_filter), and the
# r10-new lake_delta_merge_clauses. The remaining 29 slots continue
# staleness-first: the r3 cohort (38 queries, stalest greens) is
# bigger than the space, so its first 29 serve now and the tail leads
# r11 (the freshness test's tie-split sanctions exactly this).
ROTATION: tuple[str, ...] = (
    "lake_delta_alter_properties",
    "ml_logreg_quality_filter",
    "sim_pca_projection",
    "lake_delta_alter_schema",
    "lake_delta_shallow_clone",
    "lake_delta_create_ddl",
    "lake_delta_data_skipping",
    "lake_delta_sql_surface",
    "lake_delta_merge_clauses",
    "agg_rollup_flag_status",
    "agg_grouping_sets",
    "agg_percentiles",
    "agg_weighted_median",
    "dedup_exact_by_source",
    "dedup_span_exact",
    "graph_kcore_docs",
    "dedup_er_pipeline",
    "join_full_outer_nation_presence",
    "join_semi_customers_with_f_orders",
    "join_anti_parts_never_ordered",
    "join_asof_last_order",
    "join_interval_attribution",
    "setop_union_by_name_drift",
    "json_variant_extract",
    "lake_profile_orders",
    "source_csv_roundtrip",
    "lake_versioned_diff",
    "scalar_pii_mask",
    "scalar_partition_buckets",
    "message_type_resolution",
    "sim_allpairs_blocked",
    "sim_hybrid_rrf",
    "sql_recursive_cte",
    "text_decontaminate",
    "text_bm25_search",
    "text_sequence_packing",
    "multimodal_phash_near_dup",
    "ml_auc_rank_sum",
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
        bpe,
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
