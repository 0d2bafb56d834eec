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

# Round-9 rotation (r8 verdict item 1): the 5 remaining never-served
# oracle-backed queries (the lake surface added mid-r8 after that head
# was pinned) CLOSE external coverage — after their rows land, every
# oracle-backed query in the registry has a driver correctness row.
# The other 33 slots inaugurate the STALENESS-REFRESH rule: with the
# never-served pool drained, slots refill stalest-first, and the
# entire r2 cohort (33 queries, 6 rounds since their last external
# row) is exactly 33 — so r9 re-serves all of it. The freshness test
# now enforces stalest-first instead of never-served-only.
ROTATION: tuple[str, ...] = (
    "lake_delta_v2_checkpoint",
    "lake_delta_row_tracking",
    "lake_delta_invariants",
    "lake_delta_cdf_dv_restore",
    "lake_delta_clustered_optimize",
    "agg_count_distinct_by_priority",
    "agg_cube_status_priority",
    "agg_having_filter",
    "agg_statistical_moments",
    "agg_pivot_status_by_priority",
    "agg_distinct_sum",
    "agg_unpivot_part_metrics",
    "agg_regression_stats",
    "agg_boolean_funcs",
    "agg_listagg_ordered",
    "agg_spearman_corr",
    "agg_median_mode",
    "agg_crosstab_chi2",
    "dedup_fingerprint_groups",
    "dedup_jaccard_bruteforce",
    "dedup_simhash_profile",
    "dedup_ngram_token_jaccard",
    "dedup_embedding_cosine",
    "text_winnow_profile",
    "dedup_winnow_overlap_pairs",
    "dedup_cluster_assignment",
    "dedup_incremental_clusters",
    "dedup_incremental_against_corpus",
    "dedup_fuzzy_source_pairs",
    "dedup_incremental_bloom",
    "dedup_source_overlap_matrix",
    "dedup_survivorship_policy",
    "graph_triangle_count",
    "graph_clustering_coefficients",
    "dedup_weighted_keepers",
    "join_left_outer_orderless",
    "join_right_outer_nation_suppliers",
    "join_cross_region_status",
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
