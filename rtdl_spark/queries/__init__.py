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

# Round-5 rotation: the 3 red-latest approx aggregates (fixed in r3,
# re-served under the amended invariant so the ledger's only FAILs get
# green rows), the first-ever streaming-EXECUTED entries, the newly
# oracle-backed ML pair (kmeans exact-replay unroll + logreg exact step),
# the never-served lake-maintenance family, the r4-new multimodal
# image/video/audio oracles, the PQ/IVF-PQ/kNN-graph similarity bulk,
# and one each from the smaller never-served pools.
ROTATION: tuple[str, ...] = (
    "agg_approx_count_distinct",
    "agg_approx_percentiles",
    "agg_freq_items",
    "stream_exec_tumbling_counts",
    "stream_exec_ohlc_candles",
    "stream_exec_session_counts",
    "ml_kmeans_embeddings",
    "ml_logreg_exact_step",
    "lake_delete_by_keys",
    "lake_hll_sketch_rollup",
    "lake_snapshot_diff",
    "lake_incremental_rollup",
    "lake_histogram_price",
    "lake_footer_stats",
    "multimodal_image_resize",
    "multimodal_image_ahash",
    "multimodal_video_frames",
    "multimodal_audio_segments",
    "multimodal_dedup_clusters",
    "sim_pq_topk",
    "sim_ivf_pq_topk",
    "sim_index_ivf_pq",
    "sim_mmr_rerank",
    "sim_knn_graph",
    "sim_knn_graph_ivf",
    "sim_mutual_knn_clusters",
    "graph_pagerank_docs",
    "join_broadcast_nation_rollup",
    "join_range_part_size_pairs",
    "json_tuple_extract",
    "scalar_pii_mask_extended",
    "setop_intersect_nations",
    "source_python_datasource",
    "sql_lateral_top_order",
    "text_quality_classifier",
    "text_training_shards",
    "udtf_tokenize_positions",
    "win_time_spine_gap_fill",
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
