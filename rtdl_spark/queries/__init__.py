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

# Round-7 rotation (r6 verdict item 1): the r6-new surface with no
# external row yet leads — table_changes, RESTORE, the stream-stream
# interval join, the whole BPE tokenizer family and the upgraded
# phrase-mining oracle — then a round-robin spread over the remaining
# never-served pool (join/json/lake/ml/multimodal/scalar/setop/sim/sql/
# text/win/x families). 65-name pool at rotation time -> ~2 rounds to
# full external coverage.
ROTATION: tuple[str, ...] = (
    "lake_delta_table_changes",
    "lake_delta_restore",
    "lake_delta_dv_read",
    "lake_delta_cm_write",
    "lake_delta_ict_history",
    "lake_delta_cdf",
    "stream_exec_interval_join",
    "text_bpe_train_merges",
    "text_bpe_vocab_tokens",
    "text_bpe_doc_tokens",
    "text_bpe_vocabulary",
    "text_phrase_mining",
    "join_hint_shuffle_hash",
    "json_roundtrip_stats",
    "lake_outlier_report",
    "ml_calibration_bins",
    "multimodal_image_png_ahash",
    "scalar_url_parse",
    "setop_distinct_pairs",
    "sim_rp_lsh_topk",
    "sql_pipe_syntax",
    "win_nth_value_ignore_nulls",
    "x_knn_graph_full",
    "join_temporal_validity",
    "lake_constraint_audit",
    "ml_calibration_ece",
    "scalar_bitwise_funcs",
    "sim_quantization_error",
    "sql_parameterized",
    "win_time_range_frame",
    "x_knn_graph_ivf_full",
    "join_inequality_bnl",
    "ml_chi2_keywords",
    "sql_collation_compare",
    "win_session_paths",
    "x_image_ahash_full",
    "ml_pr_curve_quality",
    "sim_semantic_dedup",
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
