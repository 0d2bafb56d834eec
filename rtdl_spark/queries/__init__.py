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

# Round-8 rotation (r7 verdict item 2): this rotation DRAINS the
# never-served pool — the r7-new Delta DML/identity/CM surface leads
# (dv_delete/dv_update/generated_cols/identity/cm_lifecycle), then the
# r8-new SYNC IDENTITY query, the readChangeFeed streaming lane, the
# two remaining sim entries, the whole text_* tail and the last three
# win_* entries. After this round every oracle-backed query in the
# registry has an external correctness row (the 4 rows-only entries
# are structurally excluded: the head must be oracle-backed).
ROTATION: tuple[str, ...] = (
    "lake_delta_dv_delete",
    "lake_delta_dv_update",
    "lake_delta_generated_cols",
    "lake_delta_identity",
    "lake_delta_cm_lifecycle",
    "lake_delta_identity_sync",
    "stream_exec_cdf_source",
    "sim_quantized_topk",
    "sim_negative_samples_within_label",
    "text_lang_id_heuristic",
    "text_top_bigrams",
    "text_bpe_token_counts",
    "text_curation_pipeline",
    "text_stratified_sample",
    "text_repetition_signals",
    "text_chunking",
    "text_mixture_sample",
    "text_unigram_logprob",
    "text_corpus_prep_pipeline",
    "text_contamination_overlap",
    "text_distinctive_terms",
    "text_train_val_test_split",
    "text_temperature_mixture",
    "text_domain_policy",
    "text_exact_k_sample",
    "text_row_id_assignment",
    "text_adaptive_quality_filter",
    "text_negative_samples",
    "text_curriculum_shards",
    "text_vocab_coverage",
    "text_weighted_sample",
    "text_bigram_logprob",
    "text_index_bm25",
    "text_pii_audit",
    "text_url_canonical",
    "win_rolling_distinct_users",
    "win_forecast_mase",
    "win_longest_streak",
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
