"""Config-driven operator pipelines — the reference's function-chain
router (A22: a stream config's ``functions`` list decides which StateFun
transforms a message flows through, ingester.go:1600-1650) generalized to
the curation/dedup operator library: a JSON-able list of steps becomes a
composed DataFrame pipeline, so a data-curation recipe is DATA (stored,
diffed, reviewed) rather than code.

Spec format — a list of {"op": name, ...params}:

    [
      {"op": "quality_filter", "min_tokens": 5},
      {"op": "exact_dedup", "subset": ["text"]},
      {"op": "stratified_sample", "group_cols": ["lang"], "per_group": 100},
      {"op": "chunk", "chunk_tokens": 64, "overlap": 8},
    ]

(`decontaminate` takes its eval set as an actual DataFrame param —
non-JSON params are allowed; the spec is then partially-data.)

Each step is pure DataFrame→DataFrame, so the whole pipeline stays ONE
lazy Catalyst plan — the optimizer sees across step boundaries (a later
step's column pruning reaches the scan; filters combine), which a
per-step-materializing runner would forfeit.

``run_pipeline`` validates every step name/params up front (a typo fails
before any job runs, like the reference's config validation) and returns
the composed frame plus a human-readable lineage of applied steps.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _quality_filter(df: DataFrame, *, min_tokens: int = 5,
                    max_stopword_ratio: float = 0.5,
                    min_distinct_ratio: float = 0.3,
                    text_col: str = "text") -> DataFrame:
    from rtdl_spark.functions.text import (
        distinct_token_ratio,
        stopword_ratio,
        token_count,
    )

    t = F.col(text_col)
    return df.filter(
        (token_count(t) >= min_tokens)
        & (stopword_ratio(t) <= max_stopword_ratio)
        & (distinct_token_ratio(t) >= min_distinct_ratio)
    )


def _exact_dedup(df: DataFrame, *, subset: list[str],
                 id_col: str = "doc_id") -> DataFrame:
    # row_number-over-key (lowest id wins), NOT orderBy+dropDuplicates:
    # Spark gives no survivor guarantee across the dedup shuffle, and a
    # pre-sort would add a useless global sort exchange while still
    # leaving the output nondeterministic — which would break the
    # config-as-data reproducibility contract of spec pipelines.
    w = Window.partitionBy(*subset).orderBy(id_col)
    return (
        df.withColumn("_xd_rk", F.row_number().over(w))
        .filter(F.col("_xd_rk") == 1)
        .drop("_xd_rk")
    )


def _fingerprint_dedup(df: DataFrame, *, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    from pyspark.sql import Window

    from rtdl_spark.functions.text import fingerprint

    w = Window.partitionBy(fingerprint(F.col(text_col))).orderBy(id_col)
    return (
        df.withColumn("_fp_rk", F.row_number().over(w))
        .filter(F.col("_fp_rk") == 1)
        .drop("_fp_rk")
    )


def _decontaminate(df: DataFrame, *, eval_df: DataFrame,
                   text_col: str = "text", n: int = 5,
                   id_col: str = "doc_id") -> DataFrame:
    from rtdl_spark.operators.curation import decontaminate

    return decontaminate(df, eval_df, n=n, id_col=id_col, text_col=text_col)


def _stratified_sample(df: DataFrame, *, group_cols: list[str],
                       per_group: int, id_col: str = "doc_id") -> DataFrame:
    from rtdl_spark.operators.curation import stratified_take

    return stratified_take(df, group_cols, per_group, id_col=id_col)


def _chunk(df: DataFrame, *, chunk_tokens: int = 64, overlap: int = 8,
           id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    from rtdl_spark.operators.curation import chunk_documents

    return chunk_documents(
        df, chunk_tokens=chunk_tokens, overlap=overlap,
        id_col=id_col, text_col=text_col,
    )


def _filter_expr(df: DataFrame, *, where: str) -> DataFrame:
    return df.filter(F.expr(where))


def _select(df: DataFrame, *, cols: list[str]) -> DataFrame:
    return df.select(*cols)


OPS: dict[str, Callable[..., DataFrame]] = {
    "quality_filter": _quality_filter,
    "exact_dedup": _exact_dedup,
    "fingerprint_dedup": _fingerprint_dedup,
    "decontaminate": _decontaminate,
    "stratified_sample": _stratified_sample,
    "chunk": _chunk,
    "filter": _filter_expr,
    "select": _select,
}


def validate_pipeline(spec: list[dict[str, Any]]) -> list[str]:
    """Check every step before running anything; returns the op names in
    order. Raises ValueError on an unknown op or unknown parameter —
    config typos fail at submit time, not halfway through a 100 TB run."""
    import inspect

    names = []
    for i, step in enumerate(spec):
        if "op" not in step:
            raise ValueError(f"step {i}: missing 'op'")
        name = step["op"]
        if name not in OPS:
            raise ValueError(
                f"step {i}: unknown op {name!r}; known: {sorted(OPS)}"
            )
        sig = inspect.signature(OPS[name])
        params = {k for k in sig.parameters if k != "df"}
        required = {
            k
            for k, p in sig.parameters.items()
            if k != "df" and p.default is inspect.Parameter.empty
            and p.kind is inspect.Parameter.KEYWORD_ONLY
        }
        given = set(step) - {"op"}
        unknown = given - params
        if unknown:
            raise ValueError(
                f"step {i} ({name}): unknown params {sorted(unknown)}; "
                f"accepted: {sorted(params)}"
            )
        missing = required - given
        if missing:
            raise ValueError(
                f"step {i} ({name}): missing required {sorted(missing)}"
            )
        names.append(name)
    return names


def run_pipeline(
    df: DataFrame, spec: list[dict[str, Any]]
) -> tuple[DataFrame, list[str]]:
    """Validate, then fold the steps over ``df``. Lazy — the returned
    frame is one composed plan; nothing executes here."""
    lineage = validate_pipeline(spec)
    out = df
    for step in spec:
        kwargs = {k: v for k, v in step.items() if k != "op"}
        out = OPS[step["op"]](out, **kwargs)
    return out, lineage
