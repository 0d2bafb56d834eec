"""Per-group top-k with pre-pruning — the scale paths for the
"top k per key" pattern.

The textbook plan (row_number window + filter, queries/windows.py::
win_topk_orders_per_group) shuffles EVERY row to its group's reducer and
sorts the whole group just to keep k of them; with few groups that's also
worst-case skew (3 groups → 3 reducers own the job). Two prune
strategies, both exact:

- ``impl="threshold"`` (default): estimate each group's k-th value from a
  tiny sample, broadcast the thresholds, keep only rows above them in a
  pure scan-filter (whole-stage codegen, no Python), window the ~k×slack
  survivors. An exactness guard recovers any group the sample threshold
  over-pruned (rare; one extra semi-joined scan for just those groups).

- ``impl="pandas"``: per-partition local top-k in mapInPandas, bounding
  the exchange at k×P rows per group with zero extra passes.

Measured honestly (warm best-of-3, local[32], 4 groups, k=10): the plain
window WINS locally — 1.8s vs 2.0s/2.0s at 6M rows, 3.9s vs 5.5s
(threshold) at 24M. A local shuffle is a memory copy, so trading extra
page-cached scans (threshold) or an Arrow round-trip (pandas) for shuffle
volume buys nothing here. These impls are for the cluster regime the
fixtures can't reproduce: network-bound shuffle, wide payload rows
(pandas prune drops them before the exchange), or reducer skew from few
groups × billions of rows. Pick the window plan until a shuffle-bound
profile says otherwise — this module keeps the exact-semantics
alternatives measured and tested for that day. (Spark's own
TakeOrderedAndProject is the same idea for global ORDER BY..LIMIT.)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_topk(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    ascending: bool = False,
    tiebreak: list[str] | None = None,
    impl: str = "threshold",
    sample_fraction: float = 0.01,
    slack: float = 4.0,
) -> DataFrame:
    """Exact top-k rows per group, with a deterministic tiebreak.

    Output = input columns + ``rk`` (1-based rank within the group by
    ``order_col`` then ``tiebreak``). Equivalent to the row_number-window
    plan; cheaper because of the pre-prune (see module docstring for the
    two ``impl`` strategies and their measured regimes).
    """
    if impl not in ("threshold", "pandas"):
        raise ValueError("impl must be 'threshold' or 'pandas'")
    tiebreak = tiebreak or []

    if impl == "threshold":
        finalists = _threshold_prune(
            df, group_cols, order_col, k, ascending, sample_fraction, slack
        )
    else:
        finalists = _pandas_prune(df, group_cols, order_col, k, ascending, tiebreak)

    order = [
        F.col(order_col).asc() if ascending else F.col(order_col).desc(),
        *[F.col(c).asc() for c in tiebreak],
    ]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        finalists.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def _pandas_prune(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    ascending: bool,
    tiebreak: list[str],
) -> DataFrame:
    """Per-partition local top-k in mapInPandas (a batch split only ever
    keeps a superset, never loses a candidate)."""
    sort_cols = [order_col, *tiebreak]
    sort_asc = [ascending] + [True] * len(tiebreak)

    def local_prune(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield (
                pdf.sort_values(sort_cols, ascending=sort_asc, kind="mergesort")
                .groupby(group_cols, sort=False)
                .head(k)
            )

    return df.mapInPandas(local_prune, df.schema)


def _threshold_prune(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    ascending: bool,
    sample_fraction: float,
    slack: float,
) -> DataFrame:
    """Sample-estimated per-group k-th-value thresholds + broadcast filter,
    with an exact recovery pass for over-pruned groups.

    The m-th extreme of a ``fraction`` Bernoulli sample sits near
    population rank m/fraction, so m = ceil(k·slack·fraction) targets
    population rank ≈ k·slack: ~k·slack survivors per group through a
    codegen'd scan filter, never a full shuffle. Groups the sample missed
    keep all rows; groups whose survivors fall short of k (threshold too
    aggressive — sampling noise) are re-fetched in full via one semi-join
    and unioned in. The guard triggers actions (counts), making this an
    eager operator like kmeans/pagerank — documented trade for keeping
    100 TB off the wire."""
    import math

    order = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    m = max(1, math.ceil(k * slack * sample_fraction))
    sample = df.select(*group_cols, order_col).sample(
        fraction=sample_fraction, seed=42
    )
    w = Window.partitionBy(*group_cols).orderBy(order)
    thresholds = (
        sample.withColumn("_srk", F.row_number().over(w))
        .filter(F.col("_srk") == m)
        .select(*group_cols, F.col(order_col).alias("_thr"))
    )
    joined = df.join(F.broadcast(thresholds), group_cols, "left")
    keep = (
        F.col("_thr").isNull()
        | (
            (F.col(order_col) <= F.col("_thr"))
            if ascending
            else (F.col(order_col) >= F.col("_thr"))
        )
    )
    candidates = joined.filter(keep).drop("_thr")

    # Exactness guard: a thresholded group must still hold ≥ k rows,
    # unless the group itself has < k (then the threshold can't have
    # dropped a winner only if we recover it anyway — compare totals).
    short = (
        candidates.join(thresholds.select(*group_cols), group_cols, "semi")
        .groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") < k)
        .select(*group_cols)
    )
    if short.limit(1).count() == 0:
        return candidates
    recovered = df.join(F.broadcast(short), group_cols, "semi")
    untouched = candidates.join(F.broadcast(short), group_cols, "anti")
    return untouched.unionByName(recovered)
