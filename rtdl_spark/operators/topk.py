"""Per-group top-k via partial (map-side) pruning — the scale path for
the "top k per key" pattern.

The textbook plan (row_number window + filter, queries/windows.py::
win_topk_orders_per_group) shuffles EVERY row to its group's reducer and
sorts the whole group just to keep k of them. At 100 TB that shuffle is
the job. This operator prunes first: each input partition keeps its own
local top-k per group (bounded memory, zero shuffle), so the exchange
feeding the final window moves at most k × n_partitions rows per group —
independent of the table size. Same trick Spark itself applies to global
ORDER BY ... LIMIT (TakeOrderedAndProject), generalized to per-group.

The local prune runs in mapInPandas (Arrow-batched; a batch split only
ever keeps a superset, never loses a candidate); the finalist set is then
small enough that the exact window is trivial.
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
) -> DataFrame:
    """Exact top-k rows per group, with a deterministic tiebreak.

    Output = input columns + ``rk`` (1-based rank within the group by
    ``order_col`` then ``tiebreak``). Equivalent to the row_number-window
    plan; cheaper because of the map-side prune.
    """
    tiebreak = tiebreak or []
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

    finalists = df.mapInPandas(local_prune, df.schema)

    order = [
        F.col(order_col).asc() if ascending else F.col(order_col).desc(),
        *[F.col(c).asc() for c in tiebreak],
    ]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        finalists.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )
