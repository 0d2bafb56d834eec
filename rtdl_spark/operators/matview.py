"""Incrementally maintained materialized aggregate views over a
VersionedTable — the lakehouse MV refresh loop, composed from two existing
primitives: the versioned table's commit log says WHICH rows are new, and
``merge_aggregates`` folds their (tiny) partial aggregate into the
persisted rollup.

Refresh cost therefore tracks the DELTA, not the table: appending a batch
to a 100 TB fact table and refreshing a rollup re-reads only that batch's
version directories. An ``overwrite`` commit invalidates the increment
(rows may have vanished), so refresh falls back to one full recompute —
the same rule Delta/materialized-view engines apply when the source
history is rewritten.

State layout (all control-plane via sources/fsutil — object-store-safe):
  <dir>/state_v=<K>/   the rollup as of source version K (parquet)
  <dir>/_mv_commits/<K>.done   marker: state_v=K is complete

Marker-atomic like VersionedTable itself: a crashed refresh leaves a
half-written state dir that is never read; the next refresh redoes it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rtdl_spark.operators.merge import merge_aggregates
from rtdl_spark.operators.versioned import VersionedTable
from rtdl_spark.sources import fsutil

_COMMITS = "_mv_commits"


class MaterializedAggView:
    """A persisted groupBy-sum rollup of a VersionedTable, refreshed
    incrementally. ``sum_cols`` maps output column -> source expression
    (SQL string) summed per key; a row count ``n`` is always maintained,
    so averages derive downstream (sum/n) without extra state."""

    def __init__(
        self,
        source: VersionedTable,
        view_dir: str,
        keys: list[str],
        sum_cols: dict[str, str],
    ) -> None:
        self.source = source
        self.spark: SparkSession = source.spark
        self.root = view_dir.rstrip("/")
        self.keys = list(keys)
        self.sum_cols = dict(sum_cols)

    # -- state bookkeeping -------------------------------------------------
    def refreshed_version(self) -> int | None:
        """Latest source version the view has fully absorbed."""
        names = fsutil.list_names(self.spark, f"{self.root}/{_COMMITS}")
        vs = [int(n.split(".", 1)[0]) for n in names if n.endswith(".done")]
        return max(vs) if vs else None

    def frame(self) -> DataFrame:
        v = self.refreshed_version()
        if v is None:
            raise ValueError(f"view at {self.root} has no refreshed state")
        return self.spark.read.parquet(f"{self.root}/state_v={v}")

    # -- refresh -----------------------------------------------------------
    def _partial(self, rows: DataFrame) -> DataFrame:
        return rows.groupBy(*self.keys).agg(
            *[
                F.sum(F.expr(expr)).alias(out)
                for out, expr in self.sum_cols.items()
            ],
            F.count(F.lit(1)).alias("n"),
        )

    def refresh(self) -> int:
        """Bring the view up to the source's latest version; returns that
        version. Increment path when every new commit is an append;
        full recompute when an overwrite appeared (or first refresh)."""
        target = self.source.latest_version()
        if target is None:
            raise ValueError("source table has no committed versions")
        done = self.refreshed_version()
        if done == target:
            return target

        history = self.source.history()
        new_commits = [(v, k) for v, k in history if done is None or v > done]
        incremental = done is not None and all(
            k == "append" for _, k in new_commits
        )
        if incremental:
            delta = self.spark.read.option(
                "basePath", self.source.root
            ).parquet(
                *[f"{self.source.root}/v={v}" for v, _ in new_commits]
            ).drop("v")
            state = merge_aggregates(
                self.frame(),
                self._partial(delta),
                self.keys,
                list(self.sum_cols),
            )
        else:
            state = self._partial(self.source.snapshot(as_of=target))

        out = f"{self.root}/state_v={target}"
        state.write.mode("overwrite").parquet(out)
        fsutil.touch(self.spark, f"{self.root}/{_COMMITS}/{target}.done")
        return target

    def vacuum(self) -> None:
        """Drop all but the newest committed state generation."""
        keep = self.refreshed_version()
        names = fsutil.list_names(self.spark, self.root)
        for name in names:
            if name.startswith("state_v=") and name != f"state_v={keep}":
                v = name.split("=", 1)[1]
                if fsutil.exists(
                    self.spark, f"{self.root}/{_COMMITS}/{v}.done"
                ):
                    fsutil.delete(self.spark, f"{self.root}/{name}")
                    fsutil.delete(
                        self.spark, f"{self.root}/{_COMMITS}/{v}.done"
                    )
