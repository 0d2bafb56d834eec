"""Exactly-once foreachBatch: an epoch commit log for non-transactional
sinks.

Structured Streaming checkpoints source offsets, but a foreachBatch sink
can still see the SAME epoch twice (failure after the sink ran but before
the offset commit; checkpoint restore; manual replay). The reference
claims exactly-once only on its Kafka egress via transactions
(pii-detection/module.yaml:26-28); for lake appends the standard pattern
is the one here: record every completed epoch in a commit log and make
the sink skip epochs it has already fully applied.

Scope and honesty: the marker protects against *re-delivery* of a
completed epoch — the dominant real-world duplicate source. A batch that
died MID-write leaves no marker and will be re-run; for that to be safe
the write itself must be a per-epoch overwrite (idempotent by layout —
see streaming/jobs.py::stream_dedup_clusters) or a transactional sink
(Delta ``txnAppId``/``txnVersion``). Plain parquet *append* + commit log
is at-least-once under mid-write crashes, exactly-once under re-delivery;
both properties are tested.

The log itself is a directory of zero-byte ``<epoch>.done`` markers
written through the Hadoop FS API (sources/fsutil.py) so it works on
object stores, where os.path would silently report nothing-there.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from rtdl_spark.sources import fsutil


class CommitLog:
    def __init__(self, spark: SparkSession, log_dir: str):
        self.spark = spark
        self.log_dir = log_dir

    def _marker(self, epoch_id: int) -> str:
        return f"{self.log_dir}/{epoch_id}.done"

    def contains(self, epoch_id: int) -> bool:
        return fsutil.exists(self.spark, self._marker(epoch_id))

    def mark(self, epoch_id: int) -> None:
        fsutil.touch(self.spark, self._marker(epoch_id))

    def committed_epochs(self) -> list[int]:
        if not fsutil.exists(self.spark, self.log_dir):
            return []
        return sorted(
            int(n[: -len(".done")])
            for n in fsutil.list_names(self.spark, self.log_dir)
            if n.endswith(".done")
        )


def idempotent_sink(
    sink: Callable[[DataFrame, int], None], log: CommitLog
) -> Callable[[DataFrame, int], None]:
    """Wrap a foreachBatch sink so each epoch applies at most once."""

    def wrapped(batch_df: DataFrame, epoch_id: int) -> None:
        if log.contains(epoch_id):
            return
        sink(batch_df, epoch_id)
        log.mark(epoch_id)

    return wrapped
