"""Streaming observability: per-micro-batch progress as a queryable
DataFrame — throughput, batch durations, watermark, and state-store size.

At 100 TB/day an unmonitored stream fails quietly: state grows past
executor memory, watermark stalls, input rate outruns processing rate —
all visible in `StreamingQueryProgress` long before the job dies. The
reference has no observability at all (its per-message functions log to
stdout); this module turns the progress feed every Structured Streaming
query already emits into the same kind of table every other operator
produces, so lag dashboards are just Spark SQL.

Two capture paths:
- `progress_frame(spark, query)` — pull-based: converts the query's
  retained `recentProgress` (default last 100 batches) after/while it
  runs. Zero setup; bounded history.
- `ProgressLog` + `spark.streams.addListener(log)` — push-based: every
  progress event is appended as it happens (unbounded, survives past the
  retention window); `log.frame(spark)` yields the same schema.

Both are driver-side control-plane data (KBs per batch) — the metrics
never touch the executors' data path.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession

try:  # the listener API lives under pyspark.sql.streaming
    from pyspark.sql.streaming import StreamingQueryListener
except ImportError:  # pragma: no cover - very old pyspark
    StreamingQueryListener = object  # type: ignore[misc,assignment]

PROGRESS_SCHEMA = (
    "query_id string, run_id string, batch_id bigint, ts string, "
    "num_input_rows bigint, input_rows_per_sec double, "
    "processed_rows_per_sec double, batch_duration_ms bigint, "
    "watermark string, state_rows bigint, state_bytes bigint, "
    "sources int, sink string"
)


def _flatten(p: dict[str, Any]) -> tuple:
    """One StreamingQueryProgress JSON dict → one flat row."""
    dur = p.get("durationMs") or {}
    state_ops = p.get("stateOperators") or []
    ew = (p.get("eventTime") or {}).get("watermark")
    return (
        str(p.get("id", "")),
        str(p.get("runId", "")),
        int(p.get("batchId", -1)),
        str(p.get("timestamp", "")),
        int(p.get("numInputRows", 0) or 0),
        float(p.get("inputRowsPerSecond", 0.0) or 0.0),
        float(p.get("processedRowsPerSecond", 0.0) or 0.0),
        int(dur.get("triggerExecution", 0) or 0),
        str(ew) if ew is not None else None,
        sum(int(s.get("numRowsTotal", 0) or 0) for s in state_ops),
        sum(int(s.get("memoryUsedBytes", 0) or 0) for s in state_ops),
        len(p.get("sources") or []),
        str((p.get("sink") or {}).get("description", "")),
    )


def progress_frame(spark: SparkSession, query) -> DataFrame:
    """The query's retained progress history as a DataFrame (pull-based;
    Spark retains `spark.sql.streaming.numRecentProgressUpdates`=100
    batches — use ProgressLog for unbounded capture)."""
    rows = [
        _flatten(json.loads(p if isinstance(p, str) else p.json))
        for p in query.recentProgress
    ]
    return spark.createDataFrame(rows, PROGRESS_SCHEMA)


class ProgressLog(StreamingQueryListener):
    """Push-based progress capture: register with
    ``spark.streams.addListener(log)`` before starting queries; every
    micro-batch's progress lands in ``self.events``. Driver-memory cost
    is one small dict per batch — prune or flush downstream if a job
    runs for months."""

    def __init__(self) -> None:
        self.events: list[dict[str, Any]] = []

    # StreamingQueryListener contract
    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        self.events.append(json.loads(event.progress.json))

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def frame(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(
            [_flatten(p) for p in self.events], PROGRESS_SCHEMA
        )


def throughput_summary(progress: DataFrame) -> DataFrame:
    """Roll the per-batch feed up to per-query health numbers: totals,
    p50/max batch duration, last watermark, peak state size."""
    from pyspark.sql import functions as F

    return progress.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_batches"),
        F.sum("num_input_rows").alias("total_rows"),
        F.round(F.avg("input_rows_per_sec"), 2).alias("avg_input_rps"),
        F.round(F.avg("processed_rows_per_sec"), 2).alias("avg_processed_rps"),
        F.percentile_approx("batch_duration_ms", 0.5).alias("p50_batch_ms"),
        F.max("batch_duration_ms").alias("max_batch_ms"),
        F.max("watermark").alias("last_watermark"),
        F.max("state_rows").alias("peak_state_rows"),
        F.max("state_bytes").alias("peak_state_bytes"),
    )
