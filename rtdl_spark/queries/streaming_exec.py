"""Streaming-EXECUTED queries: each entry here runs a REAL Structured
Streaming query (readStream file source → memory sink, availableNow
trigger) and returns its final result table — so the external driver's
correctness gate exercises the actual streaming engine path (state store,
micro-batch planner, streaming aggregation), not a batch twin.

Determinism contract (what makes a streaming run hash-comparable against
a DuckDB oracle):
- the staged source is ONE parquet file → availableNow runs ONE
  micro-batch → the watermark never advances mid-run, so no input row is
  ever late-dropped;
- output mode ``complete`` emits every window (append would withhold the
  non-finalized suffix — nondeterministic across file splits);
- money sums go through DECIMAL (exact) like every batch query;
- event timestamps are unique per (event_type, bucket) at microsecond
  grain, so min_by/max_by champions are unique.

Reference parity: rtdl's streaming surface is the Kafka→StateFun chain
(ingester/module.yaml:22-34); these queries are the Spark-native
equivalent of "the same aggregation, fed by a stream" over the lake the
reference writes.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rtdl_spark.catalog import table
from rtdl_spark.queries import query
from rtdl_spark.queries._util import local_result, DEC


def _run_events_stream(
    spark: SparkSession,
    sf_dir: str,
    build,
    name: str,
    output_mode: str = "complete",
    prepare=None,
) -> DataFrame:
    """Stage the events table as a single-file stream source, run
    ``build(stream_df)`` through a real StreamingQuery into a memory
    sink, and return the final table materialized (the scratch source
    and checkpoint die before returning). ``prepare`` optionally
    transforms the staged batch frame (e.g. planting duplicates)."""
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    workdir = tempfile.mkdtemp(prefix="rtdl_stream_", dir=shm)
    try:
        src = os.path.join(workdir, "src")
        ev = table(spark, sf_dir, "events")
        if prepare is not None:
            ev = prepare(ev)
        ev.coalesce(1).write.parquet(src)
        schema = spark.read.parquet(src).schema
        stream = spark.readStream.schema(schema).parquet(src)
        out = build(stream)
        spark.catalog.dropTempView(name)  # False if absent, never raises
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option(
                "checkpointLocation", os.path.join(workdir, "ckpt")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        result = spark.table(name)
        rows = result.collect()  # materialize before scratch dies
        return local_result(spark, rows, result.schema)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


@query(
    "stream_exec_tumbling_counts",
    # the oracle is the batch-twin SQL (win_tumbling_5min's shape): one
    # availableNow micro-batch over the same rows must equal the batch
    # aggregate exactly — counts are integers, the sum is DECIMAL-exact
    oracle=f"""
    SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
           event_type, COUNT(*) AS n,
           CAST(SUM({DEC('value')}) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_exec_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling counts per event_type executed THROUGH the
    streaming engine (streaming/jobs.py::stream_tumbling_counts — real
    readStream, streaming aggregation state store, availableNow): the
    first externally-verifiable proof that the streaming lane computes
    the same answer the lake batch path does."""
    from rtdl_spark.streaming.jobs import stream_tumbling_counts

    out = _run_events_stream(
        spark,
        sf_dir,
        lambda s: stream_tumbling_counts(s),
        "stream_exec_tumbling",
    )
    return out.select(
        F.col("window_start").cast("timestamp_ntz").alias("window_start"),
        "event_type",
        "n",
        "total_value",
    )


@query(
    "stream_exec_sliding_counts",
    # batch twin: win_sliding_10min_5min's oracle shape with the stream
    # job's per-event_type grouping — every event lands in exactly
    # window/slide = 2 overlapping windows, enumerated via the offset
    # cross join
    oracle="""
    SELECT window_start, event_type, COUNT(*) AS n
    FROM (
      SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP))
               - (off * INTERVAL '5 minutes') AS window_start,
             event_type
      FROM events CROSS JOIN (SELECT UNNEST([0, 1]) AS off) offs
    ) t
    GROUP BY window_start, event_type
    """,
)
def stream_exec_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (overlapping) event-time windows executed through the
    streaming engine (streaming/jobs.py::stream_sliding_counts): each
    event contributes to window/slide state entries — the state-fan-out
    shape whose memory budget SCALE.md calls out — and the complete-mode
    final table equals the batch offset-enumeration replay exactly."""
    from rtdl_spark.streaming.jobs import stream_sliding_counts

    out = _run_events_stream(
        spark,
        sf_dir,
        lambda s: stream_sliding_counts(s),
        "stream_exec_sliding",
    )
    return out.select(
        F.col("window_start").cast("timestamp_ntz").alias("window_start"),
        "event_type",
        "n",
    )


@query(
    "stream_exec_ohlc_candles",
    # batch twin: win_ohlc_resample's oracle at the stream job's 15-minute
    # grain — arg_min/arg_max champions unique at microsecond ts grain
    oracle=f"""
    SELECT time_bucket(INTERVAL 15 MINUTE, ts) AS bucket,
           event_type,
           COUNT(*) AS n_events,
           arg_min(value, ts) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           arg_max(value, ts) AS close,
           CAST(SUM({DEC('value')}) AS DOUBLE) AS total
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_exec_ohlc_candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming OHLC candles (streaming/jobs.py::stream_ohlc_candles)
    executed end-to-end: min_by/max_by/decimal-sum maintained by the
    streaming state store across the micro-batch, emitted in complete
    mode, hash-equal to the batch resample."""
    from rtdl_spark.streaming.jobs import stream_ohlc_candles

    out = _run_events_stream(
        spark,
        sf_dir,
        lambda s: stream_ohlc_candles(s),
        "stream_exec_ohlc",
    )
    return out.select(
        F.col("bucket").cast("timestamp_ntz").alias("bucket"),
        "event_type",
        "n_events",
        "open",
        "high",
        "low",
        "close",
        "total",
    )


@query(
    "stream_exec_dedup_within_watermark",
    # the staged stream carries EVERY event twice (union with itself);
    # watermark-scoped streaming dedup on event_id must emit each exactly
    # once — the oracle is simply the original table (aggregated so the
    # check is order-free and compact)
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(event_id) AS BIGINT) AS id_sum,
           CAST(SUM(user_id) AS BIGINT) AS user_sum
    FROM events
    GROUP BY event_type
    """,
)
def stream_exec_dedup_within_watermark(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming exact dedup executed through the engine
    (streaming/jobs.py::stream_dedup_within_watermark →
    dropDuplicatesWithinWatermark): the source stream is the events
    table UNIONED WITH ITSELF (every event arrives twice), and the
    deduped stream must equal the original table exactly — planted
    duplicates make this a discriminating external check of the
    streaming dedup state store, not an identity pass. Emitted rows are
    folded to per-type (count, id-sum, user-sum) so the comparison is
    compact and order-free; integer sums are exact."""
    from rtdl_spark.streaming.jobs import stream_dedup_within_watermark

    out = _run_events_stream(
        spark,
        sf_dir,
        lambda s: stream_dedup_within_watermark(s),
        "stream_exec_dedup",
        output_mode="append",
        prepare=lambda ev: ev.unionByName(ev),
    )
    return out.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("event_id").alias("id_sum"),
        F.sum("user_id").alias("user_sum"),
    )


@query(
    "stream_exec_session_counts",
    # gap-based sessionization replayed as gaps-and-islands: a new
    # session starts when the gap to the previous event is >= 30 minutes
    # (Spark merges events whose [ts, ts+gap) intervals OVERLAP, so an
    # exact-gap successor does NOT merge); session_end = last ts + gap
    oracle="""
    WITH o AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), g AS (
      SELECT user_id, ts,
             SUM(brk) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING
             ) AS sid
      FROM o
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM g
    GROUP BY user_id, sid
    """,
)
def stream_exec_session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native streaming SESSION windows (streaming/jobs.py::
    stream_session_counts — session_window state merging in the streaming
    engine), verified against a pure-SQL gaps-and-islands replay: the
    session-merge semantics (merge iff event intervals overlap; end =
    last event + gap) are pinned cross-engine."""
    from rtdl_spark.streaming.jobs import stream_session_counts

    out = _run_events_stream(
        spark,
        sf_dir,
        lambda s: stream_session_counts(s),
        "stream_exec_sessions",
    )
    return out.select(
        "user_id",
        F.col("session_start").cast("timestamp_ntz").alias("session_start"),
        F.col("session_end").cast("timestamp_ntz").alias("session_end"),
        "n_events",
    )


@query(
    "stream_exec_delta_sink",
    # the oracle is the plain batch aggregate over the same source rows:
    # the stream ran ONCE through a wiped-and-replayed checkpoint, so any
    # txn-watermark failure would DOUBLE every count/sum and mismatch;
    # n_commits pins that the replay added no commit (1 data commit).
    oracle=f"""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM({DEC('value')}) AS DOUBLE) AS total_value,
           CAST(1 AS INT) AS n_commits
    FROM events WHERE event_id % 5 = 0
    GROUP BY event_type
    """,
)
def stream_exec_delta_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Delta STREAMING SINK executed end-to-end (streaming/jobs.py::
    stream_to_delta_table → sources/delta_writer.py): a real readStream
    feeds foreachBatch appends into a NATIVE-protocol Delta table, each
    micro-batch commit carrying its SetTransaction action; the streaming
    checkpoint is then WIPED and the whole stream re-delivered — the
    table's own txn watermark must skip every replayed epoch, which the
    oracle proves by exact (non-doubled) counts and DECIMAL sums plus a
    commit count of 1."""
    from rtdl_spark.queries._util import dec
    from rtdl_spark.sources.delta_reader import (
        delta_history,
        read_delta_native,
    )
    from rtdl_spark.streaming import stream_to_delta_table

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    workdir = tempfile.mkdtemp(prefix="rtdl_dsink_", dir=shm)
    try:
        src = os.path.join(workdir, "src")
        root = os.path.join(workdir, "dtbl")
        ckpt = os.path.join(workdir, "ckpt")
        ev = (
            table(spark, sf_dir, "events")
            .filter(F.col("event_id") % 5 == 0)
            .select("event_id", "event_type", "value")
        )
        ev.coalesce(1).write.json(src)
        schema = "event_id long, event_type string, value double"

        q = stream_to_delta_table(
            spark, src, schema, root, ckpt, app_id="dsink-oracle"
        )
        q.awaitTermination(600)
        # forced full re-delivery: the txn watermark must skip it all
        shutil.rmtree(ckpt)
        q = stream_to_delta_table(
            spark, src, schema, root, ckpt, app_id="dsink-oracle"
        )
        q.awaitTermination(600)

        n_commits = len(delta_history(spark, root))
        out = (
            read_delta_native(spark, root)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(dec("value")).cast("double").alias("total_value"),
            )
            .withColumn("n_commits", F.lit(n_commits).cast("int"))
        )
        rows = out.collect()  # materialize before the scratch dir dies
        return local_result(spark, rows, out.schema)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


@query(
    "stream_exec_delta_upsert",
    # the upsert sink ran through a WIPED-and-replayed checkpoint: a
    # txn-watermark failure would re-apply the MERGE (doubling nothing
    # here, but adding a commit) — n_commits pins exactly one data
    # commit after the creating one; the aggregate pins the upsert
    # semantics (matched keys take value+1000, the rest survive)
    oracle=f"""
    WITH base AS (
      SELECT event_id, event_type, value FROM events
      WHERE event_id % 6 = 0
    ), s AS (
      SELECT event_id, event_type, value + 1000 AS value FROM events
      WHERE event_id % 4 = 0
    ), final AS (
      SELECT * FROM base
      WHERE event_id NOT IN (SELECT event_id FROM s)
      UNION ALL SELECT * FROM s
    )
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM({DEC('value')}) AS DOUBLE) AS total_value,
           CAST(2 AS INT) AS n_commits
    FROM final GROUP BY event_type
    """,
)
def stream_exec_delta_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming UPSERT sink executed end-to-end (r10,
    streaming/jobs.py::stream_upsert_to_delta — foreachBatch + native
    MERGE with per-epoch SetTransaction): a Delta table seeded from
    events is upserted by a real readStream (matched keys take
    value+1000 via MERGE update, new keys insert), then the streaming
    checkpoint is WIPED and the whole stream re-delivered — the
    table's txn watermark must skip the replayed epoch (n_commits
    pins it; doubled applications would also break the sums)."""
    from rtdl_spark.queries._util import dec
    from rtdl_spark.sources.delta_reader import (
        delta_history,
        read_delta_native,
    )
    from rtdl_spark.sources.delta_writer import write_delta_native
    from rtdl_spark.streaming import stream_upsert_to_delta

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    workdir = tempfile.mkdtemp(prefix="rtdl_dups_", dir=shm)
    try:
        src = os.path.join(workdir, "src")
        root = os.path.join(workdir, "dtbl")
        ckpt = os.path.join(workdir, "ckpt")
        base = (
            table(spark, sf_dir, "events")
            .filter(F.col("event_id") % 6 == 0)
            .select("event_id", "event_type", "value")
        )
        write_delta_native(
            spark, base.repartition(4), root, checkpoint_interval=0
        )
        upd = (
            table(spark, sf_dir, "events")
            .filter(F.col("event_id") % 4 == 0)
            .select(
                "event_id", "event_type",
                (F.col("value") + 1000).alias("value"),
            )
        )
        upd.coalesce(1).write.json(src)
        schema = "event_id long, event_type string, value double"

        for _attempt in range(2):  # second pass = forced re-delivery
            q = stream_upsert_to_delta(
                spark, src, schema, root, ckpt,
                app_id="dups-oracle", on=["event_id"],
            )
            q.awaitTermination(600)
            shutil.rmtree(ckpt, ignore_errors=True)

        n_commits = len(delta_history(spark, root))
        out = (
            read_delta_native(spark, root)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(dec("value")).cast("double").alias("total_value"),
            )
            .withColumn("n_commits", F.lit(n_commits).cast("int"))
        )
        rows = out.collect()  # materialize before the scratch dir dies
        return local_result(spark, rows, out.schema)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


@query(
    "stream_exec_delta_source",
    # the sink accumulated TWO incremental passes over a table that was
    # OPTIMIZE-compacted between them: any offset error double-emits or
    # drops rows and any dataChange=false mishandling re-emits the whole
    # table — the oracle's exact counts/sums catch both
    oracle=f"""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM({DEC('value')}) AS DOUBLE) AS total_value
    FROM events WHERE event_id % 4 = 0
    GROUP BY event_type
    """,
)
def stream_exec_delta_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Delta STREAMING SOURCE executed end-to-end
    (sources/delta_stream_source.py — a Spark-4 Python Data Source whose
    offsets are commit versions, reading added files as Arrow batches):
    commit 1 streams into a parquet sink; the table then receives commit
    2 AND an OPTIMIZE rewrite; the stream restarts on its checkpoint and
    must emit exactly the new commit — the optimize's dataChange=false
    files re-emit nothing. The sink's aggregate is hash-verified against
    the batch SQL over the same source rows."""
    from rtdl_spark.queries._util import dec
    from rtdl_spark.sources.delta_stream_source import DeltaStreamDataSource
    from rtdl_spark.sources.delta_writer import (
        optimize_delta_native,
        write_delta_native,
    )

    spark.dataSource.register(DeltaStreamDataSource)
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    workdir = tempfile.mkdtemp(prefix="rtdl_dsource_", dir=shm)
    try:
        root = os.path.join(workdir, "dtbl")
        out = os.path.join(workdir, "sink")
        ckpt = os.path.join(workdir, "ckpt")
        ev = (
            table(spark, sf_dir, "events")
            .filter(F.col("event_id") % 4 == 0)
            .select("event_id", "event_type", "value")
        )

        def run_pass():
            q = (
                spark.readStream.format("rtdl_delta_stream")
                .option("path", root)
                .load()
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(600)

        write_delta_native(
            spark, ev.filter(F.col("event_id") % 8 == 0), root,
            checkpoint_interval=0,
        )
        run_pass()
        write_delta_native(
            spark, ev.filter(F.col("event_id") % 8 == 4), root,
            checkpoint_interval=0,
        )
        optimize_delta_native(spark, root, target_file_bytes=1 << 30)
        run_pass()

        agg = (
            spark.read.parquet(out)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(dec("value")).cast("double").alias("total_value"),
            )
        )
        rows = agg.collect()  # materialize before the scratch dir dies
        return local_result(spark, rows, agg.schema)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


@query(
    "stream_exec_interval_join",
    # batch-twin oracle of the EXECUTED stream-stream interval join
    # (join_interval_attribution's SQL): an inner stream-stream join
    # emits each match in the micro-batch that completes the pair, and
    # one availableNow batch sees everything — so the streamed result
    # must equal the batch join exactly
    oracle="""
    SELECT c.event_id AS click_id, p.event_id AS purchase_id,
           c.user_id AS user_id
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 10 MINUTE
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
)
def stream_exec_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STREAM interval join executed through the real streaming
    engine (two file-stream sources, watermarks on both sides, the
    time-bounded join state Spark sizes from watermark + interval —
    streaming/jobs.py::stream_interval_join): each click paired with the
    same user's purchases inside [ts, ts+10min]. Inner joins emit
    matches immediately (append mode), so a single availableNow batch
    over single-file sources is deterministic and hash-comparable to the
    batch twin. Reference parity: the Kafka→StateFun chain's
    event-to-event matching shape (ingester/module.yaml:22-34),
    Spark-native."""
    from rtdl_spark.streaming.jobs import stream_interval_join

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    workdir = tempfile.mkdtemp(prefix="rtdl_ssjoin_", dir=shm)
    name = "stream_exec_interval_join_sink"
    # a stream-stream join opens FOUR state stores per shuffle partition;
    # at 32 partitions the store setup dominates (~40 s of fixed overhead
    # for a one-batch run, measured flat across sf0.01 and sf0.1). The
    # stateful width is baked into the NEW checkpoint each call creates,
    # so narrow it for this bounded run and restore after — on a real
    # unbounded deployment you would size it to the key cardinality once.
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        ev = table(spark, sf_dir, "events")
        src_c = os.path.join(workdir, "clicks")
        src_p = os.path.join(workdir, "purchases")
        ev.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts"
        ).coalesce(1).write.parquet(src_c)
        ev.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts"
        ).coalesce(1).write.parquet(src_p)
        schema_c = spark.read.parquet(src_c).schema
        schema_p = spark.read.parquet(src_p).schema
        clicks = spark.readStream.schema(schema_c).parquet(src_c)
        purchases = spark.readStream.schema(schema_p).parquet(src_p)
        joined = stream_interval_join(
            clicks, purchases, key="user_id", max_delay="10 minutes"
        ).select(
            F.col("l_event_id").alias("click_id"),
            F.col("r_event_id").alias("purchase_id"),
            F.col("l_user_id").alias("user_id"),
        )
        spark.catalog.dropTempView(name)
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(workdir, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        result = spark.table(name)
        rows = result.collect()
        return local_result(spark, rows, result.schema)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(workdir, ignore_errors=True)

@query(
    "stream_exec_cdf_source",
    # batch-twin of the EXECUTED readChangeFeed stream: one availableNow
    # pass over a CDF table's full history must reconstruct exactly the
    # change sets of every commit — creation inserts, the delete's
    # preimages, the update's pre+post images — keyed by commit version
    oracle=f"""
    WITH t AS (
      SELECT o_orderkey AS k, o_totalprice AS price
      FROM orders WHERE o_orderkey % 4 = 0
    )
    SELECT * FROM (
      SELECT CAST(0 AS BIGINT) AS version, 'insert' AS change_type,
             COUNT(*) AS n, CAST(SUM({DEC('price')}) AS DOUBLE) AS total
      FROM t
      UNION ALL
      SELECT 2, 'delete', COUNT(*), CAST(SUM({DEC('price')}) AS DOUBLE)
      FROM t WHERE k % 7 = 0
      UNION ALL
      SELECT 3, 'update_preimage', COUNT(*),
             CAST(SUM({DEC('price')}) AS DOUBLE)
      FROM t WHERE k % 7 <> 0 AND k % 11 = 0
      UNION ALL
      SELECT 3, 'update_postimage', COUNT(*),
             CAST(SUM({DEC('price * 2')}) AS DOUBLE)
      FROM t WHERE k % 7 <> 0 AND k % 11 = 0
    ) ORDER BY version, change_type
    """,
)
def stream_exec_cdf_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The readChangeFeed STREAMING lane executed end-to-end (r7,
    delta_stream_source.py::_plan_change_commit — delta-spark's
    .option("readChangeFeed", "true") parity): a CDF-enabled native
    Delta table receives a DELETE and an UPDATE (both commit cdc
    change files); one availableNow pass streams the FULL change
    history — creation commit derived as inserts, cdc commits read
    from their _change_data files with _change_type/_commit_version
    stamped in the Arrow lane. Aggregated per (version, change_type),
    DECIMAL-exact, hash-verified.

    Scale shape: planning is per-commit KB-scale JSON on the driver;
    each change file is one InputPartition read worker-side as Arrow
    batches — the lane a CDC-consuming training pipeline would tail."""
    from rtdl_spark.queries._util import dec
    from rtdl_spark.sources.delta_reader import snapshot_actions
    from rtdl_spark.sources.delta_stream_source import DeltaStreamDataSource
    from rtdl_spark.sources.delta_writer import (
        delete_where_delta_native,
        update_where_delta_native,
        write_delta_native,
    )

    spark.dataSource.register(DeltaStreamDataSource)
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    workdir = tempfile.mkdtemp(prefix="rtdl_cdfsrc_", dir=shm)
    try:
        import json as _json

        root = os.path.join(workdir, "ctbl")
        out = os.path.join(workdir, "sink")
        ckpt = os.path.join(workdir, "ckpt")
        o = (
            table(spark, sf_dir, "orders")
            .filter(F.col("o_orderkey") % 4 == 0)
            .select(
                F.col("o_orderkey").alias("k"),
                F.col("o_totalprice").alias("price"),
            )
        )
        write_delta_native(spark, o.repartition(2), root,      # v0
                           checkpoint_interval=0)
        _, meta, _, current, _ = snapshot_actions(spark, root)
        log = os.path.join(root, "_delta_log")
        with open(os.path.join(log, f"{current + 1:020d}.json"), "w") as f:
            f.write(_json.dumps({"commitInfo": {
                "timestamp": 2, "operation": "SET TBLPROPERTIES"}}) + "\n")
            f.write(_json.dumps({"protocol": {
                "minReaderVersion": 1, "minWriterVersion": 4}}) + "\n")
            f.write(_json.dumps({"metaData": {
                **meta,
                "configuration": {
                    "delta.enableChangeDataFeed": "true"}}}) + "\n")
        delete_where_delta_native(spark, root, "k % 7 = 0")            # v2
        update_where_delta_native(spark, root, "k % 11 = 0",
                                  {"price": "price * 2"})              # v3

        q = (
            spark.readStream.format("rtdl_delta_stream")
            .option("path", root)
            .option("readChangeFeed", "true")
            # v0 is a pure append made BEFORE CDF was enabled (v1):
            # strict mode refuses feed-less commits; this opt-in
            # derives it as inserts (exact for appends)
            .option("allowUnrecordedChanges", "true")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)

        agg = (
            spark.read.parquet(out)
            .groupBy(
                F.col("_commit_version").alias("version"),
                F.col("_change_type").alias("change_type"),
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(dec("price")).cast("double").alias("total"),
            )
            .orderBy("version", "change_type")
        )
        rows = agg.collect()  # materialize before the scratch dir dies
        return local_result(spark, rows, agg.schema)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
