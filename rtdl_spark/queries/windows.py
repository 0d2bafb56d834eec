"""Window-function coverage (SURVEY.md §2B): ranking, analytic, frames,
and the event-time windows (tumbling / sliding / session) that back the
streaming surface — expressed here in batch so they are oracle-checkable;
the same expressions run under Structured Streaming (rtdl_spark.streaming).

Determinism: every window ORDER BY carries a unique tiebreaker so results
are reproducible across engines and partitionings — required for oracle
hashing and good practice anyway.

Scale: a window over partitionBy(k) is one hash shuffle on k plus a
per-partition sort. None of these use a global (unpartitioned) order except
on pre-aggregated small data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rtdl_spark.catalog import register_views, table
from rtdl_spark.queries import query
from rtdl_spark.queries._util import DEC, dec


@query(
    "win_topk_orders_per_segment",
    oracle="""
    SELECT c_mktsegment, o_orderkey,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice, rn
    FROM (
      SELECT c_mktsegment, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders JOIN customer ON o_custkey = c_custkey
    ) t WHERE rn <= 3
    """,
)
def win_topk_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group: the canonical row_number + filter plan (no global
    sort; one shuffle on the partition key)."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "c_mktsegment", "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"), "rn",
        )
    )


@query(
    "win_rank_parts_by_price",
    oracle="""
    SELECT p_partkey, p_brand,
           RANK()         OVER w AS rnk,
           DENSE_RANK()   OVER w AS drnk,
           ROUND(PERCENT_RANK() OVER w, 6) AS prnk,
           ROUND(CUME_DIST()    OVER w, 6) AS cdist
    FROM part
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC)
    """,
)
def win_rank_parts_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/percent_rank/cume_dist with value ties — rank values
    are functions of the data, so ties are deterministic."""
    p = table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"))
    return p.select(
        "p_partkey",
        "p_brand",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


@query(
    "win_lag_lead_order_gaps",
    oracle="""
    SELECT o_custkey, o_orderkey,
           date_diff('day',
             lag(o_orderdate)  OVER w, o_orderdate) AS days_since_prev,
           date_diff('day',
             o_orderdate, lead(o_orderdate) OVER w) AS days_until_next
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def win_lag_lead_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("days_since_prev"),
        F.datediff(
            F.lead("o_orderdate").over(w), F.col("o_orderdate")
        ).alias("days_until_next"),
    )


@query(
    "win_running_revenue",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           CAST(SUM({DEC('o_totalprice')}) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_total
    FROM orders
    """,
)
def win_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_total"),
    )


@query(
    "win_moving_avg_3",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           CAST(SUM({DEC('o_totalprice')}) OVER w AS DOUBLE)
             / (COUNT(*) OVER w) AS moving_avg_3
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def win_moving_avg_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        (
            F.sum(dec("o_totalprice")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("moving_avg_3"),
    )


@query(
    "win_range_frame_price_band",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                          RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW)
             AS n_in_band
    FROM orders
    """,
)
def win_range_frame_price_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame with a numeric offset (value-based, not row-based)."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderkey, o_orderstatus,
               COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                              RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW)
                 AS n_in_band
        FROM orders
        """
    )


@query(
    "win_ntile_customer_quartiles",
    oracle="""
    SELECT quartile, COUNT(*) AS n_customers,
           CAST(MIN(c_acctbal) AS DOUBLE) AS min_bal,
           CAST(MAX(c_acctbal) AS DOUBLE) AS max_bal
    FROM (
      SELECT c_acctbal,
             NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
      FROM customer
    ) t GROUP BY quartile
    """,
)
def win_ntile_customer_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global NTILE — an unpartitioned window (single-task sort) is fine for
    dimension-sized inputs; at fact scale use approx quantiles instead."""
    c = table(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return (
        c.withColumn("quartile", F.ntile(4).over(w))
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("c_acctbal").cast("double").alias("min_bal"),
            F.max("c_acctbal").cast("double").alias("max_bal"),
        )
    )


@query(
    "win_first_last_value",
    oracle="""
    SELECT DISTINCT o_custkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey)  OVER w AS last_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
    ).distinct()


@query(
    "win_tumbling_5min",
    oracle=f"""
    SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP))
             AS window_start,
           event_type, COUNT(*) AS n,
           CAST(SUM({DEC('value')}) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def win_tumbling_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window — identical expression works under
    readStream + watermark (rtdl_spark.streaming)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "total_value"
        )
    )


@query(
    "win_sliding_10min_5min",
    oracle="""
    SELECT window_start, COUNT(*) AS n
    FROM (
      SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP))
               - (off * INTERVAL '5 minutes') AS window_start
      FROM events CROSS JOIN (SELECT UNNEST([0, 1]) AS off) offs
    ) t
    GROUP BY window_start
    """,
)
def win_sliding_10min_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (10 min width, 5 min slide): every event belongs to
    exactly 2 overlapping windows."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )


@query(
    "win_session_30min",
    oracle="""
    WITH flagged AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN CAST(ts AS TIMESTAMP)
                       - lag(CAST(ts AS TIMESTAMP))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
)
def win_session_30min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute gap) via the native session_window
    operator — the batch twin of streaming sessionization."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id", F.col("sw.start").alias("session_start"), "n_events"
        )
    )


@query(
    "win_percent_rank_cume_dist",
    oracle="""
    SELECT o_orderpriority, o_orderkey,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume
    FROM orders
    WHERE o_orderkey < 3000
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def win_percent_rank_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-rank analytics (percent_rank / cume_dist) per priority
    group — the remaining ranking-family built-ins; deterministic via the
    orderkey tiebreak."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return o.select(
        "o_orderpriority",
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "win_gaps_islands_sessions",
    oracle="""
    WITH e AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER w <= INTERVAL 30 MINUTE
                  THEN 0 ELSE 1 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM e
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM s GROUP BY user_id, session_id
    """,
)
def win_gaps_islands_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization — the batch window-function twin
    of F.session_window (win_session_30min): a new session starts when
    the gap to the previous event exceeds 30 minutes; session id is the
    running sum of session starts. The pattern matters because it
    sessionizes with plain windows on engines/queries where
    session_window isn't available."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    e = ev.withColumn(
        "new_session",
        F.when(
            F.col("ts")
            <= F.lag("ts").over(w) + F.expr("INTERVAL 30 minutes"),
            F.lit(0),
        ).otherwise(F.lit(1)),
    )
    s = e.withColumn("session_id", F.sum("new_session").over(run))
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@query(
    "win_time_spine_gap_fill",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS mn,
             date_trunc('hour', MAX(ts)) AS mx
      FROM events
    ), spine AS (
      SELECT UNNEST(generate_series(mn, mx, INTERVAL 5 MINUTE)) AS slot
      FROM bounds
    ), counts AS (
      SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS slot,
             COUNT(*) AS n, SUM(value) AS v
      FROM events GROUP BY 1
    )
    SELECT s.slot,
           COALESCE(c.n, 0) AS n_events,
           ROUND(last_value(c.v IGNORE NULLS)
                   OVER (ORDER BY s.slot ROWS UNBOUNDED PRECEDING),
                 4) AS v_filled
    FROM spine s LEFT JOIN counts c USING (slot)
    """,
)
def win_time_spine_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-spine gap filling — the dashboard/resample primitive: a dense
    5-minute spine over the event range (generated IN the engine, no
    driver collect), per-slot counts joined on, and empty slots
    forward-filled with the last observed value (last_value IGNORE
    NULLS). The spine generation + as-needed fill is how a 100 TB events
    table serves continuous charts without a driver loop."""
    ev = table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("mn"),
        F.date_trunc("hour", F.max("ts")).alias("mx"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("mn", "mx", F.expr("INTERVAL 5 minutes"))
        ).alias("slot")
    )
    counts = ev.groupBy(
        F.window("ts", "5 minutes").alias("w")
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
    counts = counts.select(F.col("w.start").alias("slot"), "n", "v")
    w = Window.orderBy("slot").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.join(counts, "slot", "left")
        .select(
            "slot",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
            F.round(
                F.last("v", ignorenulls=True).over(w), 4
            ).alias("v_filled"),
        )
    )


@query(
    "win_topk_partial_prune",
    oracle="""
    SELECT o_orderpriority, o_orderkey,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice, rk
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders
    ) t WHERE rk <= 5
    """,
)
def win_topk_partial_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via map-side pruning (operators/topk.py::
    grouped_topk): each partition keeps a local top-5 per priority first,
    so the window's exchange moves ≤ k × n_partitions rows per group
    instead of the whole table — the plan that survives 100 TB. Semantics
    identical to the plain row_number window (the oracle IS that window)."""
    from rtdl_spark.operators.topk import grouped_topk

    o = table(spark, sf_dir, "orders")
    out = grouped_topk(
        o.select("o_orderpriority", "o_orderkey", "o_totalprice"),
        ["o_orderpriority"],
        "o_totalprice",
        5,
        tiebreak=["o_orderkey"],
    )
    return out.select(
        "o_orderpriority",
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        "rk",
    )


@query(
    "win_nth_value_ignore_nulls",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           nth_value(o_totalprice, 3) OVER w AS third_price,
           first_value(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END
                       IGNORE NULLS) OVER w AS first_f_price
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_nth_value_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value + first_value(IGNORE NULLS) over a full-partition frame:
    per priority, the 3rd-highest price and the highest price among
    status-F orders — the analytic accessors beyond lag/lead/first/last
    already covered."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.nth_value("o_totalprice", 3).over(w).alias("third_price"),
        F.first(
            F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice")),
            ignorenulls=True,
        )
        .over(w)
        .alias("first_f_price"),
    )


@query(
    "win_time_range_frame",
    oracle="""
    SELECT event_id, user_id,
           COUNT(*) OVER (
             PARTITION BY user_id ORDER BY CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
             RANGE BETWEEN 1800 PRECEDING AND CURRENT ROW) AS n_last_30m,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
             PARTITION BY user_id ORDER BY CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
             RANGE BETWEEN 1800 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS value_last_30m
    FROM events
    """,
)
def win_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: per user, rolling count and value sum over
    the trailing 30 minutes of EVENT TIME (value-range over epoch
    seconds) — the sliding-lookback analytic that row frames
    (win_moving_avg_3) cannot express when events are irregularly
    spaced. One hash shuffle on user_id; the frame scans each
    partition's sorted run once (Spark's range-frame window keeps a
    sliding aggregate, not O(n²) re-evaluation)."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-1800, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_last_30m"),
        F.sum(dec("value")).over(w).cast("double").alias("value_last_30m"),
    )


@query(
    "win_ewma_bounded",
    oracle="""
    WITH o AS (
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
      FROM orders WHERE o_custkey % 97 = 0
    )
    SELECT o_custkey, o_orderkey,
           0.5    * o_totalprice
         + 0.25   * LAG(o_totalprice, 1, 0.0) OVER w
         + 0.125  * LAG(o_totalprice, 2, 0.0) OVER w
         + 0.0625 * LAG(o_totalprice, 3, 0.0) OVER w
         + 0.03125    * LAG(o_totalprice, 4, 0.0) OVER w
         + 0.015625   * LAG(o_totalprice, 5, 0.0) OVER w
         + 0.0078125  * LAG(o_totalprice, 6, 0.0) OVER w
         + 0.00390625 * LAG(o_totalprice, 7, 0.0) OVER w AS ewma_price
    FROM o
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def win_ewma_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average with a bounded kernel
    (alpha = 1/2, 8 taps) — the smoothing/trend primitive. The recursive
    EWMA definition is inherently sequential; truncating the kernel (tap 8
    carries 2^-8 of the signal) turns it into a FIXED set of lag terms, so
    it runs as one per-key window sort with no iteration and no state.
    alpha = 1/2 makes every weight a power of two: each product is an
    exact float scale, and the fixed left-to-right sum is engine-identical
    — no rounding needed anywhere.
    """
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 97 == 0)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    taps = F.lit(0.5) * F.col("o_totalprice")
    weight = 0.25
    for j in range(1, 8):
        taps = taps + F.lit(weight) * F.lag("o_totalprice", j, 0.0).over(w)
        weight /= 2
    return o.select(
        "o_custkey", "o_orderkey", taps.alias("ewma_price")
    )


@query(
    "win_ohlc_resample",
    oracle=f"""
    SELECT event_type,
           time_bucket(INTERVAL 15 MINUTE, ts) AS bucket,
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
def win_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candle resampling: per event type and 15-minute bucket, the
    first/max/min/last value plus count and (exact decimal) total — the
    time-series downsampling primitive for dashboards and feature
    engineering. open/close use min_by/max_by on the event timestamp
    (unique within a bucket at microsecond grain), so the whole candle is
    ONE map-combinable aggregate — no window sort, no self-join; a year
    of ticks costs one shuffle on (type, bucket)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type",
        F.window("ts", "15 minutes").start.alias("bucket"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min_by("value", "ts").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", "ts").alias("close"),
        F.sum(dec("value")).cast("double").alias("total"),
    )


@query(
    "win_funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY 1
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1
      GROUP BY 1
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
      GROUP BY 1
    )
    SELECT (SELECT COUNT(DISTINCT user_id) FROM events) AS n_users,
           (SELECT COUNT(*) FROM v) AS n_viewed,
           (SELECT COUNT(*) FROM c) AS n_clicked_after_view,
           (SELECT COUNT(*) FROM p) AS n_purchased_after_click
    """,
)
def win_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (view → click → purchase, each step's
    FIRST occurrence strictly after the previous step's): the product-
    analytics staple. Three conditional min-timestamp aggregates chained
    by per-user joins — each stage is one map-combinable agg + one hash
    join on user_id, timestamps stay exact (no floats anywhere). At any
    scale this is 3 shuffles on user_id; no window sort, no event-order
    materialization."""
    ev = table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        ev.agg(F.countDistinct("user_id").alias("n_users"))
        .join(v.agg(F.count(F.lit(1)).alias("n_viewed")))
        .join(c.agg(F.count(F.lit(1)).alias("n_clicked_after_view")))
        .join(p.agg(F.count(F.lit(1)).alias("n_purchased_after_click")))
    )


@query(
    "win_cohort_retention",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, DATE_TRUNC('week', MIN(ts)) AS cohort_week
      FROM events GROUP BY 1
    ), activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST(date_diff('day', f.cohort_week,
                            DATE_TRUNC('week', e.ts)) / 7 AS BIGINT)
               AS week_offset
      FROM events e JOIN first_seen f USING (user_id)
    )
    SELECT cohort_week, week_offset, COUNT(*) AS n_active_users
    FROM activity GROUP BY 1, 2
    """,
)
def win_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen week, counted
    in every later week they were active — the (cohort × week-offset)
    retention triangle. One min-ts aggregate fixes cohorts, a distinct on
    (user, offset) dedups within-week activity, one final count. Offsets
    are exact integers (difference of week-truncated timestamps / 7).
    Two shuffles on user_id + one on the (tiny) matrix key."""
    ev = table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        ev.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(
                    F.date_trunc("week", F.col("ts")), F.col("cohort_week")
                )
                / 7
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_active_users")
    )


@query(
    "win_session_paths",
    oracle="""
    WITH e AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN ts - LAG(ts) OVER w <= INTERVAL 30 MINUTE
                  THEN 0 ELSE 1 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM e
    ), paths AS (
      SELECT user_id, session_id,
             array_to_string(list(event_type ORDER BY ts, event_id), '>')
               AS path
      FROM s GROUP BY 1, 2
    )
    SELECT path, COUNT(*) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT 15
    """,
)
def win_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session path analysis: the top event-type SEQUENCES users take
    within a session (gaps-and-islands sessionization → ordered path
    string → frequency) — the 'how do users actually move through the
    product' query. Event order inside a session is pinned by
    sort_array over (ts, event_id) structs (collect_list alone has no
    order guarantee across merges); the path build is per-session, the
    ranking runs over the (tiny) distinct-path frame via TakeOrdered."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    e = ev.withColumn(
        "new_session",
        F.when(
            F.col("ts")
            <= F.lag("ts").over(w) + F.expr("INTERVAL 30 minutes"),
            F.lit(0),
        ).otherwise(F.lit(1)),
    )
    s = e.withColumn("session_id", F.sum("new_session").over(run))
    paths = (
        s.groupBy("user_id", "session_id")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct("ts", "event_id", "event_type")
                )
            ).alias("evs")
        )
        .select(
            F.array_join(
                F.transform(F.col("evs"), lambda x: x["event_type"]), ">"
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(15)
    )


@query(
    "win_rolling_distinct_users",
    oracle="""
    WITH days AS (
      SELECT DATE_TRUNC('day', ts) AS day, user_id
      FROM events GROUP BY 1, 2
    )
    SELECT DISTINCT day,
           COUNT(DISTINCT user_id) OVER (ORDER BY day) AS cum_distinct_users
    FROM days
    """,
)
def win_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users by day — COUNT(DISTINCT) OVER, which
    Spark's window functions DON'T support — bridged exactly with the
    first-appearance trick: dedup (day, user), mark each user's FIRST day
    (min aggregate, no window over raw rows), count first-appearances per
    day, cumulative-sum over the days-sized frame. Every step is
    map-combinable; the only window runs over |days| rows. DuckDB has the
    native window, which is the oracle."""
    ev = table(spark, sf_dir, "events")
    days = ev.select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    ).distinct()
    first_day = days.groupBy("user_id").agg(F.min("day").alias("first_day"))
    news = first_day.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    all_days = days.select("day").distinct()
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        all_days.join(news, "day", "left")
        .withColumn("n_new", F.coalesce("n_new", F.lit(0)))
        .withColumn("cum_distinct_users", F.sum("n_new").over(w))
        .select("day", "cum_distinct_users")
    )


@query(
    "win_forecast_mase",
    oracle="""
    WITH daily AS (
      SELECT event_type, DATE_TRUNC('day', ts) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM events GROUP BY 1, 2
    ), lagged AS (
      SELECT event_type, day, total,
             LAG(total, 1) OVER w AS prev1,
             LAG(total, 7) OVER w AS prev7
      FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)
    )
    SELECT event_type,
           COUNT(prev7) AS n_scored,
           FLOOR(SUM(CASE WHEN prev7 IS NOT NULL
                          THEN ABS(total - prev1) END) * 1000000.0
                 / SUM(CASE WHEN prev7 IS NOT NULL
                            THEN ABS(total - prev7) END)) / 1000000.0
             AS mase_naive1_vs_seasonal7
    FROM lagged
    GROUP BY event_type
    """,
)
def win_forecast_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-quality metric (MASE shape): per event type, the mean
    absolute error of the naive forecast (yesterday's value) scaled by
    the seasonal-naive error (same weekday last week) — <1 means
    'yesterday' beats 'last week', the standard scale-free baseline
    comparison before any real model ships. Daily totals are exact
    decimal sums; both error sums restrict to the same scored rows
    (where the 7-lag exists) so the ratio is well-defined; one window
    over the (days × types)-sized frame, floor-fixed output."""
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.sum(dec("value")).cast("double").alias("total"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type", "day", "total",
        F.lag("total", 1).over(w).alias("prev1"),
        F.lag("total", 7).over(w).alias("prev7"),
    )
    scored = F.col("prev7").isNotNull()
    return lagged.groupBy("event_type").agg(
        F.count(F.col("prev7")).alias("n_scored"),
        (
            F.floor(
                F.sum(
                    F.when(scored, F.abs(F.col("total") - F.col("prev1")))
                )
                * F.lit(1000000.0)
                / F.sum(
                    F.when(scored, F.abs(F.col("total") - F.col("prev7")))
                )
            )
            / F.lit(1000000.0)
        ).alias("mase_naive1_vs_seasonal7"),
    )


@query(
    "win_longest_streak",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, DATE_TRUNC('day', ts) AS day
      FROM events WHERE event_type = 'purchase'
    ), grp AS (
      SELECT user_id, day,
             day - INTERVAL 1 DAY * ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY day) AS anchor
      FROM days
    ), streaks AS (
      SELECT user_id, COUNT(*) AS streak_len, MIN(day) AS streak_start
      FROM grp GROUP BY user_id, anchor
    )
    SELECT user_id, streak_len, streak_start
    FROM streaks
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY streak_len DESC, streak_start) = 1
    """,
)
def win_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user (purchases):
    the classic gaps-and-islands variant — day minus row_number-days is
    CONSTANT within a consecutive run, so grouping by that anchor turns
    streaks into plain aggregates. Engagement/retention feature. One
    window per user's distinct days (dedup first, so the window frame is
    days-sized, never event-sized), one aggregate, one argmax."""
    ev = table(spark, sf_dir, "events")
    days = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.date_trunc("day", "ts").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    grp = days.select(
        "user_id", "day",
        (
            F.col("day").cast("long")
            - F.row_number().over(w) * F.lit(86400)
        ).alias("anchor"),
    )
    streaks = grp.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("streak_len"),
        F.min("day").alias("streak_start"),
    )
    best = Window.partitionBy("user_id").orderBy(
        F.desc("streak_len"), F.asc("streak_start")
    )
    return (
        streaks.withColumn("_rk", F.row_number().over(best))
        .filter(F.col("_rk") == 1)
        .select("user_id", "streak_len", "streak_start")
    )
