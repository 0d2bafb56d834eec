"""Join-type coverage (SURVEY.md §2B joins): inner/left/right/full/cross,
semi/anti, theta (non-equi), broadcast, as-of, banded range.

Scale notes: every equi join keys on natural keys so the shuffle hashes
evenly; dimension sides are broadcast explicitly; the non-equi joins are
either bounded (dim×dim) or banded into equi joins (see operators.asof).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rtdl_spark.catalog import table
from rtdl_spark.operators.asof import asof_join, banded_range_join
from rtdl_spark.queries import query
from rtdl_spark.queries._util import dec, dsum


@query(
    "join_inner_segment_revenue",
    oracle="""
    SELECT c_mktsegment,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def join_inner_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            dsum(dec("o_totalprice")).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query(
    "join_left_outer_orderless",
    oracle="""
    SELECT c_nationkey, COUNT(*) AS n_customers,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_orderless
    FROM customer LEFT OUTER JOIN (SELECT DISTINCT o_custkey FROM orders) o
      ON c_custkey = o_custkey
    GROUP BY c_nationkey
    """,
)
def join_left_outer_orderless(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER with null-probe aggregation (customers with no orders)."""
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = table(spark, sf_dir, "orders").select("o_custkey").distinct()
    return (
        cust.join(o, cust.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias(
                "n_orderless"
            ),
        )
    )


@query(
    "join_right_outer_nation_suppliers",
    oracle="""
    SELECT n_nationkey, n_name, COUNT(s_suppkey) AS n_suppliers
    FROM supplier RIGHT OUTER JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_nationkey, n_name
    """,
)
def join_right_outer_nation_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = table(spark, sf_dir, "nation")
    return (
        supp.join(nation, supp.s_nationkey == nation.n_nationkey, "right_outer")
        .groupBy("n_nationkey", "n_name")
        .agg(F.count("s_suppkey").alias("n_suppliers"))
    )


@query(
    "join_full_outer_nation_presence",
    oracle="""
    SELECT COALESCE(c.k, s.k) AS nationkey,
           COALESCE(c.n_cust, 0) AS n_cust,
           COALESCE(s.n_supp, 0) AS n_supp
    FROM (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
    FULL OUTER JOIN
         (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
      ON c.k = s.k
    """,
)
def join_full_outer_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("ck"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("sk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return c.join(s, c.ck == s.sk, "full_outer").select(
        F.coalesce(c.ck, s.sk).alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@query(
    "join_semi_customers_with_f_orders",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    GROUP BY c_mktsegment
    """,
)
def join_semi_customers_with_f_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        cust.join(o, cust.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "join_anti_parts_never_ordered",
    oracle="""
    SELECT p_brand, COUNT(*) AS n_unordered
    FROM part
    WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
    GROUP BY p_brand
    """,
)
def join_anti_parts_never_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    li = table(spark, sf_dir, "lineitem").select("l_partkey")
    return (
        part.join(li, part.p_partkey == li.l_partkey, "left_anti")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_unordered"))
    )


@query(
    "join_cross_region_status",
    oracle="""
    SELECT r_name, o_orderstatus
    FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    """,
)
def join_cross_region_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = table(spark, sf_dir, "region").select("r_name")
    status = table(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return region.crossJoin(status)


@query(
    "join_theta_acctbal_dominance",
    oracle="""
    SELECT s_nationkey AS nationkey, COUNT(*) AS n_pairs
    FROM supplier JOIN customer
      ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
    GROUP BY s_nationkey
    """,
)
def join_theta_acctbal_dominance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi key + inequality residual (theta join). The equi part keeps it a
    hash join; the inequality is a post-filter, never a cartesian product."""
    supp = table(spark, sf_dir, "supplier").select("s_nationkey", "s_acctbal")
    cust = table(spark, sf_dir, "customer").select("c_nationkey", "c_acctbal")
    return (
        supp.join(
            cust,
            (supp.s_nationkey == cust.c_nationkey)
            & (supp.s_acctbal > cust.c_acctbal),
        )
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@query(
    "join_broadcast_nation_rollup",
    oracle="""
    SELECT r_name, n_name,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def join_broadcast_nation_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast of both dims — zero shuffle on the fact side until
    the final aggregation."""
    supp = table(spark, sf_dir, "supplier")
    nation = F.broadcast(table(spark, sf_dir, "nation"))
    region = F.broadcast(table(spark, sf_dir, "region"))
    return (
        supp.join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(dsum(dec("s_acctbal")).alias("total_bal"))
    )


@query(
    "join_asof_last_order",
    oracle="""
    SELECT e.event_id, e.user_id,
           (SELECT max(o.o_orderdate) FROM orders o
            WHERE o.o_custkey = e.user_id
              AND o.o_orderdate <= CAST(e.ts AS TIMESTAMP)) AS last_order_date
    FROM events e
    WHERE e.event_type = 'purchase'
    """,
)
def join_asof_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase event picks up the most recent order date of
    the matching customer (union + window construction, one shuffle/side)."""
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts")
    )
    orders = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderdate"
    )
    out = asof_join(
        ev,
        orders,
        on="user_id",
        left_time="ts",
        right_time="o_orderdate",
        value_cols=["o_orderdate"],
        direction="backward",
    )
    return out.select(
        "event_id", "user_id", F.col("o_orderdate").alias("last_order_date")
    )


@query(
    "join_range_part_size_pairs",
    oracle="""
    SELECT p1.p_brand, COUNT(*) AS n_pairs
    FROM part p1 JOIN part p2
      ON p1.p_brand = p2.p_brand
     AND abs(p1.p_size - p2.p_size) <= 2
     AND p1.p_partkey < p2.p_partkey
    GROUP BY p1.p_brand
    """,
)
def join_range_part_size_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded range join: |size₁ − size₂| ≤ 2 becomes an equi join on
    (brand, size-band) with 3× replication of one side — hash join, not
    cartesian, so it survives a 100× scale-up."""
    p1 = table(spark, sf_dir, "part").select(
        F.col("p_brand"), F.col("p_size").alias("size1"),
        F.col("p_partkey").alias("key1"),
    )
    p2 = table(spark, sf_dir, "part").select(
        F.col("p_brand").alias("brand2"), F.col("p_size").alias("size2"),
        F.col("p_partkey").alias("key2"),
    ).withColumnRenamed("brand2", "p_brand")
    joined = banded_range_join(
        p1, p2, key="p_brand", left_val="size1", right_val="size2", width=2.0,
        extra_cond=F.col("key1") < F.col("key2"),
    )
    return joined.groupBy(p1.p_brand).agg(F.count(F.lit(1)).alias("n_pairs"))


@query(
    "join_interval_attribution",
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
def join_interval_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join (batch twin of streaming.stream_interval_join): each
    click paired with the same user's purchases inside [ts, ts+10min].
    The user_id equality keeps this a hash/sort-merge equi join with the
    time bound as a join filter — never a cartesian — so it scales with
    the key cardinality, and the identical condition runs unbounded under
    two watermarked streams (tests/test_streaming.py)."""
    ev = table(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("c_ts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    return (
        c.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 10 minutes")),
        )
        .select("click_id", "purchase_id", "user_id")
    )


@query(
    "join_asof_tolerance_error_context",
    oracle="""
    SELECT c.event_id,
           (SELECT e.event_id FROM events e
            WHERE e.user_id = c.user_id AND e.event_type = 'error'
              AND e.ts <= c.ts
              AND e.ts >= c.ts - INTERVAL 10 MINUTE
            ORDER BY e.ts DESC, e.event_id DESC LIMIT 1) AS last_error_id
    FROM events c
    WHERE c.event_type = 'click'
    """,
)
def join_asof_tolerance_error_context(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tolerance-bounded as-of join (operators/asof.py, merge_asof
    semantics): each click attaches the user's most recent error, but
    only within a 10-minute lookback — a stale error is NULLed, not
    attached. Same single-window union plan; the matched right time
    rides along so the gap check is free."""
    from rtdl_spark.operators.asof import asof_join

    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("ts").alias("err_ts"),
        F.col("event_id").alias("last_error_id"),
    )
    out = asof_join(
        clicks,
        errors,
        "user_id",
        "ts",
        "err_ts",
        ["last_error_id"],
        tolerance="10 minutes",
    )
    return out.select("event_id", "last_error_id")


@query(
    "join_hint_shuffle_hash",
    oracle="""
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    """,
)
def join_hint_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit join-strategy control: the SHUFFLE_HASH hint forces a
    ShuffledHashJoin (build a hash map per partition — no sort of either
    side) where the planner would otherwise pick sort-merge or
    broadcast. The fact⋈fact case where this wins at scale: both sides
    already too big to broadcast, one side's PER-PARTITION slice still
    fits in memory — SMJ's two sorts are pure overhead. Same answer by
    construction; the strategy is pinned by the plan gate."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    joined = li.join(
        o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey
    )
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(dec("l_quantity")).cast("double").alias("total_qty"),
    )


@query(
    "join_null_safe_eq",
    oracle="""
    WITH a AS (
      SELECT NULLIF(o_custkey % 7, 3) AS k, COUNT(*) AS n_orders
      FROM orders GROUP BY 1
    ), b AS (
      SELECT NULLIF(c_custkey % 7, 3) AS k, COUNT(*) AS n_customers
      FROM customer GROUP BY 1
    )
    SELECT a.k, a.n_orders, b.n_customers
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing — the join you need when the key
    is an optional attribute and 'both missing' is a real match. Still a
    plain hash equi-join (null-safe equality is hashable: NULL gets its
    own bucket), never a nested loop."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    a = o.groupBy(
        F.nullif(F.col("o_custkey") % 7, F.lit(3)).alias("k")
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    b = c.groupBy(
        F.nullif(F.col("c_custkey") % 7, F.lit(3)).alias("ck")
    ).agg(F.count(F.lit(1)).alias("n_customers"))
    return (
        a.join(b, F.col("k").eqNullSafe(F.col("ck")))
        .select("k", "n_orders", "n_customers")
    )


@query(
    "join_temporal_validity",
    oracle="""
    WITH vers AS (
      SELECT c_custkey,
             c_custkey % 3 AS v,
             TIMESTAMP '1995-01-01' + INTERVAL 200 DAY * (c_custkey % 3)
               AS valid_from,
             CASE WHEN c_custkey % 3 < 2
                  THEN TIMESTAMP '1995-01-01'
                       + INTERVAL 200 DAY * (c_custkey % 3 + 1)
                  ELSE TIMESTAMP '9999-12-31' END AS valid_to,
             'seg_v' || CAST(c_custkey % 3 AS VARCHAR) AS segment_then
      FROM customer
    )
    SELECT o.o_orderkey, o.o_custkey, v.segment_then
    FROM orders o JOIN vers v
      ON v.c_custkey = o.o_custkey
     AND o.o_orderdate >= v.valid_from AND o.o_orderdate < v.valid_to
    WHERE o.o_orderkey % 7 = 0
    """,
)
def join_temporal_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal validity) join: each fact row matches the
    dimension VERSION whose [valid_from, valid_to) interval contains the
    event time — the SCD2 lookup that makes features training-serving
    consistent (no time travel leakage). Version intervals are derived
    deterministically from the fixture (it ships no SCD2 table). Still a
    hash equi-join on the key — the interval predicate is a post-join
    filter, so there is no nested loop; with at most a few versions per
    key the fan-out is bounded."""
    c = table(spark, sf_dir, "customer")
    base = F.to_timestamp(F.lit("1995-01-01"))
    v = F.col("c_custkey") % 3
    vers = c.select(
        "c_custkey",
        (base + F.expr("INTERVAL 200 DAYS") * v).alias("valid_from"),
        F.when(
            v < 2, base + F.expr("INTERVAL 200 DAYS") * (v + 1)
        ).otherwise(F.to_timestamp(F.lit("9999-12-31"))).alias("valid_to"),
        F.concat(F.lit("seg_v"), v.cast("string")).alias("segment_then"),
    )
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    return o.join(
        vers,
        (F.col("c_custkey") == F.col("o_custkey"))
        & (F.col("o_orderdate") >= F.col("valid_from"))
        & (F.col("o_orderdate") < F.col("valid_to")),
    ).select("o_orderkey", "o_custkey", "segment_then")


@query(
    "join_inequality_bnl",
    oracle="""
    WITH thresholds AS (
      SELECT r_regionkey AS tier, 1000.0 * (r_regionkey + 1) AS cutoff
      FROM region
    )
    SELECT t.tier, COUNT(*) AS n_accounts,
           CAST(SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_negative
    FROM customer c JOIN thresholds t ON c.c_acctbal <= t.cutoff
    GROUP BY t.tier
    """,
)
def join_inequality_bnl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-inequality join (NO equi key): every customer × every
    threshold tier it falls under — banding/tiering against a rule table.
    With no hashable key Catalyst must pick BroadcastNestedLoopJoin; that
    is the RIGHT plan exactly when one side is rule-table-sized (5 rows
    here): the fact side streams once, never shuffles, and each row
    evaluates |rules| predicates. The plan gate pins the broadcast side
    so a regression to a cartesian shuffle join is caught. For large BOTH
    sides, use banded_range_join (bucketed equi-join) instead."""
    r = table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("tier"),
        (1000.0 * (F.col("r_regionkey") + 1)).alias("cutoff"),
    )
    c = table(spark, sf_dir, "customer")
    return (
        c.join(F.broadcast(r), F.col("c_acctbal") <= F.col("cutoff"))
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_accounts"),
            F.sum(F.when(F.col("c_acctbal") < 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_negative"),
        )
    )
