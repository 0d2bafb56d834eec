"""TPC-H queries 2, 8, 11, 12, 15, 16, 17, 20, 21 — fixture-adapted.

Completes the 22-query TPC-H surface (with q1/3/4/5/6/7/9/10/13/14/18/19/22
in ``tpch.py``). The driver fixtures carry no ``partsupp`` table and no
``l_commitdate``/``l_receiptdate``/``l_shipmode`` columns, so queries that
need them are *adapted, preserving the operator shape that makes each query
interesting*:

- a **derived partsupp** stands in wherever the original reads partsupp: the
  distinct ``(l_partkey, l_suppkey)`` pairs observed in lineitem, with unit
  cost ``MIN(l_extendedprice / l_quantity)`` (q2, q11, q16, q20);
- **lateness** is ``l_shipdate > o_orderdate + INTERVAL n days`` instead of
  receipt-vs-commit dates (q12, q21).

Operator shapes preserved per query: q2 correlated-MIN subquery; q8
conditional market-share ratio; q11 HAVING against a scalar subquery; q12
CASE-sum pivot; q15 scalar-MAX subquery (view in the original); q16
count-distinct with NOT IN; q17 per-group AVG correlated subquery; q20
nested IN chains; q21 EXISTS/NOT-EXISTS over a self-join.

Scale notes (100 TB design): the derived partsupp is an aggregation of
lineitem on ``(l_partkey, l_suppkey)`` — a map-side-combinable hash agg that
shrinks the fact table ~4× before any join; every dimension join below it is
a broadcast. Correlated per-part/per-order MIN/AVG subqueries are expressed
as a second aggregation on the *already-shuffled* key followed by a re-join
on that same key, so AQE can reuse the exchange rather than introduce a new
shuffle shape.

Reference parity: rtdl delegates this whole SQL surface to Dremio over the
datasets it registers (reference ``README.md:22-23``, dataset promotion
``ingester/ingester.go:944-988``); our engine owns it natively (SURVEY.md
§2B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rtdl_spark.catalog import table
from rtdl_spark.queries import query
from rtdl_spark.queries._util import DEC, REVENUE_SQL, dec, dsum, revenue_expr

# Derived-partsupp SQL fragment shared by the oracles of q2/q11/q16/q20.
PARTSUPP_SQL = """
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         MIN(l_extendedprice / l_quantity) AS ps_supplycost,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS ps_qty
  FROM lineitem GROUP BY l_partkey, l_suppkey
"""


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stand-in partsupp: observed (part, supplier) pairs with unit cost.

    MIN over doubles and the exact decimal SUM are both order-insensitive,
    so Spark and DuckDB agree bit-for-bit. One map-side-combinable hash agg
    over lineitem; at 100 TB this is the single big shuffle feeding q2/q11/
    q16/q20, and it shrinks the data before every subsequent join.
    """
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"),
        dsum(dec("l_quantity")).alias("ps_qty"),
    )


@query(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH partsupp AS ({PARTSUPP_SQL})
    SELECT CAST(s_acctbal AS DOUBLE) AS s_acctbal, s_name, n_name,
           p_partkey, p_brand, ps_supplycost
    FROM part
      JOIN partsupp ON p_partkey = ps_partkey
      JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE p_size = 15 AND p_type = 'PROMO' AND r_name = 'EUROPE'
      AND ps_supplycost = (
        SELECT MIN(ps2.ps_supplycost)
        FROM partsupp ps2
          JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
          JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
          JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
        WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 adapted: cheapest EUROPE supplier per PROMO size-15 part.

    The correlated MIN subquery becomes a per-part MIN aggregation re-joined
    on ``p_partkey`` — same key as the main join, so no extra shuffle shape.
    supplier/nation/region are broadcast.
    """
    ps = derived_partsupp(spark, sf_dir)
    supp_eu = (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part = (
        table(spark, sf_dir, "part")
        .filter((F.col("p_size") == 15) & (F.col("p_type") == "PROMO"))
        .select("p_partkey", "p_brand")
    )
    eu_offers = ps.join(
        F.broadcast(supp_eu), F.col("ps_suppkey") == F.col("s_suppkey")
    ).join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
    # Correlated MIN as a window over ps_partkey: one pass over the offers
    # frame instead of a second aggregation + self-join (which the static
    # planner would compute twice; AQE reuse is runtime-only).
    w = Window.partitionBy("ps_partkey")
    return (
        eu_offers.withColumn("min_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .select(
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            "ps_supplycost",
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q8_national_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
           CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT year(o_orderdate) AS o_year, {REVENUE_SQL} AS volume,
             n2.n_name AS supp_nation
      FROM part JOIN lineitem ON p_partkey = l_partkey
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN orders   ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation n1 ON c_nationkey = n1.n_nationkey
                JOIN region    ON n1.n_regionkey = r_regionkey
                JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                            AND TIMESTAMP '1997-12-31'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 adapted: NATION_5's share of ASIA PROMO revenue by year.

    Conditional-aggregate ratio. Exact-decimal numerator/denominator sums
    with one final double division keep both engines bit-identical. All
    five dimension tables broadcast; lineitem⋈orders is the only shuffle.
    """
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    part = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp_ntz"),
            F.lit("1997-12-31").cast("timestamp_ntz"),
        )
    )
    vol = revenue_expr()
    nation5 = F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        table(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(table(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(
            F.broadcast(table(spark, sf_dir, "supplier")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (F.sum(nation5).cast("double") / F.sum(vol).cast("double")).alias(
                "mkt_share"
            )
        )
        .orderBy("o_year")
    )


@query(
    "q11_important_stock",
    oracle=f"""
    WITH natline AS (
      SELECT l_partkey AS ps_partkey,
             {DEC('l_extendedprice')} * {DEC('l_quantity')} AS line_value
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                    JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
    )
    SELECT ps_partkey, CAST(SUM(line_value) AS DOUBLE) AS stock_value
    FROM natline
    GROUP BY ps_partkey
    HAVING CAST(SUM(line_value) AS DOUBLE) >
      (SELECT CAST(SUM(line_value) AS DOUBLE) * 0.001 FROM natline)
    ORDER BY stock_value DESC, ps_partkey
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 adapted: parts whose NATION_3 stock value (extendedprice ×
    quantity over that nation's suppliers' lineitems) exceeds 0.1% of the
    nation total — the original's HAVING against a scalar subquery.

    The scalar total reuses the same pre-aggregated frame (one shuffle on
    ps_partkey, then a broadcast of the 1-row total). The value expression
    is a pure DECIMAL product/sum — exact and order-insensitive on both
    engines — cast to DOUBLE only for the final threshold compare (double
    multiply is IEEE-deterministic).
    """
    natline = (
        table(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(
                table(spark, sf_dir, "supplier")
                .join(
                    F.broadcast(
                        table(spark, sf_dir, "nation").filter(
                            F.col("n_name") == "NATION_3"
                        )
                    ),
                    F.col("s_nationkey") == F.col("n_nationkey"),
                )
                .select("s_suppkey")
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            (dec("l_extendedprice") * dec("l_quantity")).alias("line_value"),
        )
    )
    per_part = natline.groupBy("ps_partkey").agg(
        F.sum("line_value").cast("double").alias("stock_value")
    )
    total = natline.agg(
        (F.sum("line_value").cast("double") * F.lit(0.001)).alias("threshold")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("stock_value") > F.col("threshold"))
        .select("ps_partkey", "stock_value")
        .orderBy(F.desc("stock_value"), "ps_partkey")
    )


@query(
    "q12_priority_shipping",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 adapted: late-shipment priority pivot, grouped by
    l_linestatus (fixture has no l_shipmode); "late" = shipped more than 30
    days after the order date. CASE-sum pivot over one fact-fact join."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority", "o_orderdate")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM({REVENUE_SQL}) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue — the
    original's view + scalar-MAX subquery.

    Revenue stays DECIMAL (exact) until after the MAX-equality join, so the
    tie comparison is exact on both engines. The 1-row MAX is broadcast.
    """
    rev = (
        table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(revenue_expr()).alias("total_revenue_dec"))
    )
    # Scalar MAX as an unpartitioned window over the *aggregated* frame —
    # one row per supplier, so the single-partition window is tiny even at
    # 100 TB of lineitem; avoids re-computing the revenue agg for the MAX.
    w = Window.partitionBy()
    return (
        rev.withColumn("max_revenue", F.max("total_revenue_dec").over(w))
        .filter(F.col("total_revenue_dec") == F.col("max_revenue"))
        .join(
            F.broadcast(table(spark, sf_dir, "supplier")),
            F.col("supplier_no") == F.col("s_suppkey"),
        )
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue_dec").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "q16_supplier_part_counts",
    oracle=f"""
    WITH partsupp AS ({PARTSUPP_SQL})
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT ps_suppkey) AS supplier_cnt
    FROM partsupp JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'ECONOMY'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND ps_suppkey NOT IN
        (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 adapted: distinct supplier counts per (brand, type, size),
    excluding suppliers with negative balances (the NOT-IN arm; the fixture
    has no supplier comments). NOT IN → broadcast LEFT ANTI join."""
    ps = derived_partsupp(spark, sf_dir)
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "ECONOMY")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    bad_supp = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0.0)
        .select("s_suppkey")
    )
    return (
        ps.join(F.broadcast(bad_supp), F.col("ps_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "q17_small_quantity_revenue",
    oracle=f"""
    SELECT CAST(SUM({DEC('l_extendedprice')}) AS DOUBLE) / 7.0 AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23' AND p_type = 'SMALL'
      AND l_quantity < (
        SELECT 0.5 * (CAST(SUM({DEC('l_quantity')}) AS DOUBLE) / COUNT(*))
        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 adapted (p_container → p_type): revenue lost to
    small-quantity orders; correlated per-part AVG subquery.

    The per-part average becomes a groupBy on ``l_partkey`` re-joined to the
    filtered fact on the same key. The average is computed as exact-decimal
    SUM / COUNT with a single double division, identical in both engines.
    """
    li = table(spark, sf_dir, "lineitem")
    part = (
        table(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#23") & (F.col("p_type") == "SMALL"))
        .select("p_partkey")
    )
    # The correlated average only matters for the filtered parts — semi-join
    # before aggregating so the avg-side agg touches ~1/n_brands of lineitem
    # instead of all of it (result-identical: the outer join restricts to
    # those parts anyway).
    avg_qty = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy(F.col("l_partkey").alias("aq_partkey"))
        .agg(
            (
                F.lit(0.5)
                * (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1)))
            ).alias("half_avg")
        )
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(avg_qty, F.col("l_partkey") == F.col("aq_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q20_promo_part_suppliers",
    oracle=f"""
    WITH partsupp AS ({PARTSUPP_SQL})
    SELECT s_name, s_suppkey
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
      AND s_suppkey IN (
        SELECT ps_suppkey FROM partsupp
        WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
          AND ps_qty > (
            SELECT 0.5 * CAST(SUM({DEC('l_quantity')}) AS DOUBLE)
            FROM lineitem
            WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
              AND l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'))
    ORDER BY s_name, s_suppkey
    """,
)
def q20_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 adapted: NATION_3 suppliers holding more PROMO-part stock
    than half of what they shipped in 1997 — the original's nested
    IN-subquery chain (supplier ⊂ partsupp ⊂ part, with a correlated
    quantity threshold).

    Each IN becomes a LEFT SEMI join; the correlated 1997-shipment total is
    an aggregation on the same (partkey, suppkey) grouping re-joined to the
    derived partsupp, then a LEFT OUTER join (pairs with no 1997 shipments
    pass the threshold vacuously, matching SQL's NULL-comparison semantics
    via COALESCE... the oracle's `>` on a NULL scalar subquery is false, so
    we inner-require the threshold row — see the filter below).
    """
    promo = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    # Single-pass conditional aggregate: all-time quantity and the 1997
    # half-quantity come from ONE groupBy over lineitem instead of the
    # derived-partsupp agg PLUS a second filtered scan+agg — at 100 TB that
    # halves the dominant scan. Pairs with no 1997 shipments get a NULL
    # threshold, and NULL comparisons are false — exactly the oracle's
    # correlated-subquery semantics.
    in_97 = (
        F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz")
    ) & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    pair_stats = (
        table(spark, sf_dir, "lineitem")
        .join(F.broadcast(promo), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("ps_qty"),
            (
                F.lit(0.5)
                * F.sum(F.when(in_97, dec("l_quantity"))).cast("double")
            ).alias("half_shipped"),
        )
    )
    qualified = pair_stats.filter(F.col("ps_qty") > F.col("half_shipped")).select(
        "ps_suppkey"
    )
    return (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(qualified, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi")
        .select("s_name", "s_suppkey")
        .orderBy("s_name", "s_suppkey")
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    WITH order_stats AS (
      SELECT l_orderkey AS so_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supps,
             COUNT(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                                 THEN l_suppkey END) AS n_late_supps
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
      GROUP BY l_orderkey
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN order_stats ON l_orderkey = so_orderkey
    WHERE o_orderstatus = 'F'
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND n_name = 'NATION_1'
      AND n_supps > 1 AND n_late_supps = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 adapted: NATION_1 suppliers who were the *sole* late
    supplier on a finalized multi-supplier order ("late" = shipped >60 days
    after the order date; the fixture has no commit/receipt dates).

    The original's EXISTS (another supplier on the order) and NOT EXISTS
    (another *late* supplier) pair is expressed as one per-order aggregation
    — ``n_supps > 1 AND n_late_supps = 1`` — which is the scalable plan: a
    single extra hash agg on the already-shuffled l_orderkey instead of two
    self-joins of the 100 TB fact table.
    """
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    lo = (
        table(spark, sf_dir, "lineitem")
        .join(
            table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("l_orderkey", "l_suppkey", late.alias("is_late"))
    )
    stats = lo.groupBy(F.col("l_orderkey").alias("so_orderkey")).agg(
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "n_late_supps"
        ),
    )
    nat_supp = (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        lo.filter(F.col("is_late"))
        .join(
            stats.filter((F.col("n_supps") > 1) & (F.col("n_late_supps") == 1)),
            F.col("l_orderkey") == F.col("so_orderkey"),
        )
        .join(F.broadcast(nat_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
