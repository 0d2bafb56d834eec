"""TPC-H-shaped analytical queries over the star schema.

This is the headline slice of the SQL surface rtdl delegates to Dremio
(SURVEY.md §2B) — scans, multi-way joins, filtered aggregation, group-by,
top-k — expressed as declarative DataFrame plans so Catalyst handles
pushdown, join selection (broadcast for the small dims), and AQE re-planning.

Scale notes (100 TB design): all fact-fact joins key on the natural join
columns so they hash-partition cleanly; dimension tables (region, nation,
and customer/part at the small end) are broadcast — no shuffle of the fact
side; every query filters on pushdown-able predicates before any join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rtdl_spark.catalog import table
from rtdl_spark.queries import query
from rtdl_spark.queries._util import DEC, REVENUE_SQL, dec, dsum, revenue_expr


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM({DEC('l_quantity')}) AS DOUBLE) AS sum_qty,
           CAST(SUM({DEC('l_extendedprice')}) AS DOUBLE) AS sum_base_price,
           CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS sum_disc_price,
           CAST(SUM({REVENUE_SQL} * (CAST(1 AS DECIMAL(18,2)) + {DEC('l_tax')})) AS DOUBLE) AS sum_charge,
           CAST(SUM({DEC('l_quantity')}) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM({DEC('l_extendedprice')}) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM({DEC('l_discount')}) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: single-pass scan + hash aggregate; no shuffle beyond the
    final partial/merge agg. Predicate + column pruning push to parquet."""
    li = table(spark, sf_dir, "lineitem")
    disc_price = revenue_expr()
    charge = disc_price * (F.lit(1).cast("decimal(18,2)") + dec("l_tax"))
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(dec("l_quantity")).alias("sum_qty"),
            dsum(dec("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            (F.sum(dec("l_quantity")).cast("double") / n).alias("avg_qty"),
            (F.sum(dec("l_extendedprice")).cast("double") / n).alias("avg_price"),
            (F.sum(dec("l_discount")).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT o_orderkey,
           CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: filtered 3-way join + agg + top-k. The customer side is
    broadcast after its segment filter; lineitem⋈orders is the only shuffle."""
    cutoff = F.lit("1998-03-15").cast("timestamp_ntz")
    cust = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue_expr()).alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01'
      AND o_orderdate < TIMESTAMP '1997-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 adapted (no commitdate in fixture): LEFT SEMI join implements
    EXISTS without materializing lineitem columns."""
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp_ntz"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name,
           CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 — the flagship 6-table join. nation/region/supplier are
    broadcast (dim side), so the only big shuffle is lineitem⋈orders."""
    t = {n: table(spark, sf_dir, n) for n in
         ("customer", "orders", "lineitem", "supplier", "nation", "region")}
    dims = (
        t["supplier"]
        .join(F.broadcast(t["nation"]),
              t["supplier"].s_nationkey == t["nation"].n_nationkey)
        .join(F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
              t["nation"].n_regionkey == t["region"].r_regionkey)
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    return (
        t["lineitem"]
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(dims),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(dsum(revenue_expr()).alias("revenue"))
        .orderBy(F.desc("revenue"))
    )


@query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT CAST(SUM({DEC('l_extendedprice')} * {DEC('l_discount')}) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan+filter+agg — every predicate pushes to parquet."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(dec("l_extendedprice") * dec("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year, {REVENUE_SQL} AS volume
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                    JOIN orders   ON o_orderkey = l_orderkey
                    JOIN customer ON c_custkey = o_custkey
                    JOIN nation n1 ON s_nationkey = n1.n_nationkey
                    JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_7')
          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_2'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: nation-pair trade volume by year; both nation dims broadcast."""
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp_ntz"),
            F.lit("1997-12-31").cast("timestamp_ntz"),
        )
    )
    supp = table(spark, sf_dir, "supplier")
    return (
        li.join(table(spark, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(table(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_2"))
        )
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(revenue_expr()).alias("revenue"))
    )


@query(
    "q9_product_type_profit",
    oracle=f"""
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS profit
    FROM lineitem JOIN part     ON p_partkey = l_partkey
                  JOIN supplier ON s_suppkey = l_suppkey
                  JOIN orders   ON o_orderkey = l_orderkey
                  JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_type = 'PROMO'
    GROUP BY n_name, year(o_orderdate)
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 adapted (no partsupp in fixture): profit by nation×year for
    one part type. part/supplier/nation broadcast; lineitem⋈orders shuffles."""
    part = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    return (
        table(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(table(spark, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(table(spark, sf_dir, "supplier")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(table(spark, sf_dir, "nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("o_year"))
        .agg(dsum(revenue_expr()).alias("profit"))
    )


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS revenue,
           CAST(c_acctbal AS DOUBLE) AS c_acctbal, n_name
    FROM customer JOIN orders   ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-10-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: returned-item revenue ranking, top 20."""
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-10-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(table(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(table(spark, sf_dir, "nation")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(revenue_expr()).alias("revenue"))
        .select("c_custkey", "c_name", "revenue",
                F.col("c_acctbal").cast("double").alias("c_acctbal"), "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: LEFT OUTER join with an extra join predicate, then a
    two-level aggregation (count per customer → histogram)."""
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q14_promo_revenue_share",
    oracle=f"""
    SELECT CAST(100.0 AS DOUBLE) *
           CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {REVENUE_SQL}
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
           CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: conditional aggregation ratio; part is broadcast."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp_ntz"))
    )
    part = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = revenue_expr()
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "q18_large_volume_customer",
    oracle=f"""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(SUM({DEC('l_quantity')}) AS DOUBLE) AS total_qty
    FROM customer JOIN orders   ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM({DEC('l_quantity')}) > 120
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: aggregate-subquery semi join (HAVING > threshold).

    Plan note: the per-order quantity aggregate IS the quantity the output
    needs, so the filtered aggregate joins in directly — one lineitem
    scan + one hash agg, instead of the naive semi-join + second full
    lineitem scan + re-aggregation (which doubles the biggest scan in the
    query; at 100 TB that's the difference that matters). The >120 filter
    also makes the aggregate side tiny, so its joins broadcast.
    """
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("q"))
        .filter(F.col("q") > 120)
        .select(
            F.col("l_orderkey").alias("big_orderkey"),
            F.col("q").cast("double").alias("total_qty"),
        )
    )
    orders = table(spark, sf_dir, "orders")
    return (
        orders.join(big, orders.o_orderkey == big.big_orderkey)
        .join(table(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate",
                F.col("o_totalprice").cast("double").alias("o_totalprice"),
                "total_qty")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@query(
    "q19_theta_or_predicates",
    oracle=f"""
    SELECT CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS revenue, COUNT(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 21)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 40)
    """,
)
def q19_theta_or_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: equi join + disjunctive residual predicates (theta-style)."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & (q >= 1) & (q <= 21))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
           & (q >= 10) & (q <= 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35)
           & (q >= 20) & (q <= 40))
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(dsum(revenue_expr()).alias("revenue"), F.count(F.lit(1)).alias("n"))
    )


@query(
    "q22_global_sales_opportunity",
    oracle="""
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 adapted: scalar-subquery threshold + anti join.

    The AVG threshold is computed on doubles in both engines over the same
    values in an order-insensitive-safe way: AVG over doubles is not
    associativity-safe in general, but it is only used as a filter threshold;
    values at the boundary would need to be within ~1e-10 of the average,
    which the 2-decimal fixture data cannot produce.
    """
    cust = table(spark, sf_dir, "customer")
    threshold = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("t")
    )
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .join(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("t"))
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(dec("c_acctbal")).alias("totacctbal"),
        )
    )
