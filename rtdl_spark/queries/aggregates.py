"""Aggregation coverage (SURVEY.md §2B): hash aggregates, distinct
aggregates, rollup/cube/grouping sets, having, statistical moments,
percentiles, approximate sketches, pivot.

All of these are single-shuffle hash aggregates in Spark (partial map-side
combine + final merge); rollup/cube expand the grouping sets before the
shuffle, which AQE then coalesces.

Float parity: money sums go through DECIMAL (exact); genuinely floating
moments (stddev/corr) are rounded to 4-6 decimals on both sides — see
queries/_util.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rtdl_spark.catalog import register_views, table
from rtdl_spark.queries import query
from rtdl_spark.queries._util import DEC, dec, dsum


@query(
    "agg_stats_by_returnflag",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n,
           COUNT(DISTINCT l_partkey) AS n_parts,
           CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_qty,
           CAST(SUM({DEC('l_quantity')}) AS DOUBLE) / COUNT(*) AS avg_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_stats_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.min("l_quantity").cast("double").alias("min_qty"),
        F.max("l_quantity").cast("double").alias("max_qty"),
        (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
    )


@query(
    "agg_count_distinct_by_priority",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(DISTINCT o_orderstatus) AS n_statuses
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_count_distinct_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
    )


@query(
    "agg_rollup_flag_status",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM({DEC('l_extendedprice')}) AS DOUBLE) AS total_price,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dsum(dec("l_extendedprice")).alias("total_price"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_cube_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "agg_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM({DEC('l_quantity')}) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via Spark SQL over the registered lake views —
    the same Catalyst Expand node rollup/cube compile to."""
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "agg_having_filter",
    oracle=f"""
    SELECT l_partkey,
           CAST(SUM({DEC('l_quantity')}) AS DOUBLE) AS total_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_partkey
    HAVING SUM({DEC('l_quantity')}) > 150 AND COUNT(*) >= 3
    """,
)
def agg_having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(
            F.sum(dec("l_quantity")).alias("_q"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter((F.col("_q") > 150) & (F.col("n") >= 3))
        .select(
            "l_partkey", F.col("_q").cast("double").alias("total_qty"), "n"
        )
    )


@query(
    "agg_statistical_moments",
    oracle="""
    SELECT o_orderstatus,
           ROUND(STDDEV_SAMP(o_totalprice), 4) AS sd_price,
           ROUND(VAR_SAMP(o_totalprice), 2) AS var_price,
           ROUND(CORR(o_totalprice, o_custkey), 6) AS corr_price_cust,
           ROUND(COVAR_SAMP(o_totalprice, o_custkey), 2) AS covar_price_cust
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_statistical_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample stddev/variance/correlation/covariance, rounded on both sides
    (different engines use different numerically-stable accumulations)."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.stddev_samp("o_totalprice"), 4).alias("sd_price"),
        F.round(F.var_samp("o_totalprice"), 2).alias("var_price"),
        F.round(F.corr("o_totalprice", "o_custkey"), 6).alias("corr_price_cust"),
        F.round(F.covar_samp("o_totalprice", "o_custkey"), 2).alias(
            "covar_price_cust"
        ),
    )


@query(
    "agg_percentiles",
    oracle="""
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
           ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (both engines use linear
    interpolation on the sorted values)."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", 0.5), 4).alias("median_price"),
        F.round(F.percentile("o_totalprice", 0.9), 4).alias("p90_price"),
    )


@query(
    "agg_approx_count_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS approx_within_5pct
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ sketch count next to the exact count.  The sketch's
    estimate is engine-specific so it can't be value-compared against
    DuckDB; instead the output carries the exact count (oracle-checked)
    plus a boolean asserting the HLL estimate landed within 5 % relative
    error (rsd=0.02 → 5 % is > 2 sigma; HLL is deterministic for a given
    input, so this is a stable bound, not a flake).  The scale story:
    approx_count_distinct is a single-pass, fixed-memory aggregate vs
    countDistinct's expand+shuffle."""
    li = table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    return agg.select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            <= F.col("exact_parts") * F.lit(0.05)
        ).alias("approx_within_5pct"),
    )


_APPROX_PCTS = (0.25, 0.5, 0.9)
# percentile_approx(accuracy=10000) guarantees rank error <= n/10000; the
# bound below checks the sketch value lies between the exact interpolated
# quantiles at p +- 0.01 — 100x the guarantee, so it never flakes while
# still pinning the sketch to the right neighborhood.
_APPROX_EPS = 0.01


@query(
    "agg_approx_percentiles",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT l_returnflag, CAST({p} AS DOUBLE) AS pct,
           ROUND(quantile_cont(l_extendedprice, {p}), 4) AS exact_val,
           TRUE AS approx_in_bounds
    FROM lineitem GROUP BY l_returnflag
    """
        for p in _APPROX_PCTS
    ),
)
def agg_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL/GK-style approximate percentiles (percentile_approx) checked
    against the exact quantiles, exploded to one scalar row per
    (returnflag, pct) so every output cell is hashable by the driver's
    canonicalizer.  The exact side is a real DuckDB oracle (both engines
    interpolate linearly); the approx side is a bound test — the sketch
    value must fall between the exact quantiles at pct ± 0.01 (the
    accuracy=10000 guarantee is ±0.0001 rank error, so the bound holds
    deterministically).  Scale story: percentile_approx is single-pass
    mergeable fixed memory, while exact percentile must materialize and
    sort each group."""
    li = table(spark, sf_dir, "lineitem")
    pcts = list(_APPROX_PCTS)
    lo_p = [max(0.0, p - _APPROX_EPS) for p in pcts]
    hi_p = [min(1.0, p + _APPROX_EPS) for p in pcts]

    def _pct_arr(ps: list[float]) -> F.Column:
        return F.array(*[F.lit(float(p)) for p in ps])

    agg = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", pcts, 10000).alias("approx"),
        F.percentile("l_extendedprice", _pct_arr(pcts)).alias("exact"),
        F.percentile("l_extendedprice", _pct_arr(lo_p)).alias("lo"),
        F.percentile("l_extendedprice", _pct_arr(hi_p)).alias("hi"),
    )
    e = agg.select(
        "l_returnflag",
        "approx",
        "exact",
        "lo",
        "hi",
        F.posexplode(_pct_arr(pcts)).alias("pos", "pct"),
    )
    idx = F.col("pos") + 1
    return e.select(
        "l_returnflag",
        "pct",
        F.round(F.element_at("exact", idx), 4).alias("exact_val"),
        F.element_at("approx", idx)
        .between(F.element_at("lo", idx), F.element_at("hi", idx))
        .alias("approx_in_bounds"),
    )


@query(
    "agg_pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS status_f,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS status_o,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS status_p
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with explicit value list (never let pivot scan for distinct
    values at scale — that is an extra job over the full input)."""
    o = table(spark, sf_dir, "orders")
    out = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "o_orderpriority",
        F.coalesce("F", F.lit(0)).alias("status_f"),
        F.coalesce("O", F.lit(0)).alias("status_o"),
        F.coalesce("P", F.lit(0)).alias("status_p"),
    )


@query(
    "agg_distinct_sum",
    oracle=f"""
    SELECT l_linestatus,
           CAST(SUM(DISTINCT {DEC('l_quantity')}) AS DOUBLE) AS sum_distinct_qty
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def agg_distinct_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.sum_distinct(dec("l_quantity")).cast("double").alias("sum_distinct_qty")
    )


@query(
    "agg_freq_items",
    oracle="""
    WITH tot AS (SELECT COUNT(*) AS total FROM orders),
         c AS (SELECT o_orderpriority, COUNT(*) AS cnt
               FROM orders GROUP BY o_orderpriority)
    SELECT c.o_orderpriority,
           CAST(FLOOR(c.cnt * 1000000 / t.total) AS BIGINT) AS share_ppm,
           TRUE AS in_sketch
    FROM c, tot t
    WHERE c.cnt > t.total * 0.15
    """,
)
def agg_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Karp–Papadimitriou–Shenker frequent-items sketch (df.freqItems) —
    single-pass, fixed memory, false positives possible but never false
    negatives above the support threshold.  Output is the oracle-checkable
    projection of that guarantee: each truly-frequent value (exact share,
    floor-fixed-point ppm — both engines floor the identical IEEE double)
    with a boolean asserting the sketch contained it.  The sketch array
    itself stays out of the output (engine-specific, unhashable)."""
    o = table(spark, sf_dir, "orders")
    support = 0.15
    sketch = o.freqItems(["o_orderpriority"], support=support).select(
        F.col("o_orderpriority_freqItems").alias("freq_list")
    )
    counts = o.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("cnt"))
    tot = o.agg(F.count(F.lit(1)).alias("total"))
    frequent = counts.crossJoin(F.broadcast(tot)).where(
        F.col("cnt") > F.col("total") * support
    )
    return frequent.crossJoin(F.broadcast(sketch)).select(
        "o_orderpriority",
        F.floor(F.col("cnt") * 1000000 / F.col("total"))
        .cast("bigint")
        .alias("share_ppm"),
        F.array_contains("freq_list", F.col("o_orderpriority")).alias(
            "in_sketch"
        ),
    )


@query(
    "agg_unpivot_part_metrics",
    oracle="""
    SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value
    FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS metric,
           CAST(p_retailprice AS DOUBLE) AS value
    FROM part
    """,
)
def agg_unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide → long melt, the inverse of pivot): part's numeric
    columns become (metric, value) rows via the native unpivot operator —
    a zero-shuffle narrow transform (the oracle's UNION ALL is the
    classical rewrite Catalyst avoids re-scanning for)."""
    p = table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
    )
    return p.unpivot(
        ids=["p_partkey"],
        values=["p_size", "p_retailprice"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@query(
    "agg_regression_stats",
    oracle="""
    SELECT o_orderstatus,
           CAST(regr_count(o_totalprice, o_custkey) AS BIGINT) AS n,
           ROUND(regr_slope(o_totalprice, o_custkey), 6) AS slope,
           ROUND(regr_intercept(o_totalprice, o_custkey), 2) AS intercept,
           ROUND(regr_r2(o_totalprice, o_custkey), 6) AS r2,
           ROUND(regr_avgx(o_totalprice, o_custkey), 4) AS avgx,
           ROUND(regr_avgy(o_totalprice, o_custkey), 4) AS avgy
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_regression_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregate family (regr_count/slope/intercept/
    r2/avgx/avgy) — single-pass map-combinable moment accumulation in
    both engines; rounded on both sides (accumulation order differs)."""
    o = table(spark, sf_dir, "orders")
    y, x = F.col("o_totalprice"), F.col("o_custkey")
    return o.groupBy("o_orderstatus").agg(
        F.regr_count(y, x).cast("bigint").alias("n"),
        F.round(F.regr_slope(y, x), 6).alias("slope"),
        F.round(F.regr_intercept(y, x), 2).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.round(F.regr_avgx(y, x), 4).alias("avgx"),
        F.round(F.regr_avgy(y, x), 4).alias("avgy"),
    )


@query(
    "agg_boolean_funcs",
    oracle="""
    SELECT o_orderpriority,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           bool_or(o_orderstatus = 'F') AS any_finished,
           CAST(COUNT(*) FILTER (
             WHERE o_orderdate >= TIMESTAMP '1997-01-01') AS BIGINT)
             AS n_recent,
           CAST(COUNT(*) FILTER (WHERE o_custkey % 2 = 0) AS BIGINT)
             AS n_even_cust
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_boolean_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregate family: bool_and/bool_or (ANSI EVERY/SOME) and
    count_if (FILTER-clause counting) — single-pass map-combinable, the
    assertion-style data-quality checks ('every order over $1k?') that
    otherwise get written as min(case...) hacks."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
        F.count_if(
            F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp")
        ).alias("n_recent"),
        F.count_if(F.col("o_custkey") % 2 == 0).alias("n_even_cust"),
    )


@query(
    "agg_listagg_ordered",
    oracle="""
    SELECT o_orderpriority,
           string_agg(o_orderstatus, '' ORDER BY o_orderkey) AS status_seq,
           md5(string_agg(CAST(o_orderkey AS VARCHAR), ','
                          ORDER BY o_orderkey)) AS key_digest
    FROM orders
    WHERE o_orderkey % 100 = 0
    GROUP BY o_orderpriority
    """,
)
def agg_listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG ... WITHIN GROUP): per
    priority, order statuses concatenated in key order plus an md5
    digest of the key sequence — deterministic because the WITHIN GROUP
    order is total. Exercised through the SQL-text surface (the
    DataFrame listagg doesn't expose WITHIN GROUP ordering)."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderpriority,
               listagg(o_orderstatus, '')
                 WITHIN GROUP (ORDER BY o_orderkey) AS status_seq,
               md5(listagg(CAST(o_orderkey AS STRING), ',')
                 WITHIN GROUP (ORDER BY o_orderkey)) AS key_digest
        FROM orders
        WHERE o_orderkey % 100 = 0
        GROUP BY o_orderpriority
        """
    )


@query(
    "agg_spearman_corr",
    oracle="""
    WITH li AS (
      SELECT CAST(l_quantity AS BIGINT) AS q,
             CAST(FLOOR(l_extendedprice) AS BIGINT) AS p
      FROM lineitem WHERE l_orderkey % 13 = 0
    ), rq AS (
      SELECT q, 2 * (SUM(n) OVER (ORDER BY q) - n) + n + 1 AS rx2
      FROM (SELECT q, COUNT(*) AS n FROM li GROUP BY q)
    ), rp AS (
      SELECT p, 2 * (SUM(n) OVER (ORDER BY p) - n) + n + 1 AS ry2
      FROM (SELECT p, COUNT(*) AS n FROM li GROUP BY p)
    ), j AS (
      SELECT CAST(rx2 AS DECIMAL(19,0)) AS rx, CAST(ry2 AS DECIMAL(19,0)) AS ry
      FROM li JOIN rq USING (q) JOIN rp USING (p)
    ), m AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(rx) AS DOUBLE) AS sx, CAST(SUM(ry) AS DOUBLE) AS sy,
             CAST(SUM(rx * rx) AS DOUBLE) AS sxx,
             CAST(SUM(ry * ry) AS DOUBLE) AS syy,
             CAST(SUM(rx * ry) AS DOUBLE) AS sxy
      FROM j
    )
    SELECT CAST(n AS BIGINT) AS n_rows,
           FLOOR((n * sxy - sx * sy) * 1000000.0
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)))
               / 1000000.0 AS spearman_rho
    FROM m
    """,
)
def agg_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation (quantity vs extended price) — the
    robust, outlier-proof association number for table profiling.

    Scale shape: tie-corrected average ranks come from the AUC trick —
    aggregate to per-VALUE counts first, run the cumulative window over
    the distinct-value frame only, then hash-join ranks back (the quantity
    rank table is broadcast-sized). Price is binned to whole dollars so
    the distinct frame is bounded by the VALUE RANGE, not the row count —
    the tie-corrected ranks make rank-of-bin a sound estimator — keeping
    the cumulative window tiny at any SF. Ranks stay doubled (2r is always
    an integer) and moments accumulate in DECIMAL(38,0), so everything is
    exact until one final floor-fixed-point divide. No corpus-wide
    ROW_NUMBER sort anywhere."""
    from pyspark.sql import Window

    li = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 13 == 0)
        .select(
            F.col("l_quantity").cast("bigint").alias("q"),
            F.floor("l_extendedprice").cast("bigint").alias("p"),
        )
    )

    def ranks(col: str, out: str) -> DataFrame:
        cnt = li.groupBy(col).agg(F.count(F.lit(1)).alias("n"))
        w = Window.orderBy(col)
        return cnt.select(
            col,
            (
                2 * (F.sum("n").over(w) - F.col("n")) + F.col("n") + 1
            ).cast("decimal(19,0)").alias(out),
        )

    j = (
        li.join(F.broadcast(ranks("q", "rx")), "q")
        .join(ranks("p", "ry"), "p")
    )
    m = j.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("rx").cast("double").alias("sx"),
        F.sum("ry").cast("double").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).cast("double").alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).cast("double").alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    rho = F.floor(
        (n * sxy - sx * sy)
        * F.lit(1000000.0)
        / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
    ) / F.lit(1000000.0)
    return m.select(
        n.cast("bigint").alias("n_rows"), rho.alias("spearman_rho")
    )


@query(
    "agg_median_mode",
    oracle="""
    WITH med AS (
      SELECT l_linestatus, median(l_quantity) AS med_qty,
             COUNT(*) AS n_rows
      FROM lineitem GROUP BY 1
    ), counts AS (
      SELECT l_linestatus, l_returnflag, COUNT(*) AS cnt
      FROM lineitem GROUP BY 1, 2
    ), mode AS (
      SELECT l_linestatus, l_returnflag AS mode_returnflag
      FROM counts
      QUALIFY ROW_NUMBER() OVER (PARTITION BY l_linestatus
                                 ORDER BY cnt DESC, l_returnflag DESC) = 1
    )
    SELECT l_linestatus, n_rows, med_qty, mode_returnflag
    FROM med JOIN mode USING (l_linestatus)
    """,
)
def agg_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact MEDIAN plus a DETERMINISTIC mode per group. The built-in
    mode() breaks frequency ties arbitrarily (engine- and run-dependent),
    so the mode here is max_by(value, (count, value)) over the per-value
    count frame — same answer everywhere, ties to the largest value.
    Median interpolates identically in Spark and DuckDB when endpoints
    are integers (quantity is int-valued). Two map-combinable aggregates
    plus a groups-sized argmax — no corpus sort."""
    li = table(spark, sf_dir, "lineitem")
    med = li.groupBy("l_linestatus").agg(
        F.median("l_quantity").alias("med_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    counts = li.groupBy("l_linestatus", "l_returnflag").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    mode = counts.groupBy("l_linestatus").agg(
        F.max_by(
            "l_returnflag", F.struct(F.col("cnt"), F.col("l_returnflag"))
        ).alias("mode_returnflag")
    )
    return med.join(mode, "l_linestatus").select(
        "l_linestatus", "n_rows", "med_qty", "mode_returnflag"
    )


@query(
    "agg_crosstab_chi2",
    oracle="""
    WITH ct AS (
      SELECT o_orderpriority AS r, o_orderstatus AS c, COUNT(*) AS n
      FROM orders GROUP BY 1, 2
    ), margins AS (
      SELECT r, c, n,
             CAST(SUM(n) OVER (PARTITION BY r) AS DOUBLE) AS row_n,
             CAST(SUM(n) OVER (PARTITION BY c) AS DOUBLE) AS col_n,
             CAST(SUM(n) OVER () AS DOUBLE) AS total_n
      FROM ct
    ), cells AS (
      SELECT r, c, n, (row_n * col_n) / total_n AS expected
      FROM margins
    )
    SELECT COUNT(*) AS n_cells,
           FLOOR(SUM(((n - expected) * (n - expected)) / expected)
                 * 1000.0) / 1000.0 AS chi2_stat
    FROM cells
    """,
)
def agg_crosstab_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between two categorical columns
    (order priority × status): contingency counts in ONE aggregate, row/
    column margins as windows over the CELLS frame (|R|·|C| rows — never
    the table), expected = row·col/total, then Σ(obs−exp)²/exp. All
    inputs to the float math are exact integers and the expression is
    operand-order-mirrored, so one floor-fixed-point output matches
    across engines. The profiling answer to 'are these two columns
    related or can I treat them independently'."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    ct = o.groupBy(
        F.col("o_orderpriority").alias("r"),
        F.col("o_orderstatus").alias("c"),
    ).agg(F.count(F.lit(1)).alias("n"))
    margins = ct.select(
        "r", "c", "n",
        F.sum("n").over(Window.partitionBy("r")).cast("double").alias("row_n"),
        F.sum("n").over(Window.partitionBy("c")).cast("double").alias("col_n"),
        F.sum("n").over(Window.partitionBy()).cast("double").alias("total_n"),
    )
    cells = margins.withColumn(
        "expected", (F.col("row_n") * F.col("col_n")) / F.col("total_n")
    )
    diff = F.col("n") - F.col("expected")
    return cells.agg(
        F.count(F.lit(1)).alias("n_cells"),
        (
            F.floor(
                F.sum((diff * diff) / F.col("expected")) * F.lit(1000.0)
            )
            / F.lit(1000.0)
        ).alias("chi2_stat"),
    )


@query(
    "agg_weighted_median",
    oracle="""
    WITH vw AS (
      SELECT l_returnflag AS g, CAST(FLOOR(l_extendedprice) AS BIGINT) AS v,
             CAST(SUM(l_quantity) AS BIGINT) AS w
      FROM lineitem GROUP BY 1, 2
    ), c AS (
      SELECT g, v, w,
             SUM(w) OVER (PARTITION BY g ORDER BY v) AS cum,
             SUM(w) OVER (PARTITION BY g) AS total
      FROM vw
    )
    SELECT g AS l_returnflag, MIN(v) AS weighted_median_price,
           CAST(ANY_VALUE(total) AS BIGINT) AS total_weight
    FROM c
    WHERE 2 * cum >= total
    GROUP BY g
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED median (quantity-weighted price): the importance-weighted
    statistic plain median() cannot express — the smallest value whose
    cumulative weight reaches half the total. Same aggregate-then-window
    discipline as the AUC/Spearman family: collapse to per-(group, value)
    weight sums first (values dollar-binned, so the frame is bounded by
    the value range), run the cumulative window over that small frame,
    pick the crossing point with one aggregate. All integers; no
    interpolation ambiguity to reconcile across engines."""
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem")
    vw = li.groupBy(
        F.col("l_returnflag").alias("g"),
        F.floor("l_extendedprice").cast("bigint").alias("v"),
    ).agg(F.sum("l_quantity").cast("bigint").alias("w"))
    c = vw.select(
        "g", "v", "w",
        F.sum("w").over(Window.partitionBy("g").orderBy("v")).alias("cum"),
        F.sum("w").over(Window.partitionBy("g")).alias("total"),
    )
    return (
        c.filter(2 * F.col("cum") >= F.col("total"))
        .groupBy(F.col("g").alias("l_returnflag"))
        .agg(
            F.min("v").alias("weighted_median_price"),
            F.any_value("total").cast("bigint").alias("total_weight"),
        )
    )
