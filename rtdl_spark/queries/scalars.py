"""Scalar-function and set-operation coverage (SURVEY.md §2B): string,
regexp (incl. the reference's PII masking regexes, PiiDetector.java:15-18),
date/time (incl. the A9 partition-bucket derivations,
ingester/ingester.go:522-548), math, JSON, array higher-order functions,
conditionals, and set ops.

All expressions are JVM-side Catalyst built-ins — zero Python in the row
path, so every query stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rtdl_spark.catalog import table
from rtdl_spark.functions.pii import mask_pii_col
from rtdl_spark.queries import query
from rtdl_spark.queries._util import dec, dsum


@query(
    "scalar_string_funcs",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           lower(c_mktsegment) AS seg_lower,
           substring(c_name, 10, 9) AS name_digits,
           length(c_name) AS name_len,
           concat(c_mktsegment, ':', c_name) AS tagged,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
           replace(c_name, 'Customer#', 'C-') AS name_short,
           trim('  ' || c_mktsegment || ' ') AS seg_trim
    FROM customer
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 10, 9).alias("name_digits"),
        F.length("c_name").alias("name_len"),
        F.concat(F.col("c_mktsegment"), F.lit(":"), F.col("c_name")).alias("tagged"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.replace(F.col("c_name"), F.lit("Customer#"), F.lit("C-")).alias(
            "name_short"
        ),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" "))).alias(
            "seg_trim"
        ),
    )


@query(
    "scalar_regexp_funcs",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           CASE WHEN regexp_matches(p_name, 'widget$') THEN 1 ELSE 0 END
             AS is_widget,
           CAST(regexp_split_to_array(p_name, ' ')[1] AS VARCHAR) AS split_head
    FROM part
    """,
)
def scalar_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.when(F.col("p_name").rlike("widget$"), 1).otherwise(0).alias("is_widget"),
        F.split("p_name", " ").getItem(0).alias("split_head"),
    )


@query(
    "scalar_pii_mask",
    oracle=r"""
    SELECT o_orderkey,
           regexp_replace(
             regexp_replace(
               concat('order ', CAST(o_orderkey AS VARCHAR),
                      ' ssn 123-45-6789 phone 415-555-1234 ok 111-555-1234'),
               '\d{3}-\d{2}-\d{4}', '###', 'g'),
             '[2-9]\d{2}-\d{3}-\d{4}', '###', 'g') AS masked
    FROM orders
    """,
)
def scalar_pii_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A23 parity: the reference's exact SSN + US-phone regexes
    (PiiDetector.java:15-18) applied as chained regexp_replace. Note
    '111-555-1234' survives the phone regex ([2-9] prefix) — preserved."""
    o = table(spark, sf_dir, "orders")
    raw = F.concat(
        F.lit("order "),
        F.col("o_orderkey").cast("string"),
        F.lit(" ssn 123-45-6789 phone 415-555-1234 ok 111-555-1234"),
    )
    return o.select("o_orderkey", mask_pii_col(raw).alias("masked"))


@query(
    "scalar_date_funcs",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS y,
           month(o_orderdate) AS m,
           day(o_orderdate) AS d,
           quarter(o_orderdate) AS q,
           weekofyear(o_orderdate) AS iso_week,
           isodow(o_orderdate) AS iso_dow,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           date_diff('day', o_orderdate, TIMESTAMP '2002-01-01') AS days_to_2002
    FROM orders
    """,
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.quarter("o_orderdate").alias("q"),
        F.weekofyear("o_orderdate").alias("iso_week"),
        F.expr("extract(DAYOFWEEK_ISO FROM o_orderdate)").alias("iso_dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(
            F.lit("2002-01-01").cast("timestamp_ntz"), F.col("o_orderdate")
        ).alias("days_to_2002"),
    )


@query(
    "scalar_partition_buckets",
    oracle="""
    SELECT event_id,
           strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d-%H') AS bucket_hourly,
           strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS bucket_daily,
           concat(isoyear(CAST(ts AS TIMESTAMP)), '-',
                  weekofyear(CAST(ts AS TIMESTAMP))) AS bucket_weekly,
           strftime(CAST(ts AS TIMESTAMP), '%Y-%m') AS bucket_monthly,
           concat(year(CAST(ts AS TIMESTAMP)), '-',
                  quarter(CAST(ts AS TIMESTAMP))) AS bucket_quarterly
    FROM events
    """,
)
def scalar_partition_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 parity (ingester/ingester.go:522-548): the five partition-time
    bucket derivations, applied to event time. (The reference buckets by
    wall clock at write; rtdl_spark.ingest makes the time source a config.)
    The reference's quarterly branch has a Go bug — string(int) yields a
    rune, not a digit; we implement the documented intent 'YYYY-Q'."""
    from rtdl_spark.functions.buckets import partition_bucket

    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        partition_bucket(F.col("ts"), "hourly").alias("bucket_hourly"),
        partition_bucket(F.col("ts"), "daily").alias("bucket_daily"),
        partition_bucket(F.col("ts"), "weekly").alias("bucket_weekly"),
        partition_bucket(F.col("ts"), "monthly").alias("bucket_monthly"),
        partition_bucket(F.col("ts"), "quarterly").alias("bucket_quarterly"),
    )


@query(
    "scalar_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS abs_disc_delta,
           CAST(floor(l_quantity / 7) AS BIGINT) AS qty_div7,
           CAST(ceil(l_quantity / 7) AS BIGINT) AS qty_div7_up,
           ROUND(sqrt(l_extendedprice), 6) AS sqrt_price,
           ROUND(power(l_discount, 2), 6) AS disc_sq,
           l_partkey % 7 AS pk_mod7,
           greatest(l_discount, l_tax) AS max_rate,
           least(l_discount, l_tax) AS min_rate
    FROM lineitem
    """,
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_disc_delta"),
        F.floor(F.col("l_quantity") / 7).alias("qty_div7"),
        F.ceil(F.col("l_quantity") / 7).alias("qty_div7_up"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_price"),
        F.round(F.pow("l_discount", 2), 6).alias("disc_sq"),
        (F.col("l_partkey") % 7).alias("pk_mod7"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


@query(
    "scalar_json_funcs",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def scalar_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from string payloads — the core of rtdl's ingest
    surface (payload is arbitrary JSON, README.md:160-168)."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@query(
    "scalar_array_funcs",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_component,
           CAST(embedding[-1] AS DOUBLE) AS last_component,
           CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS min_component,
           CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS max_component,
           len(list_filter(embedding, x -> x > 0)) AS n_positive
    FROM embeddings
    """,
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array basics + higher-order filter. float→double widenings are exact,
    so no rounding is needed."""
    e = table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.array_size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_component"),
        F.element_at("embedding", -1).cast("double").alias("last_component"),
        F.array_min("embedding").cast("double").alias("min_component"),
        F.array_max("embedding").cast("double").alias("max_component"),
        F.array_size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
    )


@query(
    "scalar_array_explode",
    oracle="""
    SELECT dim_idx, COUNT(*) AS n,
           ROUND(SUM(comp), 4) AS sum_comp
    FROM (
      SELECT UNNEST(list_transform(range(1, len(embedding) + 1),
                                   i -> {'i': i, 'v': CAST(embedding[i] AS DOUBLE)}))
               AS pair
      FROM embeddings WHERE vec_id < 100
    ) t,
    LATERAL (SELECT pair.i AS dim_idx, pair.v AS comp)
    GROUP BY dim_idx
    """,
)
def scalar_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode → per-dimension aggregate (columnar un-nesting). Sum order
    over float components is engine-dependent → ROUND(4) on both sides."""
    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    return (
        e.select(F.posexplode("embedding").alias("pos", "comp"))
        .select((F.col("pos") + 1).alias("dim_idx"),
                F.col("comp").cast("double").alias("comp"))
        .groupBy("dim_idx")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("comp"), 4).alias("sum_comp"),
        )
    )


@query(
    "scalar_conditional_funcs",
    oracle="""
    SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal < 5000 THEN 'low'
                WHEN c_acctbal < 8000 THEN 'mid'
                ELSE 'high' END AS bal_bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(coalesce(nullif(c_acctbal, 0.0), 0.0)
                    AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer
    GROUP BY 1
    """,
)
def scalar_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    bucket = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 5000, "low")
        .when(F.col("c_acctbal") < 8000, "mid")
        .otherwise("high")
    )
    return (
        c.groupBy(bucket.alias("bal_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(dec(F.coalesce(F.nullif("c_acctbal", F.lit(0.0)), F.lit(0.0)))).alias(
                "total_bal"
            ),
        )
    )


@query(
    "setop_union_all_parties",
    oracle="""
    SELECT party, nationkey, COUNT(*) AS n,
           CAST(SUM(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM (
      SELECT 'customer' AS party, c_nationkey AS nationkey, c_acctbal AS bal
      FROM customer
      UNION ALL
      SELECT 'supplier' AS party, s_nationkey AS nationkey, s_acctbal AS bal
      FROM supplier
    ) u
    GROUP BY party, nationkey
    """,
)
def setop_union_all_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("party"),
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_acctbal").alias("bal"),
    )
    s = table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("party"),
        F.col("s_nationkey").alias("nationkey"),
        F.col("s_acctbal").alias("bal"),
    )
    return (
        c.unionByName(s)
        .groupBy("party", "nationkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(dec("bal")).alias("total_bal"),
        )
    )


@query(
    "setop_intersect_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def setop_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


@query(
    "setop_except_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def setop_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.subtract(s)


@query(
    "setop_distinct_pairs",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
)
def setop_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
    )


@query(
    "message_type_resolution",
    oracle="""
    SELECT COALESCE(json_extract_string(props, '$.type'),
                    nullif(event_type, ''),
                    'rtdl_default') AS resolved_type,
           COUNT(*) AS n
    FROM events
    GROUP BY 1
    """,
)
def message_type_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 parity (ingester/ingester.go:1492-1517): table-name precedence
    payload.type > envelope message_type > config default > 'rtdl_default',
    as a pure COALESCE chain."""
    ev = table(spark, sf_dir, "events")
    resolved = F.coalesce(
        F.get_json_object("props", "$.type"),
        F.nullif("event_type", F.lit("")),
        F.lit("rtdl_default"),
    )
    return ev.groupBy(resolved.alias("resolved_type")).agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "scalar_pii_mask_extended",
    oracle=r"""
    WITH base AS (
      SELECT o_orderkey,
             concat('id ', CAST(o_orderkey AS VARCHAR),
                    ' pay 4539 1488 0343 6467 ref 1234-5678-9012-3456',
                    ' mail bob@example.com ip 10.1.2.3 ssn 123-45-6789') AS s
      FROM orders
    ), cand AS (
      SELECT o_orderkey,
             UNNEST(regexp_extract_all(s,
               '\d{4}[ -]?\d{4}[ -]?\d{4}[ -]?\d{4}')) AS c
      FROM base
    ), dec AS (
      SELECT o_orderkey, c,
             (list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(
                string_split(regexp_replace(c, '[^0-9]', '', 'g'), ''),
                (ch, i) -> CAST(CASE
                  WHEN (len(regexp_replace(c, '[^0-9]', '', 'g')) - i) % 2 = 1
                  THEN CASE WHEN 2 * (ascii(ch) - 48) > 9
                            THEN 2 * (ascii(ch) - 48) - 9
                            ELSE 2 * (ascii(ch) - 48) END
                  ELSE ascii(ch) - 48 END AS BIGINT))),
              (a, b) -> a + b) % 10 = 0) AS ok
      FROM cand
    ), folded AS (
      SELECT b.o_orderkey,
             list_reduce(
               list_prepend(b.s,
                 COALESCE(list(CASE WHEN d.ok THEN d.c ELSE chr(1) END), [])),
               (acc, x) -> replace(acc, x, '###')) AS cards_masked
      FROM base b LEFT JOIN dec d USING (o_orderkey)
      GROUP BY b.o_orderkey, b.s
    )
    SELECT o_orderkey,
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(cards_masked,
                   '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}',
                   '###', 'g'),
                 '\b(\d{1,3}\.){3}\d{1,3}\b', '###', 'g'),
               '\d{3}-\d{2}-\d{4}', '###', 'g'),
             '[2-9]\d{2}-\d{3}-\d{4}', '###', 'g') AS masked
    FROM folded
    """,
)
def scalar_pii_mask_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended PII chain (functions/pii.py::mask_pii_extended): Luhn-
    validated card masking (the valid test PAN 4539... masks, the
    checksum-failing 1234-5678-9012-3456 SURVIVES — precision a bare
    regex can't express), then email, IPv4, and the reference's SSN +
    phone regexes. The whole Luhn computation is re-derived in SQL, so
    the oracle checks the checksum logic too."""
    from rtdl_spark.functions.pii import mask_pii_extended

    o = table(spark, sf_dir, "orders")
    raw = F.concat(
        F.lit("id "),
        F.col("o_orderkey").cast("string"),
        F.lit(
            " pay 4539 1488 0343 6467 ref 1234-5678-9012-3456"
            " mail bob@example.com ip 10.1.2.3 ssn 123-45-6789"
        ),
    )
    return o.select("o_orderkey", mask_pii_extended(raw).alias("masked"))


@query(
    "scalar_url_parse",
    oracle="""
    SELECT doc_id,
           concat('doc', CAST(doc_id % 7 AS VARCHAR), '.example.com') AS host,
           concat('/', source, '/', CAST(doc_id AS VARCHAR)) AS path,
           concat('lang=', lang) AS query_str,
           lang AS lang_param
    FROM documents
    """,
)
def scalar_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition with parse_url (the crawl-pipeline primitive for
    per-domain caps/blocklists): URLs constructed from fixture fields are
    split back into HOST/PATH/QUERY/parameter, and the oracle derives the
    same parts directly from the fields — round-trip-proving the parser.
    At scale host extraction feeds a per-domain stratified cap
    (stratified_take) or a broadcast blocklist anti-join."""
    d = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://doc"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.com/"),
        F.col("source"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query_str"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


@query(
    "scalar_bitwise_funcs",
    oracle="""
    SELECT o_orderkey % 16 AS bucket,
           CAST(BIT_AND(o_orderkey) AS BIGINT) AS all_and,
           CAST(BIT_OR(o_orderkey) AS BIGINT) AS all_or,
           CAST(BIT_XOR(o_orderkey) AS BIGINT) AS all_xor,
           CAST(SUM(bit_count(o_orderkey)) AS BIGINT) AS popcount_sum,
           CAST(MAX(o_orderkey << 2) AS BIGINT) AS max_shl2,
           CAST(MIN(o_orderkey >> 1) AS BIGINT) AS min_shr1,
           CAST(MAX(xor(o_orderkey, 255)) AS BIGINT) AS max_xor_mask
    FROM orders
    GROUP BY 1
    """,
)
def scalar_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar + aggregate family (the sketch/bitmap building
    blocks the bloom-words and HLL operators rely on): per o_orderkey%16
    bucket the BIT_AND/OR/XOR aggregates, total popcount, shifts, and an
    XOR mask — all JVM built-ins on both engines."""
    o = table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.groupBy((k % 16).alias("bucket")).agg(
        F.bit_and(k).cast("bigint").alias("all_and"),
        F.bit_or(k).cast("bigint").alias("all_or"),
        F.bit_xor(k).cast("bigint").alias("all_xor"),
        F.sum(F.bit_count(k)).cast("bigint").alias("popcount_sum"),
        F.max(F.shiftleft(k, 2)).cast("bigint").alias("max_shl2"),
        F.min(F.shiftright(k, 1)).cast("bigint").alias("min_shr1"),
        F.max(k.bitwiseXOR(F.lit(255))).cast("bigint").alias("max_xor_mask"),
    )


@query(
    "scalar_try_funcs",
    oracle="""
    SELECT o_orderkey,
           o_orderkey / nullif(o_orderkey % 7, 0) AS safe_div,
           TRY_CAST(CASE WHEN o_orderkey % 2 = 0
                         THEN CAST(o_orderkey AS VARCHAR)
                         ELSE o_orderpriority END AS INTEGER) AS mixed_int,
           TRY_CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS prio_int,
           nullif(o_orderkey % 3, 0) AS nz_mod
    FROM orders
    """,
)
def scalar_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safety scalar family: try_divide and try_cast return NULL
    where strict ANSI (this engine's default) would raise — division by
    a %7 bucket that hits zero, casting '5-LOW'-style strings — plus
    nullif. The pattern every ratio expression in this repo uses under
    ANSI mode, exercised as first-class surface. Integer operands make
    the double quotient IEEE-identical on both engines (no rounding
    contract needed); the mixed cast keeps each output column partially
    non-null so pandas dtypes agree across engines."""
    o = table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        F.try_divide(k, k % 7).alias("safe_div"),
        F.when(k % 2 == 0, k.cast("string"))
        .otherwise(F.col("o_orderpriority"))
        .try_cast("int")
        .alias("mixed_int"),
        F.substring("o_orderpriority", 1, 1).try_cast("int").alias("prio_int"),
        F.nullif(k % 3, F.lit(0)).alias("nz_mod"),
    )


@query(
    "scalar_map_funcs",
    oracle="""
    SELECT p_partkey,
           2 AS n_keys,
           CAST(p_size AS BIGINT) AS size_val,
           CAST(FLOOR(p_retailprice * 100) AS BIGINT) AS retail_cents,
           CASE WHEN p_size > 20 AND FLOOR(p_retailprice * 100) > 20 THEN 2
                WHEN p_size > 20 OR FLOOR(p_retailprice * 100) > 20 THEN 1
                ELSE 0 END AS n_over_20,
           CAST(p_size AS BIGINT) * 2 AS size_doubled
    FROM part WHERE p_partkey % 17 = 0
    """,
)
def scalar_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP column surface: build a map<string,bigint> per row
    (map_from_entries), then element_at lookup, cardinality, map_filter
    and transform_values — the typed key-value column pattern used for
    per-row feature bags / tag sets. All pure Catalyst map expressions
    (whole-stage codegen); the oracle recomputes every output
    arithmetically, proving the map pipeline preserves the values."""
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") % 17 == 0)
    m = F.map_from_entries(
        F.array(
            F.struct(
                F.lit("size").alias("key"),
                F.col("p_size").cast("bigint").alias("value"),
            ),
            F.struct(
                F.lit("retail_cents").alias("key"),
                F.floor(F.col("p_retailprice") * 100).alias("value"),
            ),
        )
    )
    withm = p.select("p_partkey", m.alias("m"))
    return withm.select(
        "p_partkey",
        F.size("m").alias("n_keys"),
        F.element_at("m", F.lit("size")).alias("size_val"),
        F.element_at("m", F.lit("retail_cents")).alias("retail_cents"),
        F.size(F.map_filter("m", lambda k, v: v > 20)).alias("n_over_20"),
        F.element_at(
            F.transform_values("m", lambda k, v: v * 2), F.lit("size")
        ).alias("size_doubled"),
    )


@query(
    "setop_multiset_ops",
    oracle="""
    WITH a AS (SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'),
         b AS (SELECT l_suppkey FROM lineitem WHERE l_linestatus = 'F'),
    ea AS (SELECT 'except_all' AS op, l_suppkey FROM
           (SELECT l_suppkey FROM a EXCEPT ALL SELECT l_suppkey FROM b)),
    ia AS (SELECT 'intersect_all' AS op, l_suppkey FROM
           (SELECT l_suppkey FROM a INTERSECT ALL SELECT l_suppkey FROM b))
    SELECT op, l_suppkey, COUNT(*) AS n
    FROM (SELECT * FROM ea UNION ALL SELECT * FROM ia)
    GROUP BY op, l_suppkey
    """,
)
def setop_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset set operations (EXCEPT ALL / INTERSECT ALL): duplicates
    count — row multiplicity is data, not noise, when the inputs are event
    streams. Both compile to a single hash aggregation computing per-key
    multiplicities on each side (count-difference / count-min), NOT a
    row-pairing join — one shuffle each at any scale."""
    li = table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R").select("l_suppkey")
    b = li.filter(F.col("l_linestatus") == "F").select("l_suppkey")
    ea = a.exceptAll(b).select(
        F.lit("except_all").alias("op"), "l_suppkey"
    )
    ia = a.intersectAll(b).select(
        F.lit("intersect_all").alias("op"), "l_suppkey"
    )
    return (
        ea.unionByName(ia)
        .groupBy("op", "l_suppkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
