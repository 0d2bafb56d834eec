"""JSON-family and schema-drift coverage (SURVEY.md §2B scalar-JSON row +
set-op row): from_json with explicit schema, map extraction, json_tuple,
to_json round-trip, and unionByName(allowMissingColumns=True) — the
schema-drift-tolerant union matching rtdl's per-message schema variance
(SURVEY §1.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rtdl_spark.catalog import table
from rtdl_spark.queries import query


@query(
    "json_from_json_struct",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_typed,
           json_extract_string(props, '$.missing') AS missing_field
    FROM events
    """,
)
def json_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json with an explicit schema — the production ingest path
    (never infer per record at scale); missing fields are NULL, matching
    rtdl's dropped-field tolerance."""
    ev = table(spark, sf_dir, "events")
    parsed = F.from_json("props", "k BIGINT, missing STRING")
    return ev.select(
        "event_id",
        parsed.getField("k").alias("k_typed"),
        parsed.getField("missing").alias("missing_field"),
    )


@query(
    "json_map_keys",
    oracle="""
    SELECT k AS prop_key, COUNT(*) AS n
    FROM (SELECT UNNEST(json_keys(props)) AS k FROM events) t
    GROUP BY k
    """,
)
def json_map_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON object → map<string,_> → exploded key census (map_keys +
    explode exercise Spark's map type against DuckDB's json_keys)."""
    ev = table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    return (
        ev.select(F.explode(F.map_keys(m)).alias("prop_key"))
        .groupBy("prop_key")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "json_tuple_extract",
    oracle="""
    SELECT event_id, json_extract_string(props, '$.k') AS k_str
    FROM events WHERE event_id < 1000
    """,
)
def json_tuple_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """json_tuple: multi-field extraction in one pass (generator form)."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    return ev.select(
        "event_id", F.json_tuple("props", "k").alias("k_str")
    )


@query(
    "json_roundtrip_stats",
    oracle="""
    SELECT length(concat('{"event_id":', CAST(event_id AS VARCHAR),
                         ',"event_type":"', event_type, '"}')) AS json_len,
           COUNT(*) AS n
    FROM events
    GROUP BY 1
    """,
)
def json_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to_json(struct(...)) serialization — the A23 whole-row masking
    substrate — checked via emitted-length distribution."""
    ev = table(spark, sf_dir, "events")
    js = F.to_json(F.struct("event_id", "event_type"))
    return ev.groupBy(F.length(js).alias("json_len")).agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "setop_union_by_name_drift",
    oracle="""
    SELECT o_orderkey, o_totalprice, priority_class, rush
    FROM (
      SELECT o_orderkey, o_totalprice, 'legacy' AS priority_class, NULL AS rush
      FROM orders WHERE o_orderkey % 100 = 0
      UNION ALL BY NAME
      SELECT o_orderkey, o_totalprice,
             o_orderpriority AS priority_class,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS rush
      FROM orders WHERE o_orderkey % 100 = 1
    ) u
    """,
)
def setop_union_by_name_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift-tolerant union: the old extract lacks the ``rush``
    column; unionByName(allowMissingColumns=True) null-fills it — exactly
    how the lake absorbs rtdl's per-message schema drift."""
    o = table(spark, sf_dir, "orders")
    legacy = o.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey", "o_totalprice", F.lit("legacy").alias("priority_class")
    )
    current = o.filter(F.col("o_orderkey") % 100 == 1).select(
        "o_orderkey",
        "o_totalprice",
        F.col("o_orderpriority").alias("priority_class"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .cast("int")
        .alias("rush"),
    )
    return legacy.unionByName(current, allowMissingColumns=True).select(
        "o_orderkey", "o_totalprice", "priority_class",
        F.col("rush").cast("int").alias("rush"),
    )


@query(
    "agg_collect_sorted_lists",
    oracle="""
    SELECT o_orderpriority,
           array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',')
             AS statuses,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_collect_sorted_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set → array_sort: set-valued aggregation with a
    deterministic (sorted) surface — raw collect order is partitioning-
    dependent and must never be exposed. The sorted set is serialized to
    a joined string because the driver's canonicalizer can only hash
    scalar cells (array cells crash its pandas sort)."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.array_join(
            F.array_sort(F.collect_set("o_orderstatus")), ","
        ).alias("statuses"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "json_variant_extract",
    oracle="""
    SELECT CAST(json_extract(props, '$.k') AS INT) AS k,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1
    """,
)
def json_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT — the modern semi-structured path (parse once into
    the binary variant encoding, typed extraction without re-parsing):
    parse_json(props) -> try_variant_get('$.k'). Functionally equivalent
    to get_json_object (scalar_json_funcs) but the variant encoding is
    what a 100 TB semi-structured column should store: parse cost paid
    once at write, extractions are binary field lookups. Oracle uses
    DuckDB's json_extract on the same path."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.select(
            F.try_variant_get(
                F.parse_json("props"), "$.k", "int"
            ).alias("k"),
            "value",
        )
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
    )
