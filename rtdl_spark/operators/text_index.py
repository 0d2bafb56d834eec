"""Persisted inverted text index — index-as-layout for keyword retrieval,
the text twin of operators/ann_index.py (reference parity: rtdl registers
datasets for Dremio to search; a real lake search path needs the postings
to BE the layout, so a query touches only its terms' files).

Layout on disk (all plain parquet, object-store-safe):
  <dir>/postings/    (term, doc_id, tf, dl) partitioned by term_bucket =
                     pmod(xxhash64(term), n_buckets) — a query's terms map
                     to a handful of buckets, and static partition pruning
                     keeps every other posting file unread
  <dir>/stats/       one row: n_docs, avgdl (the BM25 corpus scalars)
  <dir>/dfreq/       (term, df) document frequencies — vocabulary-sized,
                     read whole and broadcast at query time

Query cost model at any corpus size: |terms| bucket partitions of postings
scanned (≈ |terms|/n_buckets of the index bytes), one broadcast of the
df rows for the probed terms, one hash aggregate per doc — the corpus
itself is never touched, never shuffled.

Rebuild-on-append: like the ANN index, the index is immutable; growing it
is append_to_inverted_index (same bucketing, new files land in the same
partitions) — df/stats are recomputed from postings at build time, so an
append refreshes them too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rtdl_spark.functions.localdf import local_df

from rtdl_spark.functions.text import tokens

_K1 = 1.2
_B = 0.75


def build_inverted_index(
    docs: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 32,
) -> None:
    """Build the index: one explode → per-(doc, term) tf aggregate, written
    partitioned by term bucket; df and corpus stats derived from the same
    aggregate (no second scan of the corpus)."""
    toks = tokens(F.col(text_col))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(toks).alias("term"),
        F.size(toks).alias("dl"),
    )
    tf = base.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.any_value("dl").alias("dl")
    )
    tf.withColumn(
        "term_bucket",
        F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"),
    ).write.mode("overwrite").partitionBy("term_bucket").parquet(
        f"{index_dir}/postings"
    )

    spark = docs.sparkSession
    postings = spark.read.parquet(f"{index_dir}/postings")
    postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    ).write.mode("overwrite").parquet(f"{index_dir}/dfreq")
    # distinct docs + mean doc length from the postings themselves
    postings.groupBy("doc_id").agg(F.any_value("dl").alias("dl")).agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    ).write.mode("overwrite").parquet(f"{index_dir}/stats")


def query_inverted_index(
    spark: SparkSession,
    index_dir: str,
    terms: list[str],
    n_buckets: int = 32,
) -> DataFrame:
    """BM25 over the persisted index (k1=1.2, b=0.75 — matching
    text_bm25_search exactly). The postings scan carries BOTH the
    term-bucket partition filter (directory pruning: only |terms| buckets
    are listed/read) and the term filter (row-group pruning within the
    bucket); df/stats are tiny broadcast sides."""
    term_lits = [F.lit(t) for t in terms]
    buckets = list(
        {
            r.b
            for r in local_df(spark, 
                [(t,) for t in terms], "term string"
            )
            .select(
                F.pmod(F.xxhash64("term"), F.lit(n_buckets))
                .cast("int")
                .alias("b")
            )
            .collect()
        }
    )
    postings = (
        spark.read.parquet(f"{index_dir}/postings")
        .filter(F.col("term_bucket").isin(buckets))
        .filter(F.col("term").isin(*term_lits))
    )
    dfreq = F.broadcast(
        spark.read.parquet(f"{index_dir}/dfreq").filter(
            F.col("term").isin(*term_lits)
        )
    )
    stats = F.broadcast(spark.read.parquet(f"{index_dir}/stats"))
    scored = (
        postings.join(dfreq, "term")
        .join(stats)
        .select(
            "doc_id",
            (
                F.log(
                    (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                    + 1
                )
                * F.col("tf")
                * (_K1 + 1.0)
                / (
                    F.col("tf")
                    + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("s"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_terms_hit"),
        F.round(F.sum("s"), 5).alias("bm25"),
    )


def append_to_inverted_index(
    docs: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 32,
) -> None:
    """Grow the index with new documents under the SAME bucketing (append
    into the existing partition directories), then refresh dfreq/stats
    from the merged postings — postings are immutable facts per (doc,
    term), so append is safe; only the derived tables are rewritten."""
    toks = tokens(F.col(text_col))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(toks).alias("term"),
        F.size(toks).alias("dl"),
    )
    tf = base.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.any_value("dl").alias("dl")
    )
    tf.withColumn(
        "term_bucket",
        F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"),
    ).write.mode("append").partitionBy("term_bucket").parquet(
        f"{index_dir}/postings"
    )
    spark = docs.sparkSession
    postings = spark.read.parquet(f"{index_dir}/postings")
    postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    ).write.mode("overwrite").parquet(f"{index_dir}/dfreq")
    postings.groupBy("doc_id").agg(F.any_value("dl").alias("dl")).agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    ).write.mode("overwrite").parquet(f"{index_dir}/stats")
