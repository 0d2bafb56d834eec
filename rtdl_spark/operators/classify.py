"""Logistic-regression training over hashed bag-of-words features — the
TRAINING half of the quality-classifier stage (curation.py::
linear_quality_score is the serving half with fixed weights). The
fastText/CCNet-style corpus filter: train a linear model on a labeled
sample, score the whole corpus, keep what passes.

The third iterative driver-loop shape in the repo (k-means:
clustering.py, PageRank: graph.py), sharing their scale posture:
- features never materialize as vectors: a document is its exploded
  (bucket, tf) pairs — O(tokens) rows, never an O(n_buckets) dense array;
- the weight vector (n_buckets floats — KBs) lives on the driver and
  broadcasts into each round as a literal map via ``element_at``;
- one round = one scan shape: per-doc margin (groupBy id, map-combinable
  sum), sigmoid, then per-bucket gradient (groupBy bucket, map-combinable
  sum) — two small shuffles, both keyed by bounded-cardinality keys;
- the driver applies the gradient step in numpy; lineage never grows
  (each round re-plans from the cached feature frame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rtdl_spark.functions.localdf import local_df

from rtdl_spark.functions.text import token_hash, tokens


def doc_features(
    docs: DataFrame,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    feature_mode: str = "binary",
) -> DataFrame:
    """(id, bucket, x) hashed bag-of-words features as sparse exploded
    pairs — never dense vectors. ``feature_mode``: "binary" (presence,
    the robust default — measured to converge orders faster under
    full-batch GD than normalized tf on these fixtures), "tf" (raw
    counts), or "l1" (counts normalized per doc)."""
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(tokens(F.col(text_col))).alias("_tok"),
    )
    per = (
        toks.withColumn("_b", (token_hash(F.col("_tok")) % n_buckets).cast("int"))
        .groupBy("_id", "_b")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    if feature_mode == "binary":
        return per.select("_id", "_b", F.lit(1.0).alias("_x"))
    if feature_mode == "tf":
        return per.select("_id", "_b", F.col("_tf").cast("double").alias("_x"))
    if feature_mode != "l1":
        raise ValueError(f"doc_features: unknown feature_mode {feature_mode!r}")
    total = per.groupBy("_id").agg(F.sum("_tf").alias("_n"))
    return per.join(total, "_id").select(
        "_id", "_b", (F.col("_tf") / F.col("_n")).alias("_x")
    )


def train_logreg(
    docs: DataFrame,
    label_col: str,
    n_buckets: int = 1024,
    n_iter: int = 20,
    lr: float = 2.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    feature_mode: str = "binary",
) -> "tuple":
    """Batch gradient-descent logistic regression on hashed BoW features.
    ``label_col`` must be 0/1 (int). Returns ``(weights, bias, losses)``
    — weights as a numpy array of ``n_buckets`` floats, ``losses`` the
    per-iteration mean log-loss (the convergence evidence tests pin).

    Each iteration computes the exact full-batch gradient distributed:
    margins per doc, residuals (p − y), then per-bucket residual·x sums —
    all map-combinable aggregates; the driver takes one numpy step.
    """
    import numpy as np

    spark = docs.sparkSession
    feats = doc_features(docs, n_buckets, id_col, text_col, feature_mode)
    labels = docs.select(
        F.col(id_col).alias("_id"), F.col(label_col).cast("double").alias("_y")
    )
    base = feats.join(labels, "_id").persist()
    n_docs = labels.count()
    if n_docs == 0:
        raise ValueError("train_logreg: empty input")

    w = np.zeros(n_buckets)
    bias = 0.0
    losses = []
    try:
        for _ in range(n_iter):
            # weights ride in as a broadcast (bucket, w) table — a map
            # literal of n_buckets entries would bloat every round's plan
            # (Catalyst re-analyzes the whole expression tree); the join
            # keeps the plan constant-size regardless of n_buckets
            wdf = F.broadcast(
                local_df(spark, 
                    [
                        (i, float(w[i]))
                        for i in range(n_buckets)
                        if w[i] != 0.0
                    ],
                    "_b int, _w double",
                )
            )
            margins = (
                base.join(wdf, "_b", "left")
                .withColumn(
                    "_wx", F.coalesce(F.col("_w"), F.lit(0.0)) * F.col("_x")
                )
                .groupBy("_id")
                .agg(
                    F.sum("_wx").alias("_m"),
                    F.first("_y").alias("_y"),
                )
                .withColumn(
                    "_p", F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.col("_m") + F.lit(bias))))
                )
            )
            # loss + bias gradient in one driver row
            eps = 1e-12
            stats = margins.agg(
                F.avg(
                    -(
                        F.col("_y") * F.log(F.col("_p") + F.lit(eps))
                        + (1 - F.col("_y"))
                        * F.log(1 - F.col("_p") + F.lit(eps))
                    )
                ).alias("loss"),
                F.avg(F.col("_p") - F.col("_y")).alias("gb"),
            ).first()
            losses.append(float(stats["loss"]))
            grads = (
                base.join(
                    margins.select("_id", "_p", F.col("_y").alias("_yy")),
                    "_id",
                )
                .withColumn("_g", (F.col("_p") - F.col("_yy")) * F.col("_x"))
                .groupBy("_b")
                .agg(F.sum("_g").alias("_gsum"))
                .collect()
            )
            g = np.zeros(n_buckets)
            for r in grads:
                g[r["_b"]] = r["_gsum"] / n_docs
            w -= lr * g
            bias -= lr * float(stats["gb"])
    finally:
        base.unpersist()
    return w, bias, losses


def score_logreg(
    docs: DataFrame,
    weights,
    bias: float,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    feature_mode: str = "binary",
) -> DataFrame:
    """Score documents with a trained weight vector: broadcast the
    (bucket, weight) table and join on bucket id — the serving shape at
    corpus scale (weights are KBs next to 100 TB of text). Returns
    ``(id, prob)``. Use the same ``feature_mode`` the model was trained
    with."""
    spark = docs.sparkSession
    wdf = F.broadcast(
        local_df(spark, 
            [(i, float(weights[i])) for i in range(len(weights))],
            "_b int, _w double",
        )
    )
    feats = doc_features(docs, n_buckets, id_col, text_col, feature_mode)
    return (
        feats.join(wdf, "_b", "left")
        .groupBy("_id")
        .agg(F.sum(F.coalesce(F.col("_w"), F.lit(0.0)) * F.col("_x")).alias("_m"))
        .select(
            F.col("_id").alias(id_col),
            (
                F.lit(1.0)
                / (F.lit(1.0) + F.exp(-(F.col("_m") + F.lit(float(bias)))))
            ).alias("prob"),
        )
    )
