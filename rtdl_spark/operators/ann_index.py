"""Persisted ANN index — IVF-PQ as a LAKE LAYOUT instead of a per-call
computation. The in-memory paths (operators/similarity.py) re-assign and
re-encode the corpus every call; at 100 TB the index is built ONCE and
queries touch only their probed slice:

- ``build``: train (driver-side bounded sample) → assign + encode (one
  corpus scan) → write codes **partitioned by cell_id**; centroids and
  codebooks persist as tiny parquet tables next to the data. The float
  vectors do NOT ship into the index — a cell partition holds (id,
  m-byte codes) only.
- ``query``: reconstruct the model from the meta tables (KBs), pick
  probe cells driver-side, and read the data with a ``cell_id IN (...)``
  filter — **static partition pruning**: the scan physically lists and
  reads only the nprobe probed directories. An executed-plan test pins
  the scan row count to the probed cells' contents.

The layout IS the index: no sidecar format, any Hadoop FS, readable by
plain Spark. Same probe metric and scoring as ivf_pq_topk (shared
helper), so in-memory and persisted answers are identical by
construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rtdl_spark.functions.localdf import local_df

from rtdl_spark.functions.pq_np import adc_score, pq_codebooks, pq_encode
from rtdl_spark.operators.similarity import (
    _pq_probe_rows,
    ivf_assign,
    seed_centroids,
)


def build_ivf_pq_index(
    corpus: DataFrame,
    path: str,
    n_cells: int = 8,
    m: int = 8,
    ks: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_method: str = "first",
    train_iters: int = 0,
    train_sample: int = 1024,
) -> None:
    """Build the index at ``path``: ``data/`` (id, codes; partitioned by
    cell_id), ``meta_centroids/``, ``meta_codebooks/``."""
    import numpy as np

    spark = corpus.sparkSession
    centroids = seed_centroids(
        corpus, n_cells, id_col, vec_col, method=seed_method
    )
    assigned = ivf_assign(corpus, centroids, id_col, vec_col)
    n_sample = max(ks, train_sample) if train_iters > 0 else ks
    sample = np.asarray(
        [
            list(r[vec_col])
            for r in corpus.orderBy(id_col).limit(n_sample).collect()
        ],
        dtype=np.float64,
    )
    books = pq_codebooks(sample, m, ks, train_iters=train_iters)
    (
        assigned.select(
            F.col(id_col).alias("neighbor_id"),
            "cell_id",
            pq_encode(F.col(vec_col), books).alias("codes"),
        )
        .filter(F.col("codes").isNotNull())
        .write.mode("overwrite")
        .partitionBy("cell_id")
        .parquet(f"{path}/data")
    )
    centroids.select(
        "cell_id", F.col(vec_col).cast("array<double>").alias("vec")
    ).write.mode("overwrite").parquet(f"{path}/meta_centroids")
    mm, kk, sub = books.shape
    local_df(spark, 
        [
            (j, c, [float(x) for x in books[j][c]])
            for j in range(mm)
            for c in range(kk)
        ],
        "j int, c int, vec array<double>",
    ).write.mode("overwrite").parquet(f"{path}/meta_codebooks")


def append_to_ivf_pq_index(
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incremental index growth — the recurring-crawl shape (mirror of
    dedup_against_corpus): assign + encode a NEW batch with the index's
    FROZEN model (centroids/codebooks read back from the meta tables —
    never retrained here, so existing codes stay valid and queries see
    old and new rows identically) and append the codes into the cell
    partitions. One narrow scan of the new batch; no touch of existing
    data files. Retrain = rebuild, by design: an index whose model
    drifts under appends silently degrades recall."""
    import numpy as np

    spark = new_vectors.sparkSession
    centroids = spark.read.parquet(f"{path}/meta_centroids").select(
        "cell_id", F.col("vec").alias(vec_col)
    )
    book_rows = spark.read.parquet(f"{path}/meta_codebooks").collect()
    mm = 1 + max(r["j"] for r in book_rows)
    kk = 1 + max(r["c"] for r in book_rows)
    sub = len(book_rows[0]["vec"])
    books = np.zeros((mm, kk, sub))
    for r in book_rows:
        books[r["j"]][r["c"]] = r["vec"]

    assigned = ivf_assign(new_vectors, centroids, id_col, vec_col)
    (
        assigned.select(
            F.col(id_col).alias("neighbor_id"),
            "cell_id",
            pq_encode(F.col(vec_col), books).alias("codes"),
        )
        .filter(F.col("codes").isNotNull())
        .write.mode("append")
        .partitionBy("cell_id")
        .parquet(f"{path}/data")
    )


def query_ivf_pq_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    nprobe: int = 2,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Answer top-k from the persisted index: only the probed cell
    partitions are read (``cell_id IN (...)`` prunes statically), codes
    score via the broadcast per-query LUT in pure Catalyst. Returns
    query_id, neighbor_id, approx_dist, rank, cell_id — identical to
    ivf_pq_topk on the same parameters."""
    import numpy as np

    cent_rows = [
        {"cell_id": r["cell_id"], vec_col: r["vec"]}
        for r in spark.read.parquet(f"{path}/meta_centroids").collect()
    ]
    book_rows = spark.read.parquet(f"{path}/meta_codebooks").collect()
    mm = 1 + max(r["j"] for r in book_rows)
    kk = 1 + max(r["c"] for r in book_rows)
    sub = len(book_rows[0]["vec"])
    books = np.zeros((mm, kk, sub))
    for r in book_rows:
        books[r["j"]][r["c"]] = r["vec"]

    q_rows = queries.select(id_col, vec_col).collect()
    probes = _pq_probe_rows(q_rows, cent_rows, books, nprobe, id_col, vec_col)
    probe_df = F.broadcast(
        local_df(spark, 
            probes, "query_id long, cell_id int, _lut array<array<double>>"
        )
    )
    probed_cells = sorted({cell for _, cell, _ in probes})
    # partition-directory keys may read back as strings depending on
    # partitionColumnTypeInference; pin the int type (the isin filter on
    # the partition column prunes either way)
    data = (
        spark.read.parquet(f"{path}/data")
        .withColumn("cell_id", F.col("cell_id").cast("int"))
        .filter(F.col("cell_id").isin(probed_cells))
    )
    scored = (
        data.join(probe_df, "cell_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "approx_dist",
            F.round(adc_score(F.col("codes"), F.col("_lut")), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("approx_dist"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "approx_dist", "rank", "cell_id")
    )
