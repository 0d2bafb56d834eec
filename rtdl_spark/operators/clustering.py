"""Iterative clustering over embedding columns — the iterative-algorithm
pattern (SURVEY §2C; the IVF similarity scale path needs centroids from
somewhere).

K-means, Lloyd's algorithm, expressed Spark-first:
- assignment is a broadcast argmin (centroids are k×dim — KBs — so the
  corpus never shuffles for it);
- the update step is per-dimension SUM aggregates — map-side combinable,
  k rows out, never a collect_list of member vectors (which would gather
  a whole cell's vectors on one reducer: the memory cliff at 100 TB);
- the driver loop carries only the centroid VALUES (k small rows per
  iteration) — the canonical Spark iteration shape: flat lineage re-planned
  from the scan each pass, no ever-growing DAG, no mandatory caching.

At 100 TB each iteration is one scan + one tiny shuffle (k groups).
Convergence extras (tolerance stop, k-means++ seeding, mini-batching) are
deliberately out of scope — the deliverable is the distributed iteration
shape with deterministic seeding, verified by inertia-decrease tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rtdl_spark.functions.localdf import local_df

from rtdl_spark.functions.vectors import to_double


def _sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign(vecs: DataFrame, cent_df) -> DataFrame:
    """Nearest-centroid assignment: broadcast argmin, ties to lowest cell."""
    w = Window.partitionBy("_id").orderBy(F.asc("_d"), F.asc("cell_id"))
    return (
        vecs.join(cent_df)
        .withColumn("_d", _sq_dist(F.col("_v"), F.col("_c")))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("_id", "_v", "cell_id", "_d")
    )


def kmeans(
    corpus: DataFrame,
    k: int = 8,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: str = "first",
    exact_replay: bool = False,
) -> DataFrame:
    """Lloyd's k-means; returns (cell_id, n_members, inertia) after
    ``n_iter`` iterations. Deterministic: seeded from the k lowest-id
    vectors (``init="first"``) or by the shared farthest-first
    traversal (``init="kmeanspp"`` — operators/similarity.py::
    _greedy_seed_rows, the same seeding the IVF/PQ/SemDeDup family
    uses); assignment ties break to the lowest cell_id.

    ``exact_replay=True`` makes the whole trajectory bit-replayable by an
    independent SQL engine (the pagerank-unroll discipline): the update
    step's per-dimension sums go through DECIMAL (exact, summation-order-
    independent — a plain double SUM varies with Spark's partial-agg
    order, so no oracle could ever match it), each new centroid
    coordinate is then one deterministic double division, and the final
    inertia is a floor-fixed-point integer sum (floor(d·1e6) per member,
    exact integer arithmetic) instead of a rounded float sum. The float
    kmeans trajectory itself is unchanged in spirit — squared distances
    and argmin stay plain doubles — only the two order-sensitive
    reductions are made associativity-exact."""
    spark = corpus.sparkSession
    vecs = corpus.select(
        F.col(id_col).alias("_id"), to_double(F.col(vec_col)).alias("_v")
    )
    if init == "kmeanspp":
        from rtdl_spark.operators.similarity import _greedy_seed_rows

        seeds = _greedy_seed_rows(vecs, k, "_id", "_v", sample_cap=4096)
        if not seeds:
            raise ValueError("kmeans: empty corpus")
        dim = len(seeds[0][1])
        centroids = [(i + 1, v) for i, (_, v) in enumerate(seeds)]
    elif init == "first":
        seed_rows = vecs.orderBy("_id").limit(k).collect()
        if not seed_rows:
            raise ValueError("kmeans: empty corpus")
        dim = len(seed_rows[0]["_v"])
        centroids = [(i + 1, list(r["_v"])) for i, r in enumerate(seed_rows)]
    else:
        raise ValueError(f"kmeans: unknown init {init!r}")

    def cent_frame():
        return F.broadcast(
            local_df(spark, centroids, "cell_id int, _c array<double>")
        )

    def _dim_sum(i: int):
        x = F.element_at("_v", i + 1)
        if exact_replay:
            return F.sum(x.cast("decimal(28,12)")).cast("double")
        return F.sum(x)

    for _ in range(n_iter):
        assigned = _assign(vecs, cent_frame())
        # update: per-dimension sums (map-side combinable) / member count
        new_cent = (
            assigned.groupBy("cell_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[_dim_sum(i).alias(f"_s{i}") for i in range(dim)],
            )
            .collect()
        )
        centroids = [
            (r["cell_id"], [r[f"_s{i}"] / r["n"] for i in range(dim)])
            for r in new_cent
        ]

    inertia = (
        (F.sum(F.floor(F.col("_d") * 1e6)).cast("double") / F.lit(1e6))
        if exact_replay
        else F.round(F.sum("_d"), 6)
    )
    return _assign(vecs, cent_frame()).groupBy("cell_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        inertia.alias("inertia"),
    )


def pca_fit(
    vecs: DataFrame,
    vec_col: str = "embedding",
    n_components: int = 8,
):
    """Distributed PCA fit over an embedding column: returns
    (mean: list[float], components: list[list[float]] — rows are the top
    ``n_components`` principal axes, variance_ratio: list[float]).

    Scale shape: embeddings never leave the executors — the fit reduces
    the corpus to one d-vector (mean) and one d×d Gram matrix via a
    SINGLE map-combinable aggregate (per-(i,j) sums of x_i·x_j after
    posexplode pairing), then eigendecomposes the d×d matrix on the
    driver (d is embedding width: 16-1024 — a numpy-instant problem).
    That is the standard big-n-small-d covariance route; at d where d²
    sums stop fitting a shuffle row (~4k+), switch to randomized sketch
    methods, which this corpus does not need.

    Determinism: eigenvectors are sign-fixed (largest-|component| made
    positive) so every run and engine produces identical projections."""
    import numpy as np

    from rtdl_spark.functions.vectors import to_double

    v = to_double(vec_col)
    base = vecs.select(v.alias("_v")).filter(F.col("_v").isNotNull())
    # one pass: n, per-dim sums, and upper-triangle cross sums
    pairs = base.select(
        F.posexplode("_v").alias("i", "xi"), F.col("_v").alias("_v")
    ).select(
        "i", "xi", F.posexplode("_v").alias("j", "xj")
    ).filter(F.col("j") >= F.col("i"))
    sums = pairs.groupBy("i", "j").agg(
        F.sum(F.col("xi") * F.col("xj")).alias("sxx"),
        F.sum("xi").alias("sx"),
        F.count(F.lit(1)).alias("n"),
    ).collect()
    d = max(r["j"] for r in sums) + 1
    n = max(r["n"] for r in sums)
    gram = np.zeros((d, d))
    sx = np.zeros(d)
    for r in sums:
        gram[r["i"], r["j"]] = gram[r["j"], r["i"]] = r["sxx"]
        if r["i"] == r["j"]:
            sx[r["i"]] = r["sx"]
    mean = sx / n
    cov = gram / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T  # rows = components
    for k in range(comps.shape[0]):  # sign fix: largest-|x| entry positive
        j = int(np.argmax(np.abs(comps[k])))
        if comps[k, j] < 0:
            comps[k] = -comps[k]
    total = float(np.clip(evals.sum(), 1e-30, None))
    ratio = [float(evals[i] / total) for i in order]
    return mean.tolist(), comps.tolist(), ratio


def pca_project(
    vecs: DataFrame,
    mean: list[float],
    components: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project embeddings onto fitted components: out_k = (x - mean)·c_k.
    Pure Catalyst expression work (zip_with + aggregate per component —
    components are literals, so the whole projection stays in codegen;
    no UDF, no shuffle)."""
    from rtdl_spark.functions.vectors import to_double

    x = to_double(vec_col)
    centered = F.zip_with(
        x,
        F.array(*[F.lit(float(m)) for m in mean]),
        lambda a, b: a - b,
    )
    outs = []
    for k, comp in enumerate(components):
        c = F.array(*[F.lit(float(ci)) for ci in comp])
        outs.append(
            F.aggregate(
                F.zip_with(centered, c, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, y: acc + y,
            ).alias(f"_p{k}")
        )
    tmp = vecs.withColumns({f"_p{k}": o for k, o in enumerate(outs)})
    return tmp.withColumn(
        out_col, F.array(*[F.col(f"_p{k}") for k in range(len(components))])
    ).drop(*[f"_p{k}" for k in range(len(components))])
