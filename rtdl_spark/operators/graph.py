"""Graph centrality over document/similarity graphs (north-star extension,
SURVEY.md §2C iterative algorithms): PageRank, the link-quality signal used
by web-corpus curation (CommonCrawl ranks hosts by centrality; quality
filters consume it as a feature) — and the second classic Spark iteration
shape next to k-means (operators/clustering.py) and connected components
(operators/components.py).

Scale design:
- The edge set is the big thing; it is built ONCE (degree attached,
  hash-partitioned on the source key) and reused every iteration — only
  the rank frame (O(V), small next to O(E)) moves per round.
- One iteration = one co-partitioned join (edges ⋈ ranks on src) + one
  groupBy(dst) sum — two shuffles of rank-sized data, map-side combinable.
- The driver carries scalars only (N, per-round dangling mass); rank
  lineage is truncated per round with the eager-release pattern
  components.py taught (localCheckpoint blocks are unevictable; release
  the previous round explicitly).
- Mass is conserved exactly (dangling mass redistributed uniformly), so
  ranks always sum to 1 — the invariant the tests pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rtdl_spark.operators.components import release_local_checkpoint


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    n_iter: int = 10,
    symmetric: bool = False,
) -> DataFrame:
    """PageRank over a directed edge list; returns ``(node, rank)`` with
    ranks summing to 1. ``symmetric=True`` unions reversed edges first —
    the right call for similarity graphs (near-dup pairs are undirected).

    Fixed iteration count (PageRank converges geometrically at rate
    ``damping``; 10 rounds ≈ 0.85¹⁰ ≈ 20% residual on the slowest mode,
    plenty for ranking features). Dangling nodes (no out-edges)
    redistribute their mass uniformly — the standard correction that
    keeps the rank vector a probability distribution.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
    )
    if symmetric:
        e = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    e = e.distinct()

    nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank: empty graph")

    deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("_deg"))
    # Edge structure is iteration-invariant: attach degrees and pin the
    # partitioning on the join key once; every round's join reuses it and
    # only the rank frame shuffles.
    ew = e.join(deg, "u").repartition("u").localCheckpoint()
    nodes = nodes.localCheckpoint()

    # Dangling detection once, not per round: a node is dangling iff it
    # has no out-edges — an iteration-invariant property. Symmetrized
    # graphs can't have any (every edge gives both endpoints an
    # out-edge), so the per-round dangling-mass job — one full rank scan
    # per iteration — vanishes for similarity graphs.
    has_dangling = (
        not symmetric
        and nodes.join(deg, nodes["node"] == deg["u"], "left_anti").count() > 0
    )

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    prev: DataFrame | None = None
    for _ in range(n_iter):
        # Mass leaving dangling nodes this round (driver scalar).
        dangling = (
            ranks.join(deg, ranks["node"] == deg["u"], "left_anti")
            .agg(F.sum("rank"))
            .first()[0]
            or 0.0
        ) if has_dangling else 0.0
        contribs = (
            ew.join(ranks, ew["u"] == ranks["node"])
            .select(
                F.col("v").alias("node"),
                (F.col("rank") / F.col("_deg")).alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_c"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("_c"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
        if prev is not None:
            release_local_checkpoint(prev)
        prev = ranks
    release_local_checkpoint(ew)
    release_local_checkpoint(nodes)
    return ranks
