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


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst"):
    """Distributed triangle counting with the degree-orientation trick:
    every undirected edge is oriented from its LOWER-degree endpoint to
    the higher (ties by id), so each node's out-adjacency is bounded by
    O(sqrt(E)) — the wedge join (adjacency ⋈ adjacency on the middle
    node) then does O(E^{3/2}) work worst-case instead of the naive
    sum-of-squared-degrees, which a power-law hub makes quadratic. Three
    hash joins on node keys, no per-row Python.

    Returns a 1-row DataFrame: n_triangles (each triangle counted once).
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("n")).unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    oriented = (
        e.join(deg.withColumnRenamed("n", "a").withColumnRenamed("d", "da"), "a")
        .join(deg.withColumnRenamed("n", "b").withColumnRenamed("d", "db"), "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
            .alias("e")
        )
        .select("e.u", "e.v")
    )
    w1 = oriented.select(F.col("u").alias("x"), F.col("v").alias("y1"))
    w2 = oriented.select(F.col("u").alias("x"), F.col("v").alias("y2"))
    wedges = w1.join(w2, "x").filter(F.col("y1") < F.col("y2"))
    # a wedge (x; y1, y2) closes iff (y1, y2) is an edge in EITHER
    # orientation — check against the undirected canonical set
    closed = wedges.join(
        e.select(F.col("a").alias("y1"), F.col("b").alias("y2")),
        ["y1", "y2"],
        "left_semi",
    )
    return closed.agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))


def clustering_coefficients(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node local clustering coefficient: triangles_at(n) /
    C(degree(n), 2) — how close each node's neighborhood is to a clique
    (1.0 inside duplicate cliques, ~0 at bridge nodes). Same oriented
    wedge join as triangle_count; each closed wedge credits its THREE
    corners via one explode, then a count per node — no extra join
    passes over the edge set.

    Returns (node, degree, n_triangles, coefficient); degree-1 nodes
    report coefficient 0.0."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("n")).unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    oriented = (
        e.join(deg.withColumnRenamed("n", "a").withColumnRenamed("degree", "da"), "a")
        .join(deg.withColumnRenamed("n", "b").withColumnRenamed("degree", "db"), "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
            .alias("e")
        )
        .select("e.u", "e.v")
    )
    w1 = oriented.select(F.col("u").alias("x"), F.col("v").alias("y1"))
    w2 = oriented.select(F.col("u").alias("x"), F.col("v").alias("y2"))
    wedges = w1.join(w2, "x").filter(F.col("y1") < F.col("y2"))
    closed = wedges.join(
        e.select(F.col("a").alias("y1"), F.col("b").alias("y2")),
        ["y1", "y2"],
        "left_semi",
    )
    per_node = (
        closed.select(
            F.explode(F.array("x", "y1", "y2")).alias("n")
        )
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return deg.join(per_node, "n", "left").select(
        F.col("n").alias("node"),
        "degree",
        F.coalesce("n_triangles", F.lit(0)).cast("bigint").alias("n_triangles"),
        F.when(
            F.col("degree") >= 2,
            F.coalesce("n_triangles", F.lit(0))
            * 2.0
            / (F.col("degree") * (F.col("degree") - 1)),
        )
        .otherwise(F.lit(0.0))
        .alias("coefficient"),
    )


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 100,
) -> DataFrame:
    """k-core extraction by iterative peeling: repeatedly delete nodes of
    degree < k until none remain; what survives is the maximal subgraph
    where every node keeps >= k neighbors — the dense kernel of a
    duplicate/similarity graph (a large k-core of near-dup edges is a
    template/boilerplate cluster, invisible to pairwise thresholds).

    Scale shape: each round is ONE degree aggregate + ONE semi-join
    filter of the live edge set — both hash-partitioned on node id; no
    adjacency lists are ever materialized. Rounds are bounded by the peel
    depth (the graph's degeneracy ordering depth), not |V|: every round
    removes EVERY currently-under-k node at once. Lineage is cut per
    round via localCheckpoint (the live edge set shrinks monotonically;
    see operators/components.py for the eviction caveats at very large
    |E| — a checkpoint-dir variant is the same two-line change there).

    Returns: node, degree — nodes of the k-core with their within-core
    degree (empty frame if the k-core is empty).

    BEHAVIOR CHANGE (round 3): exhausting ``max_iter`` with live edges
    remaining now raises RuntimeError instead of returning an empty
    frame — a silently-empty result denied k-cores that existed below
    deep peel cascades. Callers that treated budget exhaustion as "no
    k-core" must size ``max_iter`` for their graph's peel depth (each
    round removes at least one sub-k-degree layer, so depth <= the
    degeneracy ordering depth; 100 covers any realistic dedup graph).
    """
    from rtdl_spark.operators.components import release_local_checkpoint

    live = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    prev = None
    for _ in range(max_iter):
        deg = (
            live.select(F.col("a").alias("n"))
            .unionAll(live.select(F.col("b").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("degree"))
        )
        low = deg.filter(F.col("degree") < k).select("n")
        n_low = low.count()
        if n_low == 0:
            result = deg.select(F.col("n").alias("node"), "degree")
            if prev is not None:
                # materialize before freeing the lineage the plan reads
                result = result.localCheckpoint()
                release_local_checkpoint(prev)
            return result
        live = (
            live.join(
                low.withColumnRenamed("n", "a"), "a", "left_anti"
            )
            .join(low.withColumnRenamed("n", "b"), "b", "left_anti")
            .select("a", "b")
            .localCheckpoint()
        )
        if prev is not None:
            # only one checkpoint generation stays pinned (see NOTES.md:
            # localCheckpoint blocks are unevictable storage)
            release_local_checkpoint(prev)
        prev = live
        if live.isEmpty():
            return live.sparkSession.createDataFrame(
                [], "node long, degree long"
            )
    # Peeling did not converge within the budget; a non-empty k-core may
    # still exist (deep cascades peel one layer per round), so silently
    # returning empty would be wrong — make the caller raise the budget.
    raise RuntimeError(
        f"k_core: peeling did not converge within max_iter={max_iter} "
        f"rounds; raise max_iter (each round removes at least one "
        f"sub-k-degree layer)"
    )
