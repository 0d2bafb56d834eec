"""Connected components over candidate-pair edges — the transitive-closure
step that turns near-duplicate PAIRS (MinHash/winnow/cosine joins emit
edges) into duplicate CLUSTERS with one canonical representative each.
Pairs alone under-delete: if A~B and B~C but A!~C, keeping "one of each
pair" retains two of the three docs; the component {A,B,C} keeps exactly
one.

Algorithm: alternating large-star/small-star (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) — the shuffle-bounded
formulation built for exactly this setting:

- **large-star**: every node connects its strictly-larger neighbors to the
  minimum of its neighborhood (including itself);
- **small-star**: every node connects its smaller-or-equal neighbors (and
  itself) to that minimum.

Both are a window-min over edges partitioned by node — one shuffle each —
and the pair provably converges in O(log² n) rounds to star graphs whose
centers are the component minima. Compared to naive label propagation
(O(diameter) rounds — a 100-hop chain of shingled docs takes 100 shuffles)
or repeated self-joins (intermediate blow-up), every intermediate edge set
here stays O(E) and the round count is logarithmic.

Scale notes (100 TB):
- The driver loop carries NO data — only a (count, checksum) signature per
  round for convergence detection. Edges stay distributed throughout.
- `localCheckpoint` after each round truncates lineage; otherwise round k
  re-plans k rounds of windows and the DAG grows quadratically.
- Window-min (not groupBy+join) keeps each phase to a single exchange on
  the node key, which the next phase's partitioning then reuses.
- Skew: a mega-component's hub node concentrates its edges on one
  partition only at the star *end state*, when the component's edge list
  has already collapsed to size(component) rows — the dangerous
  quadratic state never exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def release_local_checkpoint(df: DataFrame) -> None:
    """Eagerly free a localCheckpoint'd DataFrame's storage blocks.

    Dataset.unpersist() is a NO-OP for localCheckpoint blocks (it only
    clears CacheManager entries; the checkpoint RDD never registers one) —
    verified against Spark 4.1.2. Reach through to the LogicalRDD's
    materialized RDD and unpersist THAT. Only call once nothing will read
    ``df`` again (the truncated lineage cannot be recomputed). Best-effort:
    on any internals change, falls back to the async ContextCleaner.
    """
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(True)
    except Exception:
        pass


def _large_star(edges: DataFrame) -> DataFrame:
    """(v, min(N(u) ∪ {u})) for every neighbor v > u, over symmetrized
    edges. Emitted edges always point strictly downward (v > m)."""
    sym = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    m = F.least(F.min("v").over(Window.partitionBy("u")), F.col("u"))
    # No distinct here: duplicate (v, m) edges across neighborhoods don't
    # change any later min, and small-star distincts its own output — one
    # less full shuffle per round.
    return (
        sym.withColumn("m", m)
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient each edge large→small, then connect every node of each
    neighborhood (neighbors AND the center) to the neighborhood minimum."""
    oriented = edges.select(
        F.greatest(F.col("u"), F.col("v")).alias("u"),
        F.least(F.col("u"), F.col("v")).alias("v"),
    ).filter(F.col("u") != F.col("v"))
    with_min = oriented.withColumn(
        "m", F.least(F.min("v").over(Window.partitionBy("u")), F.col("u"))
    )
    nbrs = with_min.select(F.col("v").alias("u"), F.col("m").alias("v"))
    centers = with_min.select("u", F.col("m").alias("v"))
    return nbrs.union(centers).filter(F.col("u") != F.col("v")).distinct()


def connected_components(
    pairs: DataFrame,
    src: str = "id1",
    dst: str = "id2",
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
    large_star_steps: int = 1,
) -> DataFrame:
    """Resolve undirected edges ``(src, dst)`` into components.

    Returns ``(node, component)`` — one row per node that appears in any
    edge, with ``component`` = the minimum node id of its component (the
    canonical-representative convention used across the dedup family).
    Nodes with no edges don't appear; callers keep them unconditionally
    (they have no duplicates).

    Convergence is detected by a per-round (count, xxhash64-sum) signature
    of the edge set — two tiny aggregates instead of an exceptAll join;
    a hash collision masking a real change is ~2⁻⁶⁴ and self-heals next
    round since a non-converged state keeps moving toward the fixpoint.
    ``max_iter`` (default 25 ≈ log²(10⁹) rounds with slack) guards driver
    hangs on adversarial inputs; hitting it raises rather than returning
    a partially-merged (silently wrong) clustering.

    Lineage truncation per round (each phase references its input twice,
    so without truncation the plan doubles per round):

    - ``checkpoint_dir=None``: ``localCheckpoint`` + eager unpersist of
      the previous round. Fast, but checkpoint blocks are UNEVICTABLE
      storage — right for edge sets that fit comfortably in executor
      memory (the usual dedup-pair case).
    - ``checkpoint_dir=<path>``: parquet round-trip per round — zero heap
      storage, any Hadoop FS scheme, previous round's files deleted as
      soon as the next lands (each run writes under its own unique
      subdirectory, so concurrent runs may share the dir). The at-scale
      mode: a 30M-edge worst case that OOMs the 8 GB local default under
      pinned checkpoint blocks runs to completion this way (and
      reliable-storage checkpoints are what a 1000-executor job wants
      anyway — an executor loss doesn't restart the iteration). The FINAL
      round's files back the returned DataFrame lazily: consume (or
      persist) the result before deleting ``checkpoint_dir``.

    ``large_star_steps``: large-star applications per round before the
    small-star. Each large-star application alone preserves components
    (it only re-wires neighbors toward neighborhood minima), so any
    count is correct; the fixpoint signature still decides convergence.
    2 halves the ROUND count (11 → 6 on path worst cases) at the price
    of one extra window shuffle per round — measured net: wins when
    per-round fixed costs dominate (1M edges in-memory −13%, 10M disk
    85→80s), loses when the doubled shuffle on still-large early rounds
    dominates (30M disk 195→205s). Default 1 (the textbook alternation)
    is the safe choice at scale; raise it for latency-bound graphs.
    """
    spark = pairs.sparkSession
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )

    # Unique per-run subdir: fixed round paths under a SHARED dir would let
    # two concurrent jobs overwrite/delete each other's rounds mid-flight.
    run_dir = None
    if checkpoint_dir is not None:
        import uuid

        run_dir = f"{checkpoint_dir}/cc_{uuid.uuid4().hex}"

    prev_sig = None
    prev_ckpt: DataFrame | None = None
    prev_path: str | None = None
    for i in range(max_iter):
        for _ in range(large_star_steps):
            edges = _large_star(edges)
        edges = _small_star(edges)
        if run_dir is None:
            edges = edges.localCheckpoint()
            if prev_ckpt is not None:
                # Release the previous round NOW: waiting for the async
                # ContextCleaner lets ~max_iter edge sets pile up in
                # unevictable storage memory (measured: the 30M-edge soak
                # starved window sorts into UNABLE_TO_ACQUIRE_MEMORY).
                release_local_checkpoint(prev_ckpt)
            prev_ckpt = edges
        else:
            from rtdl_spark.sources import fsutil

            path = f"{run_dir}/round_{i}"
            edges.write.mode("overwrite").parquet(path)
            edges = spark.read.parquet(path)
            if prev_path is not None:
                fsutil.delete(spark, prev_path)
            prev_path = path
        row = edges.agg(
            F.count(F.lit(1)).alias("n"),
            # DECIMAL sum: a long sum of 64-bit hashes overflows (and ANSI
            # mode — the Spark 4 default — makes that a hard error).
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).first()
        sig = (row["n"], row["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    # At the fixpoint edges form stars centered on component minima, so
    # each node's component is the min over its (symmetrized) neighborhood
    # and itself — correct for both leaves and centers.
    sym = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    return (
        sym.groupBy("u")
        .agg(F.least(F.min("v"), F.first("u")).alias("component"))
        .select(F.col("u").alias("node"), "component")
    )


def incremental_components(
    assignment: DataFrame,
    new_pairs: DataFrame,
    src: str = "id1",
    dst: str = "id2",
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Merge newly-discovered edges into an existing clustering — the
    recurring-crawl shape for cluster dedup: the historical corpus keeps
    its (node, component) assignment; only the new batch mines pairs
    (against itself + the corpus), and the merge never re-mines or
    re-walks historical edges.

    Correctness: a prior assignment IS its component graph's spanning
    star (connectivity-preserving), so CC over star-edges ∪ new-edges
    equals CC over old-edges ∪ new-edges — verified against the full
    recomputation's oracle. Cost: star edges are one row per non-root
    node (≤ the original edge count), already one hop from their minimum,
    so rounds are driven by the new edges' structure, not corpus size.

    ``assignment``: (node, component) from a previous run. Returns the
    updated (node, component) over all nodes seen in either input.
    """
    stars = assignment.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(src), F.col("component").alias(dst)
    )
    # Strip self-loops BEFORE the union: a node whose only new edge is a
    # self-pair would otherwise count as "touched" (excluded from the
    # restore anti-join) yet be dropped by connected_components' own
    # self-loop filter — losing its historical assignment entirely.
    merged = stars.unionByName(
        new_pairs.select(F.col(src), F.col(dst)).filter(
            F.col(src) != F.col(dst)
        )
    )
    out = connected_components(
        merged, src, dst, max_iter=max_iter, checkpoint_dir=checkpoint_dir
    )
    # Prior nodes touching no edge at all (component roots whose members
    # all stayed put, incl. the degenerate node==component rows) fall out
    # of the CC result; restore their assignment unchanged.
    untouched = assignment.join(
        merged.select(F.col(src).alias("node"))
        .union(merged.select(F.col(dst).alias("node")))
        .distinct(),
        "node",
        "left_anti",
    )
    return out.unionByName(untouched)
