"""Training-shard export: deterministic global shuffle + fixed-count
sharded write — the last step of a training-data pipeline, turning a
curated corpus into the shard files a training loader consumes.

Why not ``ORDER BY rand()``: a global sort at 100 TB is a full range
shuffle whose only purpose is an ordering no reader needs end-to-end —
training loaders consume *shards* and only need (a) every row to land in
exactly one shard, (b) the assignment to be seed-deterministic, (c) rows
to be well-mixed within and across shards. Hashing gives all three with a
single hash-partition shuffle and an in-partition sort (sortWithinPartitions
is a local sort, no range-exchange): O(n) movement, no skew from the sort's
sampling pass, and resumable/reproducible because the shard of a row is a
pure function of (seed, id), independent of cluster size or input order.

The reference has no export path at all (its terminal op is the one-file-
per-message Parquet write, ingester/ingester.go:551-565); this operator is
north-star surface for the LLM-pipeline extension (SURVEY.md §2C).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rtdl_spark.functions.text import token_hash


def shuffle_key(id_col: str | F.Column, seed: int) -> F.Column:
    """md5(seed ++ ':' ++ id) — the deterministic global-shuffle order key.

    Changing the seed re-deals every row to a new shard and a new position;
    the same seed reproduces the exact byte order on any cluster layout.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.md5(F.concat(F.lit(str(seed)), F.lit(":"), c.cast("string")))


def assign_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Annotate each row with (shard_id, shuffle_key).

    shard_id = polyhash(md5(seed:id)) mod n_shards — uniform because the
    md5 digest is uniform; exact-reproducible in ANSI SQL (list_reduce
    over the digest chars, see the query oracle). shuffle_key orders rows
    within a shard.
    """
    key = shuffle_key(id_col, seed)
    return df.withColumn("shuffle_key", key).withColumn(
        "shard_id", (token_hash(F.col("shuffle_key")) % n_shards).cast("int")
    )


def export_training_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    n_shards: int = 8,
    seed: int = 42,
    fmt: str = "parquet",
) -> DataFrame:
    """Write ``df`` as ``n_shards`` shard files under ``path`` and return
    the manifest (one row per shard).

    Physical plan: one hash-partition exchange on shard_id (repartition to
    exactly n_shards partitions), a LOCAL sort on the shuffle key (no
    range exchange), then a partitionBy(shard_id) write — each task owns
    one whole shard, so each shard is one file and parquet row-group order
    IS the training order. At 1000 executors the same plan holds with
    n_shards sized to ~the executor count × a small factor.

    Manifest columns: shard_id, n_rows, order_digest (md5 over the id
    sequence in training order — the reproducibility receipt a loader can
    verify against).
    """
    assigned = assign_shards(df, id_col=id_col, n_shards=n_shards, seed=seed)
    # shard_id leads the sort: FileFormatWriter requires task rows ordered
    # by the partition column and would inject its OWN (order-destroying)
    # sort if that prefix weren't already satisfied.
    writer = (
        assigned.repartition(n_shards, "shard_id")
        .sortWithinPartitions("shard_id", "shuffle_key", id_col)
        .write.mode("overwrite")
        .partitionBy("shard_id")
    )
    # fmt="json" emits JSONL shard files — the format most training
    # loaders stream natively; same plan, same order guarantee (the JSON
    # writer preserves task row order exactly like parquet's row groups).
    if fmt == "parquet":
        writer.parquet(path)
    elif fmt == "json":
        writer.json(path)
    else:
        raise ValueError(f"unsupported shard format: {fmt!r}")
    return shard_manifest(assigned, id_col=id_col)


def shard_manifest(assigned: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-shard manifest from an ``assign_shards`` frame.

    order_digest folds the shard's ids *in shuffle order* into one md5 —
    computed with a single groupBy (collect_list is map-side combinable;
    a shard's id list is n/n_shards rows, the driver never sees it).
    """
    ordered_ids = F.transform(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("shuffle_key").alias("k"),
                    F.col(id_col).cast("long").alias("i"),
                )
            )
        ),
        lambda s: s["i"].cast("string"),
    )
    return assigned.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.md5(F.array_join(ordered_ids, ",")).alias("order_digest"),
    )


def assign_curriculum_shards(
    df: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    n_shards: int = 8,
) -> DataFrame:
    """Annotate each row with (curriculum_rank, shard_id): rank = global
    position under (score, id) ascending, shard = contiguous rank band
    floor((rank-1)·n_shards / N) — curriculum-learning export, where a
    trainer consumes shard 0 (easiest) through n_shards-1 (hardest) in
    phase order. Bands are exactly balanced (sizes differ by ≤1) and
    DETERMINISTIC — unlike repartitionByRange, whose sampled boundaries
    shift run-to-run and skew under duplicate scores.

    Scale shape: the rank comes from assign_sequential_ids (score-bucketed
    hash shuffle — never a whole-table single-partition window); the band
    is then a pure function of rank, and N is one count() (same metadata
    pass the range sampler would do, but exact)."""
    from rtdl_spark.operators.curation import assign_sequential_ids

    n = df.count()
    ranked = assign_sequential_ids(
        df, [score_col, id_col], id_name="curriculum_rank"
    )
    if n == 0:
        return ranked.withColumn("shard_id", F.lit(None).cast("int"))
    return ranked.withColumn(
        "shard_id",
        F.floor((F.col("curriculum_rank") - 1) * n_shards / F.lit(n)).cast(
            "int"
        ),
    )


def export_curriculum_shards(
    df: DataFrame,
    path: str,
    score_col: str,
    id_col: str = "doc_id",
    n_shards: int = 8,
) -> DataFrame:
    """Write curriculum shards under ``path``: file order within a shard
    IS the curriculum order (easiest row first). Same writer discipline
    as export_training_shards: shard_id leads the local sort so
    FileFormatWriter doesn't inject its own order-destroying sort; one
    hash exchange to give each task a whole shard. Returns the annotated
    frame (rank + shard per row) for manifesting."""
    assigned = assign_curriculum_shards(
        df, score_col, id_col=id_col, n_shards=n_shards
    )
    (
        assigned.repartition(n_shards, "shard_id")
        .sortWithinPartitions("shard_id", "curriculum_rank")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(path)
    )
    return assigned
