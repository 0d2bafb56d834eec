"""Deduplication queries (north-star extension, SURVEY.md §2C) over the
``documents`` fixture: exact, fingerprint, brute-force Jaccard, full
MinHash+LSH, SimHash.

The MinHash/LSH oracle is the *same algorithm* re-implemented in DuckDB
SQL (identical integer hashing), so the driver's hash-compare verifies the
whole pipeline — shingling, signatures, banding, candidate join, exact
verification — not just row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rtdl_spark.catalog import table
from rtdl_spark.functions.text import (
    HASH_P,
    MINHASH_A,
    MINHASH_B,
    fingerprint,
    jaccard,
    shingles,
    simhash16,
    tokens,
)
from rtdl_spark.operators.dedup import dedup_groups, minhash_lsh_pairs
from rtdl_spark.queries import query

_A_SQL = "[" + ",".join(str(x) for x in MINHASH_A) + "]"
_B_SQL = "[" + ",".join(str(x) for x in MINHASH_B) + "]"

# DuckDB twin of functions.text.token_hash / minhash_signature / lsh bands.
_LSH_CTE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), sh AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 3 THEN
           list_distinct(list_transform(range(1, len(w) - 1),
             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
         ELSE [] END AS sh
  FROM toks
), hashed AS (
  SELECT doc_id, sh,
         list_transform(sh, s ->
           list_reduce(list_transform(string_split(s, ''),
                                      c -> ascii(c)::BIGINT),
                       (h, c) -> (h * 31 + c) % {HASH_P})) AS hs
  FROM sh
), sigs AS (
  SELECT doc_id, sh,
         list_transform(range(0, {len(MINHASH_A)}),
           i -> list_min(list_transform(hs,
                 h -> ({_A_SQL}[i+1] * h + {_B_SQL}[i+1]) % {HASH_P}))) AS sig
  FROM hashed
), buckets AS (
  SELECT doc_id, sh,
         UNNEST(list_transform(range(0, 4),
           b -> concat(b, ':', sig[3*b+1], ':', sig[3*b+2], ':', sig[3*b+3])))
           AS bucket
  FROM sigs
), cand AS (
  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
                  a.sh AS sh1, b.sh AS sh2
  FROM buckets a JOIN buckets b
    ON a.bucket = b.bucket AND a.doc_id < b.doc_id
)
"""


@query(
    "dedup_exact_by_source",
    oracle="""
    SELECT source, COUNT(*) AS n_docs,
           COUNT(DISTINCT text) AS n_distinct_texts,
           COUNT(DISTINCT lower(trim(text))) AS n_normalized_texts
    FROM documents
    GROUP BY source
    """,
)
def dedup_exact_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact + normalized dedup cardinalities — the groupBy-hash dedup
    family as an aggregate (one shuffle, partial combine)."""
    d = table(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("text").alias("n_distinct_texts"),
        F.countDistinct(F.lower(F.trim("text"))).alias("n_normalized_texts"),
    )


@query(
    "dedup_fingerprint_groups",
    oracle="""
    SELECT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))),
                               ' ')) AS dedup_key,
           MIN(doc_id) AS canonical_id,
           COUNT(*) AS group_size
    FROM documents
    GROUP BY 1
    """,
)
def dedup_fingerprint_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-set md5 fingerprint dedup: docs identical up to word order and
    repetition collapse to one group (canonical = min doc_id)."""
    d = table(spark, sf_dir, "documents")
    return dedup_groups(d, fingerprint("text"), "doc_id")


@query(
    "dedup_jaccard_bruteforce",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             CASE WHEN len(string_split(text,' ')) >= 3 THEN
               list_distinct(list_transform(
                 range(1, len(string_split(text,' ')) - 1),
                 i -> string_split(text,' ')[i] || ' ' ||
                      string_split(text,' ')[i+1] || ' ' ||
                      string_split(text,' ')[i+2]))
             ELSE [] END AS sh
      FROM documents WHERE doc_id < 150
    )
    SELECT a.doc_id AS id1, b.doc_id AS id2,
           ROUND(len(list_intersect(a.sh, b.sh)) * 1.0
                 / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard_sim
    FROM t a JOIN t b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sh, b.sh)) * 1.0
          / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
    """,
)
def dedup_jaccard_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference brute-force O(n²) shingle-Jaccard on a bounded sample —
    the correctness yardstick the LSH path is measured against."""
    d = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 150)
        .select(F.col("doc_id"), shingles("text").alias("sh"))
    )
    a = d.select(F.col("doc_id").alias("id1"), F.col("sh").alias("sh1"))
    b = d.select(F.col("doc_id").alias("id2"), F.col("sh").alias("sh2"))
    return (
        a.join(b, F.col("id1") < F.col("id2"))
        .withColumn("jaccard_sim", jaccard(F.col("sh1"), F.col("sh2")))
        .filter(F.col("jaccard_sim") >= 0.5)
        .select("id1", "id2", F.round("jaccard_sim", 6).alias("jaccard_sim"))
    )


@query(
    "dedup_minhash_lsh",
    oracle=_LSH_CTE
    + """
    SELECT id1, id2,
           ROUND(len(list_intersect(sh1, sh2)) * 1.0
                 / len(list_distinct(list_concat(sh1, sh2))), 6) AS jaccard_sim
    FROM cand
    WHERE ROUND(len(list_intersect(sh1, sh2)) * 1.0
                / len(list_distinct(list_concat(sh1, sh2))), 6) >= 0.5
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline (operators.dedup.minhash_lsh_pairs):
    12 exact-integer minhashes, 4×3 banding, candidate equi-join, exact
    Jaccard ≥ 0.5 verification. The oracle runs the identical algorithm in
    DuckDB SQL."""
    return minhash_lsh_pairs(
        table(spark, sf_dir, "documents"), "doc_id", "text", 3, 0.5
    )


@query(
    "dedup_simhash_profile",
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             list_transform(list_distinct(string_split(text, ' ')),
               t -> list_reduce(list_transform(string_split(t, ''),
                                               c -> ascii(c)::BIGINT),
                                (a, c) -> (a * 31 + c) % {HASH_P})) AS hs
      FROM documents
    ), sims AS (
      SELECT doc_id,
             list_reduce(list_transform(range(0, 16), b ->
               CASE WHEN list_reduce(list_transform(hs,
                           h -> ((h >> b) & 1) * 2 - 1), (x, y) -> x + y) >= 0
                    THEN (1::BIGINT << b) ELSE 0::BIGINT END),
               (x, y) -> x + y) AS simhash
      FROM h
    )
    SELECT simhash, COUNT(*) AS n_docs, MIN(doc_id) AS canonical_id
    FROM sims GROUP BY simhash HAVING COUNT(*) > 1
    """,
)
def dedup_simhash_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash buckets with >1 member — the Hamming-sketch dedup
    family; exact integer arithmetic keeps it engine-reproducible."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", simhash16("text").alias("simhash"))
        .groupBy("simhash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("canonical_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


@query(
    "dedup_ngram_token_jaccard",
    oracle="""
    WITH t AS (
      SELECT doc_id, list_distinct(string_split(text, ' ')) AS tk
      FROM documents WHERE doc_id < 150
    )
    SELECT a.doc_id AS id1, b.doc_id AS id2,
           ROUND(len(list_intersect(a.tk, b.tk)) * 1.0
                 / len(list_distinct(list_concat(a.tk, b.tk))), 6) AS token_jaccard
    FROM t a JOIN t b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.tk, b.tk)) * 1.0
          / len(list_distinct(list_concat(a.tk, b.tk))) >= 0.95
    """,
)
def dedup_ngram_token_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-gram (token-set) Jaccard — cheaper but weaker than shingles;
    included to contrast the n-gram granularity options."""
    d = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 150)
        .select("doc_id", F.array_distinct(tokens("text")).alias("tk"))
    )
    a = d.select(F.col("doc_id").alias("id1"), F.col("tk").alias("tk1"))
    b = d.select(F.col("doc_id").alias("id2"), F.col("tk").alias("tk2"))
    return (
        a.join(b, F.col("id1") < F.col("id2"))
        .withColumn("token_jaccard", jaccard(F.col("tk1"), F.col("tk2")))
        .filter(F.col("token_jaccard") >= 0.95)
        .select("id1", "id2", F.round("token_jaccard", 6).alias("token_jaccard"))
    )


@query(
    "dedup_embedding_cosine",
    oracle="""
    WITH base AS (SELECT vec_id, label, embedding FROM embeddings
                  WHERE vec_id < 200),
    noisy AS (
      SELECT vec_id + 100000 AS vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE) * 1.5)
               AS embedding
      FROM base
    ),
    corpus AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
      FROM base
      UNION ALL SELECT * FROM noisy
    )
    SELECT a.vec_id AS kept_id, b.vec_id AS dropped_id, a.label,
           ROUND(list_reduce(list_transform(range(1, len(a.embedding) + 1),
                   i -> a.embedding[i] * b.embedding[i]), (x, y) -> x + y)
                 / (sqrt(list_reduce(list_transform(range(1, len(a.embedding) + 1),
                      i -> a.embedding[i] * a.embedding[i]), (x, y) -> x + y))
                  * sqrt(list_reduce(list_transform(range(1, len(b.embedding) + 1),
                      i -> b.embedding[i] * b.embedding[i]), (x, y) -> x + y))),
                 6) AS cosine_sim
    FROM corpus a JOIN corpus b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_reduce(list_transform(range(1, len(a.embedding) + 1),
            i -> a.embedding[i] * b.embedding[i]), (x, y) -> x + y)
          / (sqrt(list_reduce(list_transform(range(1, len(a.embedding) + 1),
               i -> a.embedding[i] * a.embedding[i]), (x, y) -> x + y))
           * sqrt(list_reduce(list_transform(range(1, len(b.embedding) + 1),
               i -> b.embedding[i] * b.embedding[i]), (x, y) -> x + y)))
          >= 0.999
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate detection (SURVEY §2C).

    The fixture has no natural near-dups (max within-label cosine ≈ 0.47),
    so the query plants them deterministically: each vec_id < 200 gets a
    1.5×-scaled replica (cosine-invariant → similarity exactly 1.0), and
    the detector must recover exactly those pairs at threshold 0.999.

    Scale shape: candidate pairs are *blocked by label* (in production: by
    an LSH bucket or IVF cell) so the self-join is per-block, never
    all-pairs over the corpus; the kept/dropped convention (keep the lower
    id) is the usual canonical-representative rule.
    """
    from rtdl_spark.functions.vectors import cosine, to_double

    base = (
        table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 200)
        .select("vec_id", "label", to_double("embedding").alias("embedding"))
    )
    noisy = base.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        "label",
        F.transform("embedding", lambda x: x * F.lit(1.5)).alias("embedding"),
    )
    corpus = base.unionByName(noisy)
    a = corpus.select(
        F.col("vec_id").alias("kept_id"), "label", F.col("embedding").alias("v1")
    )
    b = corpus.select(
        F.col("vec_id").alias("dropped_id"),
        F.col("label").alias("label2"),
        F.col("embedding").alias("v2"),
    )
    return (
        a.join(b, (a.label == b.label2) & (F.col("kept_id") < F.col("dropped_id")))
        .withColumn("sim", cosine(F.col("v1"), F.col("v2")))
        .filter(F.col("sim") >= 0.999)
        .select(
            "kept_id", "dropped_id", "label", F.round("sim", 6).alias("cosine_sim")
        )
    )


# DuckDB twin of functions.text.winnow_fingerprints (k=4 word-grams,
# w=5 windows, same polynomial hash as _LSH_CTE).
_WINNOW_CTE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS wds FROM documents
), kg AS (
  SELECT doc_id, CASE WHEN len(wds) >= 4 THEN
      list_transform(range(1, len(wds) - 2),
        i -> array_to_string(wds[i:i+3], ' '))
    ELSE [] END AS gs
  FROM toks
), hh AS (
  SELECT doc_id, list_transform(gs, s ->
      list_reduce(list_transform(string_split(s, ''),
                                 c -> ascii(c)::BIGINT),
                  (h, c) -> (h * 31 + c) % {HASH_P})) AS hs
  FROM kg
), fp AS (
  SELECT doc_id, CASE WHEN len(hs) = 0 THEN CAST([] AS BIGINT[])
    ELSE list_sort(list_distinct(list_transform(
           range(1, greatest(len(hs) - 4, 1) + 1),
           i -> list_min(hs[i:i+4])))) END AS fps
  FROM hh
)
"""


@query(
    "text_winnow_profile",
    oracle=_WINNOW_CTE
    + """
    SELECT doc_id, len(fps) AS n_fps,
           md5(array_to_string(fps, ',')) AS fp_sig
    FROM fp
    """,
)
def text_winnow_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (rolling-hash) fingerprint profile per document
    (functions/text.py::winnow_fingerprints — the MOSS k-gram/window-min
    scheme): fingerprint count + an md5 signature of the sorted set, so
    the oracle pins every fingerprint value without hauling the arrays
    through the comparison."""
    from rtdl_spark.functions.text import winnow_fingerprints

    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(winnow_fingerprints(F.col("text"), 4, 5)).alias("n_fps"),
        F.md5(
            F.concat_ws(",", winnow_fingerprints(F.col("text"), 4, 5))
        ).alias("fp_sig"),
    )


@query(
    "dedup_winnow_overlap_pairs",
    oracle=_WINNOW_CTE
    + """
    , ex AS (SELECT doc_id, UNNEST(fps) AS fp FROM fp)
    SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS shared_fps
    FROM ex a JOIN ex b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING COUNT(*) >= 5
    """,
)
def dedup_winnow_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-overlap detection via shared winnowing fingerprints: any
    k+w-1-token run shared by two documents yields an identical
    fingerprint in both, so documents sharing >= 5 fingerprints share
    substantial text even when globally dissimilar (the case whole-doc
    fingerprints and full-set Jaccard both miss). Candidates come from a
    fingerprint equi-join on (doc_id, fp) longs — same narrow-shuffle
    discipline as the MinHash candidate join."""
    from rtdl_spark.functions.text import winnow_fingerprints

    d = table(spark, sf_dir, "documents")
    n_parts = max(spark.sparkContext.defaultParallelism, 8)
    fps = d.repartition(n_parts, F.col("doc_id")).select(
        "doc_id",
        F.explode(winnow_fingerprints(F.col("text"), 4, 5)).alias("fp"),
    )
    a = fps.select(F.col("doc_id").alias("id1"), "fp")
    b = fps.select(F.col("doc_id").alias("id2"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= 5)
    )


# Recursive min-label reachability is the SQL-expressible twin of the
# large-star/small-star iteration: over a symmetric edge set, the set
# of nodes reaching v IS v's component, so MIN over it is the same
# canonical id the Spark operator converges to. Shared by the full
# clustering query and the incremental-merge query (whose defining
# property is equality with this full recomputation).
_CC_ORACLE = _LSH_CTE.replace("WITH ", "WITH RECURSIVE ", 1) + """
    , pairs AS (
      SELECT id1, id2 FROM cand
      WHERE ROUND(len(list_intersect(sh1, sh2)) * 1.0
                  / len(list_distinct(list_concat(sh1, sh2))), 6) >= 0.5
    ), sym AS (
      SELECT id1 AS src, id2 AS dst FROM pairs
      UNION
      SELECT id2 AS src, id1 AS dst FROM pairs
    ), walk(node, comp) AS (
      SELECT src, src FROM sym
      UNION
      SELECT s.dst, w.comp FROM walk w JOIN sym s ON s.src = w.node
    ), assign AS (
      SELECT node, MIN(comp) AS canonical_id FROM walk GROUP BY node
    )
    SELECT node AS doc_id, canonical_id,
           COUNT(*) OVER (PARTITION BY canonical_id) AS cluster_size
    FROM assign
    """


@query("dedup_cluster_assignment", oracle=_CC_ORACLE)
def dedup_cluster_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup PAIRS → duplicate CLUSTERS: MinHash+LSH edges resolved by
    distributed connected components (operators/components.py, large-star/
    small-star) into (doc_id, canonical_id, cluster_size). This is the
    delete list a production dedup actually executes — pairwise keep-one
    under-deletes on any chain A~B~C (see module docstring there)."""
    from pyspark.sql import Window

    from rtdl_spark.operators.components import connected_components

    pairs = minhash_lsh_pairs(
        table(spark, sf_dir, "documents"), "doc_id", "text", 3, 0.5
    )
    cc = connected_components(pairs, "id1", "id2")
    return cc.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("canonical_id"),
    ).withColumn(
        "cluster_size",
        F.count(F.lit(1)).over(Window.partitionBy("canonical_id")),
    )


@query("dedup_incremental_clusters", oracle=_CC_ORACLE)
def dedup_incremental_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental cluster maintenance (operators/components.py::
    incremental_components): the even-doc subgraph's clustering plays the
    historical assignment; pairs touching odd docs play the new batch's
    edges. Merging stars + new edges must reproduce the FULL
    recomputation bit-for-bit — the defining equivalence, checked by
    sharing the full recompute's oracle."""
    from pyspark.sql import Window

    from rtdl_spark.operators.components import (
        connected_components,
        incremental_components,
    )

    pairs = minhash_lsh_pairs(
        table(spark, sf_dir, "documents"), "doc_id", "text", 3, 0.5
    ).localCheckpoint()  # reused thrice below; avoid re-mining
    even = (F.col("id1") % 2 == 0) & (F.col("id2") % 2 == 0)
    assignment = connected_components(pairs.filter(even), "id1", "id2")
    out = incremental_components(assignment, pairs.filter(~even))
    return out.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("canonical_id"),
    ).withColumn(
        "cluster_size",
        F.count(F.lit(1)).over(Window.partitionBy("canonical_id")),
    )


_FP_SQL = (
    "md5(array_to_string(list_sort(list_distinct(string_split(text, ' ')))"
    ", ' '))"
)


@query(
    "dedup_incremental_against_corpus",
    oracle=f"""
    SELECT n.doc_id, n.source, n.lang
    FROM documents n
    WHERE n.doc_id % 2 = 1
      AND {_FP_SQL} NOT IN (
        SELECT {_FP_SQL} FROM documents WHERE doc_id % 2 = 0
      )
    """,
)
def dedup_incremental_against_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (batch-vs-history) dedup, the recurring-crawl shape:
    odd doc_ids play the new batch, even ones the accumulated corpus; a
    new doc survives only if its token-set fingerprint is unseen. The
    engine runs it as an anti join on the fingerprint key
    (operators/dedup.py::dedup_against_corpus)."""
    from rtdl_spark.operators.dedup import dedup_against_corpus

    d = table(spark, sf_dir, "documents")
    new = d.filter(F.col("doc_id") % 2 == 1)
    corpus = d.filter(F.col("doc_id") % 2 == 0)
    return dedup_against_corpus(new, corpus, method="fingerprint").select(
        "doc_id", "source", "lang"
    )


@query(
    "dedup_span_exact",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), spans AS (
      SELECT doc_id, CAST(i AS INT) AS span_idx,
             array_to_string(toks[CAST(i*16+1 AS INT) : CAST(i*16+16 AS INT)],
                             ' ') AS span
      FROM t, LATERAL (
        SELECT UNNEST(range(GREATEST(CAST(ceil(len(toks)/16.0) AS BIGINT),
                                     1))) AS i
      )
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY span
                                   ORDER BY doc_id, span_idx) AS rn
      FROM spans
    ), kept AS (
      SELECT doc_id, span_idx, span FROM ranked WHERE rn = 1
    ), rebuilt AS (
      SELECT doc_id,
             string_agg(span, ' ' ORDER BY span_idx) AS clean_text,
             COUNT(*) AS n_kept
      FROM kept GROUP BY doc_id
    ), totals AS (
      SELECT doc_id, COUNT(*) AS n_spans FROM spans GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(r.clean_text, '') AS clean_text,
           COALESCE(t2.n_spans, 0) AS n_spans,
           COALESCE(r.n_kept, 0) AS n_kept
    FROM documents d
    LEFT JOIN totals t2 USING (doc_id)
    LEFT JOIN rebuilt r USING (doc_id)
    """,
)
def dedup_span_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style exact span dedup (operators/dedup.py::span_dedup): every
    16-word span that occurs more than once corpus-wide survives only at
    its first occurrence (lowest doc_id, then span position); documents
    are rebuilt from their surviving spans. The oracle re-runs the whole
    algorithm — span windows, global first-occurrence rule, reassembly —
    in DuckDB SQL."""
    from rtdl_spark.operators.dedup import span_dedup

    d = table(spark, sf_dir, "documents")
    return span_dedup(d, span_words=16)


@query(
    "dedup_fuzzy_source_pairs",
    oracle="""
    SELECT a.doc_id AS id1, b.doc_id AS id2,
           levenshtein(a.source, b.source) AS dist
    FROM documents a
    JOIN documents b
      ON a.lang = b.lang AND a.doc_id < b.doc_id
     AND abs(length(a.source) - length(b.source)) <= 1
    WHERE levenshtein(a.source, b.source) <= 1
      AND a.doc_id < 150 AND b.doc_id < 150
    """,
)
def dedup_fuzzy_source_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein fuzzy matching (operators/dedup.py::fuzzy_pairs) over
    source identifiers, blocked by language: the entity-resolution shape
    (same-block hash join + length band prune the quadratic; the O(len²)
    DP runs only on survivors). Oracle re-runs the identical blocking and
    distance rule with DuckDB's levenshtein."""
    from rtdl_spark.operators.dedup import fuzzy_pairs

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    return fuzzy_pairs(
        d, id_col="doc_id", text_col="source", max_dist=1, block_col="lang"
    )


@query(
    "dedup_incremental_bloom",
    oracle=f"""
    SELECT n.doc_id, n.source, n.lang
    FROM documents n
    WHERE n.doc_id % 2 = 1
      AND {_FP_SQL} NOT IN (
        SELECT {_FP_SQL} FROM documents WHERE doc_id % 2 = 0
      )
    """,
)
def dedup_incremental_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bloom-prefiltered incremental dedup (operators/dedup.py
    method="bloom"): corpus keys collapse to a broadcastable bitmap-words
    table; batch rows missing the filter skip the anti-join entirely (no
    false negatives), only filter hits pay exact confirmation. Output is
    REQUIRED identical to the plain anti-join — same oracle as
    dedup_incremental_against_corpus proves the prefilter is lossless."""
    from rtdl_spark.operators.dedup import dedup_against_corpus

    d = table(spark, sf_dir, "documents")
    new = d.filter(F.col("doc_id") % 2 == 1)
    corpus = d.filter(F.col("doc_id") % 2 == 0)
    return dedup_against_corpus(new, corpus, method="bloom").select(
        "doc_id", "source", "lang"
    )


@query(
    "dedup_source_overlap_matrix",
    oracle="""
    WITH g AS (
      SELECT md5(array_to_string(
               list_sort(list_distinct(string_split(text, ' '))), ' ')) AS k,
             doc_id, source
      FROM documents
    ), p AS (
      SELECT least(a.source, b.source) AS attr_a,
             greatest(a.source, b.source) AS attr_b
      FROM g a JOIN g b ON a.k = b.k AND a.doc_id < b.doc_id
    )
    SELECT attr_a, attr_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM p GROUP BY attr_a, attr_b
    """,
)
def dedup_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplicate attribution
    (operators/dedup.py::overlap_matrix): fingerprint-identical document
    pairs counted per unordered source pair — the data-card answering
    'which sources mirror each other'. One hash shuffle on the
    fingerprint key; the matrix itself is at most |sources|² rows."""
    from rtdl_spark.operators.dedup import overlap_matrix

    d = table(spark, sf_dir, "documents")
    return overlap_matrix(d, fingerprint("text"), "doc_id", "source")


@query(
    "dedup_survivorship_policy",
    oracle="""
    WITH g AS (
      SELECT doc_id, n_chars,
             md5(array_to_string(
               list_sort(list_distinct(string_split(text, ' '))), ' ')) AS k
      FROM documents
    )
    SELECT doc_id, n_chars,
           ROW_NUMBER() OVER (
             PARTITION BY k ORDER BY n_chars DESC, doc_id) = 1 AS is_keeper
    FROM g
    """,
)
def dedup_survivorship_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-best survivorship (operators/dedup.py::dedup_keep_best):
    within each fingerprint duplicate group the LONGEST document wins
    (ties → lowest id) — the RefinedWeb-style rule for when one copy is
    truncated, versus the min-id canonical used elsewhere. One window
    shuffle on the fingerprint key."""
    from rtdl_spark.operators.dedup import dedup_keep_best

    d = table(spark, sf_dir, "documents").select("doc_id", "n_chars", "text")
    out = dedup_keep_best(d, fingerprint("text"), "doc_id", "n_chars")
    return out.select("doc_id", "n_chars", "is_keeper")


@query(
    "graph_triangle_count",
    oracle="""
    WITH g AS (
      SELECT doc_id,
             md5(array_to_string(
               list_sort(list_distinct(string_split(text, ' '))), ' ')) AS k
      FROM documents
    ), e AS (
      SELECT DISTINCT least(a.doc_id, b.doc_id) AS a,
                      greatest(a.doc_id, b.doc_id) AS b
      FROM g x JOIN g a ON x.k = a.k JOIN g b ON x.k = b.k
      WHERE a.doc_id < b.doc_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM e e1
    JOIN e e2 ON e2.a = e1.b
    JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting (operators/graph.py::triangle_count) over the
    fingerprint-duplicate graph — identical-doc groups form cliques, so
    the count is a structural audit of duplication density. The operator
    orients every edge low-degree→high-degree (acyclic; each triangle
    counted at its unique 2-out-edge pivot), bounding the wedge join at
    O(E^1.5) where a naive neighbor self-join is quadratic in hub
    degree. Oracle: direct a<b<c three-way edge join."""
    from rtdl_spark.operators.graph import triangle_count

    d = table(spark, sf_dir, "documents")
    keyed = d.select("doc_id", fingerprint("text").alias("k"))
    a, b = keyed.alias("a"), keyed.alias("b")
    edges = a.join(
        b, (F.col("a.k") == F.col("b.k")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    ).select(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
    return triangle_count(edges)


@query(
    "graph_clustering_coefficients",
    oracle="""
    WITH g AS (
      SELECT doc_id,
             md5(array_to_string(
               list_sort(list_distinct(string_split(text, ' '))), ' ')) AS k
      FROM documents
    ), e AS (
      SELECT DISTINCT least(a.doc_id, b.doc_id) AS a,
                      greatest(a.doc_id, b.doc_id) AS b
      FROM g x JOIN g a ON x.k = a.k JOIN g b ON x.k = b.k
      WHERE a.doc_id < b.doc_id
    ), deg AS (
      SELECT n, COUNT(*) AS degree FROM (
        SELECT a AS n FROM e UNION ALL SELECT b AS n FROM e
      ) GROUP BY n
    ), tri AS (
      SELECT e1.a AS n1, e1.b AS n2, e2.b AS n3
      FROM e e1 JOIN e e2 ON e2.a = e1.b
                JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ), per_node AS (
      SELECT n, COUNT(*) AS n_triangles FROM (
        SELECT n1 AS n FROM tri UNION ALL SELECT n2 FROM tri
        UNION ALL SELECT n3 FROM tri
      ) GROUP BY n
    )
    SELECT deg.n AS node, CAST(deg.degree AS BIGINT) AS degree,
           CAST(COALESCE(per_node.n_triangles, 0) AS BIGINT) AS n_triangles,
           CASE WHEN deg.degree >= 2
                THEN COALESCE(per_node.n_triangles, 0) * 2.0
                     / (deg.degree * (deg.degree - 1))
                ELSE 0.0 END AS coefficient
    FROM deg LEFT JOIN per_node ON deg.n = per_node.n
    """,
)
def graph_clustering_coefficients(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node clustering coefficients
    (operators/graph.py::clustering_coefficients) over the fingerprint
    duplicate graph: inside identical-doc cliques the coefficient is
    1.0, so deviations expose partial/bridging duplication. Each closed
    wedge credits its three corners via one explode — no extra join
    passes; coefficient = 2·triangles / (deg·(deg−1)) is exact rational
    arithmetic in identical operand order on both engines."""
    from rtdl_spark.operators.graph import clustering_coefficients

    d = table(spark, sf_dir, "documents")
    keyed = d.select("doc_id", fingerprint("text").alias("k"))
    a, b = keyed.alias("a"), keyed.alias("b")
    edges = a.join(
        b, (F.col("a.k") == F.col("b.k")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    ).select(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
    return clustering_coefficients(edges)


@query(
    "graph_kcore_docs",
    oracle="""
    WITH g AS (
      SELECT doc_id,
             md5(array_to_string(
               list_sort(list_distinct(string_split(text, ' '))), ' ')) AS k
      FROM documents
    ), sizes AS (
      SELECT k, COUNT(*) AS s FROM g GROUP BY k
    )
    SELECT g.doc_id AS node, CAST(sizes.s - 1 AS BIGINT) AS degree
    FROM g JOIN sizes USING (k)
    WHERE sizes.s - 1 >= 2
    """,
)
def graph_kcore_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the fingerprint-duplicate graph
    (operators/graph.py::k_core): iterative peeling keeps only nodes
    that retain >= 2 duplicate-neighbors — the dense template/boilerplate
    kernel, invisible to any pairwise threshold. On this graph every
    fingerprint group is a clique, so the oracle is closed-form (a
    clique of size s survives iff s-1 >= k, with within-core degree
    s-1); the general cascading behavior is pinned by the peeling
    property test against brute force."""
    from rtdl_spark.operators.graph import k_core

    d = table(spark, sf_dir, "documents")
    keyed = d.select("doc_id", fingerprint("text").alias("k"))
    a, b = keyed.alias("a"), keyed.alias("b")
    edges = a.join(
        b,
        (F.col("a.k") == F.col("b.k"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
    return k_core(edges, k=2)


@query(
    "dedup_er_pipeline",
    oracle="""
    WITH RECURSIVE base AS (
      SELECT doc_id, source, lang, n_chars FROM documents WHERE doc_id < 150
    ), pairs AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2
      FROM base a JOIN base b
        ON a.lang = b.lang AND a.doc_id < b.doc_id
       AND abs(length(a.source) - length(b.source)) <= 1
      WHERE levenshtein(a.source, b.source) <= 1
    ), sym AS (
      SELECT id1 AS src, id2 AS dst FROM pairs
      UNION
      SELECT id2 AS src, id1 AS dst FROM pairs
    ), walk(node, comp) AS (
      SELECT src, src FROM sym
      UNION
      SELECT s.dst, w.comp FROM walk w JOIN sym s ON s.src = w.node
    ), assign AS (
      SELECT node, MIN(comp) AS canonical_id FROM walk GROUP BY node
    ), everyone AS (
      SELECT b.doc_id, COALESCE(a.canonical_id, b.doc_id) AS canonical_id,
             b.n_chars
      FROM base b LEFT JOIN assign a ON a.node = b.doc_id
    ), surv AS (
      SELECT canonical_id, doc_id AS survivor_id
      FROM everyone
      QUALIFY ROW_NUMBER() OVER (PARTITION BY canonical_id
                                 ORDER BY n_chars DESC, doc_id) = 1
    )
    SELECT e.doc_id, e.canonical_id, s.survivor_id,
           COUNT(*) OVER (PARTITION BY e.canonical_id) AS cluster_size
    FROM everyone e JOIN surv s USING (canonical_id)
    """,
)
def dedup_er_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END entity resolution: block (lang) → candidate pairs
    (length band) → verify (Levenshtein DP on survivors only) → cluster
    (connected components, so A~B~C chains resolve together) → survivor
    election (longest copy, ties to lowest id) — every stage the
    distributed operator, composed; singletons become their own cluster.
    The oracle replays blocking, distance, a recursive-CTE closure and
    the survivorship window in SQL. Scale: the quadratic dies at the
    blocking/band prune, CC is O(log² n) rounds on the pair set, the
    election is one window over the (clusters-sized) assignment."""
    from pyspark.sql import Window

    from rtdl_spark.operators.components import connected_components
    from rtdl_spark.operators.dedup import fuzzy_pairs

    base = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 150)
        .select("doc_id", "source", "lang", "n_chars")
    )
    pairs = fuzzy_pairs(
        base, id_col="doc_id", text_col="source", max_dist=1,
        block_col="lang",
    )
    cc = connected_components(pairs, "id1", "id2")
    everyone = (
        base.join(
            cc.select(
                F.col("node").alias("doc_id"),
                F.col("component").alias("_comp"),
            ),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce("_comp", "doc_id").alias("canonical_id"),
            "n_chars",
        )
    )
    w = Window.partitionBy("canonical_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    surv = (
        everyone.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("canonical_id", F.col("doc_id").alias("survivor_id"))
    )
    return (
        everyone.join(surv, "canonical_id")
        .withColumn(
            "cluster_size",
            F.count(F.lit(1)).over(Window.partitionBy("canonical_id")),
        )
        .select("doc_id", "canonical_id", "survivor_id", "cluster_size")
    )


@query(
    "dedup_weighted_keepers",
    oracle="""
    WITH g AS (
      SELECT doc_id, lang, n_chars,
             md5(array_to_string(
               list_sort(list_distinct(string_split(text, ' '))), ' ')) AS k
      FROM documents
    )
    SELECT doc_id, lang, n_chars,
           COUNT(*) OVER (PARTITION BY k) AS repeat_count
    FROM g
    QUALIFY ROW_NUMBER() OVER (PARTITION BY k ORDER BY doc_id) = 1
    """,
)
def dedup_weighted_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-WEIGHTED dedup: one keeper per fingerprint group plus a
    repeat_count column — instead of silently deleting duplicates, the
    training pipeline keeps the count as a loss/sampling weight (a
    document seen 40 times on the web arguably matters more than one
    seen once; plain dedup erases that signal, up-weighting preserves it
    without the redundancy). One window shuffle on the fingerprint; same
    plan as keep-first dedup, one extra column."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    g = d.select(
        "doc_id", "lang", "n_chars", fingerprint("text").alias("k")
    )
    wcnt = Window.partitionBy("k")
    wrk = Window.partitionBy("k").orderBy("doc_id")
    return (
        g.withColumn("repeat_count", F.count(F.lit(1)).over(wcnt))
        .withColumn("_rk", F.row_number().over(wrk))
        .filter(F.col("_rk") == 1)
        .select("doc_id", "lang", "n_chars", "repeat_count")
    )
