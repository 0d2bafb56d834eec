"""BPE tokenizer-training queries (north-star §2C text lane): the
distributed merge-rule learner in operators/bpe.py, hash-verified
against a DuckDB oracle that UNROLLS every training round as chained
CTEs (the pagerank/kmeans exact-replay discipline).

Why this is oracle-able at all: each round is (a) an integer-weighted
pair count (exact on both engines, SUM cast to BIGINT per the HUGEINT
lesson), (b) a total-order argmax (count DESC, left ASC, right ASC —
no ties possible), and (c) the canonical leftmost-nonoverlapping merge
fold, which DuckDB replays exactly via ``list_reduce`` with a
string-encoded (done '|' pending) accumulator — the alphabet is [a-z],
so '|' and '.' are safe separators. Reference parity: rtdl has no
tokenizer (text SQL is delegated, SURVEY §2B); this is the §2C
extension behind LLM training-data token accounting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from rtdl_spark.catalog import table
from rtdl_spark.queries import query

N_ROUNDS = 8
MIN_PAIR = 2

_WORDS_CTE = """
w0 AS (
  SELECT word, COUNT(*) AS freq
  FROM (
    SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS word
    FROM documents
  )
  WHERE length(word) >= 2
  GROUP BY word
),
s0 AS (SELECT word, freq, string_split(word, '') AS syms FROM w0)
"""


def _round_ctes(r: int) -> str:
    """One training round: pair counts over s{r}, argmax best{r}, and
    the merged vocabulary s{r+1} (list_reduce fold; acc = done'|'pend,
    done '.'-joined)."""
    return f"""
p{r} AS (
  SELECT p[1] AS ml, p[2] AS mr, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM (
    SELECT freq, unnest(list_zip(syms, syms[2:])) AS p
    FROM s{r} WHERE len(syms) >= 2
  )
  WHERE p[2] IS NOT NULL
  GROUP BY 1, 2
),
best{r} AS (
  SELECT ml, mr, cnt FROM p{r} WHERE cnt >= {MIN_PAIR}
  ORDER BY cnt DESC, ml ASC, mr ASC LIMIT 1
),
s{r + 1} AS (
  SELECT word, freq,
    string_split(ltrim(
      CASE WHEN split_part(folded, '|', 2) = ''
           THEN split_part(folded, '|', 1)
           ELSE split_part(folded, '|', 1) || '.' ||
                split_part(folded, '|', 2)
      END, '.'), '.') AS syms
  FROM (
    SELECT word, freq,
      list_reduce(list_prepend('|', syms),
        (acc, x) -> CASE
          WHEN split_part(acc, '|', 2) = ''
            THEN split_part(acc, '|', 1) || '|' || x
          WHEN split_part(acc, '|', 2) = b.ml AND x = b.mr
            THEN split_part(acc, '|', 1) || '.' || b.ml || b.mr || '|'
          ELSE split_part(acc, '|', 1) || '.' ||
               split_part(acc, '|', 2) || '|' || x
        END) AS folded
    FROM s{r}, best{r} b
  )
)
"""


def _oracle_body() -> str:
    return "WITH " + ",".join(
        [_WORDS_CTE] + [_round_ctes(r) for r in range(N_ROUNDS)]
    )


_TRAIN_ORACLE = _oracle_body() + "\n" + " UNION ALL ".join(
    f"SELECT {r} AS round, ml AS merge_left, mr AS merge_right, cnt AS "
    f"pair_count FROM best{r}"
    for r in range(N_ROUNDS)
)

_VOCAB_ORACLE = _oracle_body() + f"""
SELECT word, CAST(freq AS BIGINT) AS freq,
       CAST(len(syms) AS INT) AS n_tokens,
       list_aggregate(syms, 'string_agg', '.') AS tokens
FROM s{N_ROUNDS}
ORDER BY freq DESC, word ASC
LIMIT 15
"""


def _word_freqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rtdl_spark.operators.bpe import word_frequencies

    return word_frequencies(
        table(spark, sf_dir, "documents"), split_re="[^a-z]+", min_len=2
    )


@query("text_bpe_train_merges", oracle=_TRAIN_ORACLE)
def text_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE training over the documents corpus: one word-freq
    scan, then 8 merge rounds of pair-count aggregation + argmax +
    Catalyst-fold merge application (operators/bpe.py::bpe_train). The
    oracle re-derives every round's chosen pair and weighted count in
    unrolled SQL — any divergence in counting, tie-break order or merge
    semantics flips a row."""
    from rtdl_spark.operators.bpe import bpe_train

    merges, _words = bpe_train(
        spark, _word_freqs(spark, sf_dir), N_ROUNDS, min_pair_count=MIN_PAIR
    )
    schema = StructType(
        [
            StructField("round", IntegerType()),
            StructField("merge_left", StringType()),
            StructField("merge_right", StringType()),
            StructField("pair_count", LongType()),
        ]
    )
    return spark.createDataFrame(
        [(m["round"], m["left"], m["right"], m["cnt"]) for m in merges],
        schema,
    )


@query("text_bpe_vocab_tokens", oracle=_VOCAB_ORACLE)
def text_bpe_vocab_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned tokenizer APPLIED: every vocab word encoded under the
    8 trained merge rules (operators/bpe.py::encode_words — one Catalyst
    fold per rule, no Python in the encode path), top 15 words by
    frequency with token counts and the tokenization itself."""
    from rtdl_spark.operators.bpe import bpe_train, encode_words

    wf = _word_freqs(spark, sf_dir)
    merges, _ = bpe_train(spark, wf, N_ROUNDS, min_pair_count=MIN_PAIR)
    enc = encode_words(wf, merges)
    return (
        enc.select(
            "word",
            F.col("freq").cast("long").alias("freq"),
            F.col("n_tokens").cast("int").alias("n_tokens"),
            F.array_join("syms", ".").alias("tokens"),
        )
        .orderBy(F.col("freq").desc(), F.col("word").asc())
        .limit(15)
    )


_DOC_TOKENS_ORACLE = _oracle_body() + f"""
, doc_words AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS word
  FROM documents
)
SELECT w.doc_id, CAST(SUM(len(s.syms)) AS INT) AS n_tokens
FROM doc_words w JOIN s{N_ROUNDS} s USING (word)
WHERE length(w.word) >= 2
GROUP BY w.doc_id
"""


@query("text_bpe_doc_tokens", oracle=_DOC_TOKENS_ORACLE)
def text_bpe_doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION encode path (operators/bpe.py::bpe_encode_kernel —
    broadcast rule list, Arrow-batched ordered-sweep encoding with
    per-word memoization) token-counts every document under the 8
    trained merges. The oracle re-derives each document's count as the
    sum of its words' round-8 vocabulary tokenizations — any kernel
    divergence from the trainer's state semantics flips counts."""
    from rtdl_spark.operators.bpe import bpe_encode_kernel, bpe_train

    merges, _ = bpe_train(
        spark, _word_freqs(spark, sf_dir), N_ROUNDS, min_pair_count=MIN_PAIR
    )
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    return bpe_encode_kernel(docs, merges).select(
        "doc_id", F.col("n_tokens").cast("int").alias("n_tokens")
    )


_VOCAB_ID_ORACLE = _oracle_body() + """
, chars AS (
  SELECT DISTINCT unnest(string_split(word, '')) AS token FROM w0
), base AS (
  SELECT token, CAST(ROW_NUMBER() OVER (ORDER BY token) - 1 AS INT)
           AS token_id,
         'char' AS kind
  FROM chars
), merged AS (
  SELECT token, CAST((SELECT COUNT(*) FROM chars) + rnd AS INT)
           AS token_id,
         'merge' AS kind
  FROM (
""" + " UNION ALL ".join(
    f"SELECT ml || mr AS token, {r} AS rnd FROM best{r}"
    for r in range(N_ROUNDS)
) + """
  )
)
SELECT token, token_id, kind FROM base
UNION ALL SELECT token, token_id, kind FROM merged
"""


@query("text_bpe_vocabulary", oracle=_VOCAB_ID_ORACLE)
def text_bpe_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained tokenizer's exportable vocabulary
    (operators/bpe.py::bpe_vocabulary): corpus characters get ids in
    lexicographic order, merged tokens follow in training order — the
    vocab.json id layout, hash-verified against the unrolled training
    oracle's chosen pairs."""
    from rtdl_spark.operators.bpe import bpe_train, bpe_vocabulary

    wf = _word_freqs(spark, sf_dir)
    merges, _ = bpe_train(spark, wf, N_ROUNDS, min_pair_count=MIN_PAIR)
    return bpe_vocabulary(wf, merges)
