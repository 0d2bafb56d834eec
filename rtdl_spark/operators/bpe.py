"""Iterative merge-rule training over a corpus — the BPE/word2phrase
training loop, Spark-first.

Classic BPE learns a vocabulary by repeatedly fusing the most frequent
adjacent pair; word2phrase does the same at word level to mine
collocations ("new", "york" → "new_york"). The loop structure is what
matters for a 100 TB corpus and is identical for both granularities:

  per round: count adjacent pairs (explode → ONE map-combinable hash
  aggregate — the only shuffle), take the argmax (one tiny collect:
  count desc, then lexicographic pair for determinism), append the rule,
  rewrite the corpus by applying it.

Distribution of work: counting is pure Catalyst; the rewrite is an
Arrow-batched pandas kernel (a sequential leftmost-first scan per
document — genuinely order-dependent, the documented case for Python;
each doc is independent, so the kernel pipelines per batch with zero
shuffle). The driver holds only the merge table (k rows).

Lineage across rounds: each round's corpus derives from the last; we cut
lineage by re-deriving from the ORIGINAL corpus + all rules so far
(apply_merges is one pass over the raw tokens applying k rules in
priority order — the standard tokenizer-apply semantics). That keeps the
plan depth constant per round with no checkpoints pinned in memory
(components.py's hard-won localCheckpoint lesson).

Determinism: ties in pair counts break lexicographically; rule
application is leftmost-first, non-overlapping, rules in training order
per scan position (exactly how BPE tokenizers apply merges) — so
training and application are bit-reproducible everywhere, pinned by a
pure-Python parity test.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rtdl_spark.functions.localdf import local_df

SEP = "\x1e"  # fuse marker: merged pair "a<SEP>b" is one token


def apply_merges_py(tokens: list[str], merges: list[tuple[str, str]]) -> list[str]:
    """Reference/kernel implementation: apply rules in training order;
    each rule does one leftmost-first non-overlapping pass."""
    for a, b in merges:
        out: list[str] = []
        i = 0
        while i < len(tokens):
            if i + 1 < len(tokens) and tokens[i] == a and tokens[i + 1] == b:
                out.append(a + SEP + b)
                i += 2
            else:
                out.append(tokens[i])
                i += 1
        tokens = out
    return tokens


def _apply_merges_df(
    docs: DataFrame, text_col: str, merges: list[tuple[str, str]]
) -> DataFrame:
    """tokens column from text with all merge rules applied (Arrow-batched)."""
    toks = F.split(F.col(text_col), " ")
    if not merges:
        return docs.withColumn("tokens", toks)
    rules = list(merges)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["tokens"] = [
                apply_merges_py([t for t in (txt or "").split(" ") if t != ""], rules)
                for txt in pdf[text_col]
            ]
            yield pdf

    schema = docs.withColumn("tokens", toks).schema
    return docs.mapInPandas(kernel, schema)


def train_phrase_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    min_count: int = 2,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``n_merges`` pair-merge rules; returns (rules, stats_df).

    stats_df: one row per learned rule — (merge_idx, left, right, n) with
    n = the pair's corpus frequency when it was chosen. Training stops
    early when no pair reaches ``min_count``.
    """
    rules: list[tuple[str, str]] = []
    stats: list[tuple[int, str, str, int]] = []
    for k in range(n_merges):
        with_tokens = _apply_merges_df(docs, text_col, rules)
        t = F.col("tokens")
        pairs = with_tokens.select(
            F.explode(
                F.when(
                    F.size(t) >= 2,
                    F.transform(
                        F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))),
                        lambda x, i: F.struct(
                            x.alias("a"), F.element_at(t, i + 2).alias("b")
                        ),
                    ),
                ).otherwise(F.array())
            ).alias("p")
        )
        top = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < min_count:
            break
        a, b, n = top[0]["a"], top[0]["b"], top[0]["n"]
        rules.append((a, b))
        stats.append((k, a, b, n))
    stats_df = local_df(docs.sparkSession, 
        stats, "merge_idx int, left string, right string, n long"
    )
    return rules, stats_df


# ---------------------------------------------------------------------------
# Character-level BPE with a PURE-CATALYST merge fold (round 6).
#
# train_phrase_merges above mines word-level collocations with an
# Arrow-batched pandas kernel; the functions below are the char-level
# tokenizer-training variant designed for EXACT SQL replay: the merge
# application is a Catalyst ``F.aggregate`` fold (no Python at all), the
# argmax is totally ordered, and counts are integer sums — so every
# training round unrolls into chained CTEs that DuckDB replays
# bit-for-bit (queries/bpe.py::text_bpe_train_merges, the
# pagerank/kmeans discipline). Scale shape: the corpus is scanned ONCE
# (word frequencies); rounds iterate over the vocabulary-sized word
# table with one shuffle (pair count) and one narrow fold each; the
# chosen pair is the only driver-side datum per round.
# ---------------------------------------------------------------------------


from pyspark.sql import SparkSession  # noqa: E402


def word_frequencies(
    df: DataFrame,
    text_col: str = "text",
    split_re: str = "[^a-z]+",
    min_len: int = 2,
    lowercase: bool = True,
) -> DataFrame:
    """(word, freq BIGINT) over the corpus — the single full scan.
    Words are the non-empty ``split_re`` splits of (lowercased) text,
    length >= min_len."""
    text = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    return (
        df.select(F.explode(F.split(text, split_re)).alias("word"))
        .filter(F.length("word") >= min_len)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def merge_pair_expr(syms, left: str, right: str):
    """Catalyst expression: apply ONE merge rule (left, right) to a
    symbol array with canonical leftmost-nonoverlapping semantics.

    Fold state: struct(out: emitted symbols, prev: the one look-behind
    symbol not yet emitted). Per element x:
    - no pending        -> hold x
    - pending==left and x==right -> emit left||right, clear pending
    - otherwise         -> emit pending, hold x
    finish: emit any pending."""
    merged = left + right
    init = F.struct(
        F.expr("array()").cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("prev"),
    )

    def step(acc, x):
        return (
            F.when(
                acc.prev.isNull(),
                F.struct(acc.out.alias("out"), x.alias("prev")),
            )
            .when(
                (acc.prev == F.lit(left)) & (x == F.lit(right)),
                F.struct(
                    F.concat(acc.out, F.array(F.lit(merged))).alias("out"),
                    F.lit(None).cast("string").alias("prev"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc.out, F.array(acc.prev)).alias("out"),
                    x.alias("prev"),
                )
            )
        )

    def finish(acc):
        return F.when(acc.prev.isNull(), acc.out).otherwise(
            F.concat(acc.out, F.array(acc.prev))
        )

    return F.aggregate(syms, init, step, finish)


def _adjacent_pairs(words: DataFrame) -> DataFrame:
    """(left, right, cnt) — adjacent symbol pairs weighted by word freq.
    zip-of-slices keeps this a narrow projection + one shuffle."""
    n = F.size("syms")
    pairs = words.select(
        "freq",
        F.explode(
            F.arrays_zip(
                F.slice("syms", 1, n - 1).alias("l"),
                F.slice("syms", 2, n - 1).alias("r"),
            )
        ).alias("p"),
    )
    return pairs.groupBy(
        F.col("p.l").alias("left"), F.col("p.r").alias("right")
    ).agg(F.sum("freq").alias("cnt"))


def bpe_train(
    spark: SparkSession,
    word_freqs: DataFrame,
    n_merges: int,
    min_pair_count: int = 2,
    checkpoint_every: int = 8,
) -> tuple[list[dict], DataFrame]:
    """Learn ``n_merges`` merge rules → ([{round, left, right, cnt}...],
    final (word, freq, syms) frame — i.e. every vocab word already
    encoded under the learned rules).

    Stops early when no pair reaches ``min_pair_count``. Each round
    collects exactly ONE row (the argmax pair); the vocab table never
    leaves the cluster."""
    words = word_freqs.select(
        "word", "freq", F.split("word", "").alias("syms")
    )
    prev_ckpt = None
    merges: list[dict] = []
    for i in range(n_merges):
        best = (
            _adjacent_pairs(words)
            .filter(F.col("cnt") >= min_pair_count)
            .orderBy(
                F.col("cnt").desc(), F.col("left").asc(), F.col("right").asc()
            )
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right, cnt = best[0]["left"], best[0]["right"], best[0]["cnt"]
        merges.append(
            {"round": i, "left": left, "right": right, "cnt": int(cnt)}
        )
        words = words.withColumn(
            "syms", merge_pair_expr(F.col("syms"), left, right)
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ck = words.localCheckpoint(eager=True)
            if prev_ckpt is not None:
                # release the prior generation's unevictable blocks
                try:
                    prev_ckpt._jdf.queryExecution().analyzed().rdd().unpersist(
                        True
                    )
                except Exception:
                    pass
            prev_ckpt, words = ck, ck
    return merges, words


def encode_words(words: DataFrame, merges: list[dict]) -> DataFrame:
    """Apply learned merge rules (in training order) to a (word, ...)
    frame → adds ``syms`` (token array) and ``n_tokens``. Pure Catalyst:
    one fold per rule, chained — no Python in the encode path."""
    out = words.withColumn("syms", F.split("word", ""))
    for m in merges:
        out = out.withColumn(
            "syms", merge_pair_expr(F.col("syms"), m["left"], m["right"])
        )
    return out.withColumn("n_tokens", F.size("syms"))


def bpe_encode_kernel(
    df: DataFrame,
    merges: list[dict],
    text_col: str = "text",
    split_re: str = "[^a-z]+",
    lowercase: bool = True,
) -> DataFrame:
    """Production-shaped BPE ENCODE over raw text: adds ``tokens``
    (array<string>) and ``n_tokens`` per row.

    ``encode_words`` chains one Catalyst fold per rule — exact and
    JVM-only, but k rules become k nested expressions: right for the
    oracle-verified small-k path, wrong for a 50k-merge production
    vocabulary. This kernel is the scale path: the merge table is a
    BROADCAST rule list and each Arrow batch is encoded by applying the
    rules IN TRAINING ORDER, one leftmost-nonoverlapping pass each —
    exactly the trainer's state semantics, so parity with
    ``encode_words`` holds by construction (pinned by test). Per-word
    results are memoized within a batch (natural corpora repeat words
    heavily). Documented divergence from HF-style inference encoding:
    tokenizers that repeatedly merge the lowest-RANK pair present can
    RE-apply an early rule whose pair only materializes after a later
    rule fires; an ordered sweep does not. The two agree except in that
    pathological rule interaction.
    """
    import re as _re

    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    rules = [(m["left"], m["right"]) for m in merges]
    word_re = _re.compile(split_re)

    def encode_word(word: str, cache: dict) -> list[str]:
        got = cache.get(word)
        if got is not None:
            return got
        syms = list(word)
        for a, b in rules:
            if len(syms) < 2:
                break
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == a
                    and syms[i + 1] == b
                ):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        cache[word] = syms
        return syms

    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("tokens", ArrayType(StringType())),
            StructField("n_tokens", IntegerType()),
        ]
    )

    def kernel(batches):
        import pandas as pd  # noqa: F401 (module-level in callers)

        cache: dict = {}
        for pdf in batches:
            toks = []
            for txt in pdf[text_col]:
                t = (txt or "")
                if lowercase:
                    t = t.lower()
                words = [w for w in word_re.split(t) if len(w) >= 2]
                enc: list[str] = []
                for w in words:
                    enc.extend(encode_word(w, cache))
                toks.append(enc)
            pdf = pdf.copy()
            pdf["tokens"] = toks
            pdf["n_tokens"] = [len(t) for t in toks]
            yield pdf

    return df.mapInPandas(kernel, out_schema)


def bpe_vocabulary(
    word_freqs: DataFrame, merges: list[dict]
) -> DataFrame:
    """The trained tokenizer's vocabulary as a frame: (token, token_id,
    kind). Base tokens are the corpus's single characters in
    lexicographic order (ids 0..), then one merged token per rule in
    TRAINING ORDER — the id layout every BPE tokenizer file
    (vocab.json) uses, deterministic and engine-replayable."""
    spark = word_freqs.sparkSession
    chars = (
        word_freqs.select(
            F.explode(F.split("word", "")).alias("token")
        )
        .distinct()
    )
    from pyspark.sql import Window

    base = chars.withColumn(
        "token_id",
        F.row_number().over(Window.orderBy("token")) - 1,
    ).withColumn("kind", F.lit("char"))
    n_base = base.count()
    merged = local_df(spark, 
        [
            (m["left"] + m["right"], n_base + m["round"], "merge")
            for m in merges
        ],
        "token string, token_id int, kind string",
    )
    return base.select(
        "token", F.col("token_id").cast("int").alias("token_id"), "kind"
    ).unionByName(merged)
