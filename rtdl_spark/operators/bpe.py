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
    stats_df = docs.sparkSession.createDataFrame(
        stats, "merge_idx int, left string, right string, n long"
    )
    return rules, stats_df
