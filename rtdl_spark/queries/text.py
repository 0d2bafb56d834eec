"""Text-analysis queries (north-star extension, SURVEY.md §2C) over the
``documents`` fixture: token counting, quality scoring, language-ID
heuristics, fingerprint profiles, n-gram frequency.

All pure Catalyst HOF compositions (functions.text) — no Python UDFs.
Ratios are exact rational arithmetic surfaced as double (identical operand
order on both engines), with ROUND only where aggregation order matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rtdl_spark.catalog import table
from rtdl_spark.queries._util import local_result
from rtdl_spark.functions.text import (
    HASH_P,
    avg_token_len,
    distinct_token_ratio,
    stopword_ratio,
    token_count,
    tokens,
)
from rtdl_spark.queries import query


@query(
    "text_token_stats_by_lang",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           MIN(len(string_split(text, ' '))) AS min_tokens,
           MAX(len(string_split(text, ' '))) AS max_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY lang
    """,
)
def text_token_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    n = token_count("text")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n).alias("total_tokens"),
        F.min(n).alias("min_tokens"),
        F.max(n).alias("max_tokens"),
        F.sum("n_chars").alias("total_chars"),
    )


@query(
    "text_quality_scores",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_distinct(string_split(text, ' '))) AS n_distinct,
             len(list_filter(string_split(text, ' '),
                             x -> x IN ('the', 'a'))) AS n_stop,
             length(text) AS n_len
      FROM documents
    )
    SELECT doc_id, n_tokens,
           CAST(n_distinct AS DOUBLE) / n_tokens AS distinct_ratio,
           CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
           CAST(n_len - (n_tokens - 1) AS DOUBLE) / n_tokens AS avg_token_len
    FROM t
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality signals: lexical diversity, stopword density,
    mean token length — the standard cheap quality filters for a training
    corpus, computed without leaving codegen."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        distinct_token_ratio("text").alias("distinct_ratio"),
        stopword_ratio("text").alias("stopword_ratio"),
        avg_token_len("text").alias("avg_token_len"),
    )


@query(
    "text_quality_filter_summary",
    oracle="""
    WITH t AS (
      SELECT source,
             len(string_split(text, ' ')) AS n_tokens,
             CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / len(string_split(text, ' ')) AS distinct_ratio
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN n_tokens BETWEEN 20 AND 400
                          AND distinct_ratio >= 0.15
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM t GROUP BY source
    """,
)
def text_quality_filter_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The filter stage a data pipeline would actually run: keep docs in a
    token-length band with enough lexical diversity; report keep-rates."""
    d = table(spark, sf_dir, "documents")
    n = token_count("text")
    keep = (
        n.between(20, 400) & (distinct_token_ratio("text") >= 0.15)
    )
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(keep.cast("int")).cast("long").alias("n_kept"),
    )


@query(
    "text_lang_id_heuristic",
    oracle="""
    WITH t AS (
      SELECT lang,
             CASE WHEN len(list_filter(string_split(text, ' '),
                                       x -> x IN ('the', 'a'))) * 1.0
                       / len(string_split(text, ' ')) >= 0.08
                  THEN 'en_like' ELSE 'other' END AS predicted
      FROM documents
    )
    SELECT lang, predicted, COUNT(*) AS n
    FROM t GROUP BY lang, predicted
    """,
)
def text_lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-density language-ID heuristic (confusion-matrix shape).
    The fixture's text is synthetic so accuracy is meaningless; the plan —
    per-doc scoring then a two-key aggregate — is the real deliverable."""
    d = table(spark, sf_dir, "documents")
    predicted = F.when(
        stopword_ratio("text") >= 0.08, "en_like"
    ).otherwise("other")
    return d.groupBy("lang", predicted.alias("predicted")).agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "text_top_bigrams",
    oracle="""
    WITH t AS (
      SELECT string_split(text, ' ') AS w FROM documents
    ), grams AS (
      SELECT UNNEST(list_transform(range(1, len(w)),
                                   i -> w[i] || ' ' || w[i+1])) AS bigram
      FROM t WHERE len(w) >= 2
    )
    SELECT bigram, COUNT(*) AS n
    FROM grams
    GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 20
    """,
)
def text_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level n-gram frequency: per-doc gram generation (HOF) →
    explode → hash aggregate → top-k. The explode feeds partial aggregation
    before the shuffle, so gram cardinality, not token volume, crosses the
    wire."""
    d = table(spark, sf_dir, "documents")
    toks = tokens("text")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 2),
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)
        ),
    )
    return (
        d.filter(F.size(toks) >= 2)
        .select(F.explode(grams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(20)
    )


@query(
    "multimodal_binary_stats",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           length(text) AS n_text_chars,
           md5(text) AS content_md5
    FROM documents
    """,
)
def multimodal_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary column handling (multimodal pattern): payload bytes +
    typed metadata travel as (binary, meta) columns; here the binary is
    derived from text so the oracle can check byte-level behavior."""
    d = table(spark, sf_dir, "documents")
    blob = F.encode("text", "UTF-8")
    return d.select(
        "doc_id",
        F.length(blob).alias("n_bytes"),
        F.length("text").alias("n_text_chars"),
        F.md5(blob).alias("content_md5"),
    )


@query(
    "text_bpe_token_counts",
    oracle="""
    SELECT lang,
           CAST(SUM(len(regexp_extract_all(text,
                '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]'))) AS BIGINT) AS bpe_tokens,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
           ROUND(SUM(len(regexp_extract_all(text,
                '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]'))) * 1.0
              / SUM(len(string_split(text, ' '))), 6) AS bpe_per_ws
    FROM documents
    GROUP BY lang
    """,
)
def text_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with a BPE-ish pre-tokenizer regex (letter runs,
    single digits, single punctuation — the GPT-2 pre-tokenizer family,
    simplified to a dialect both engines' regex libraries treat
    identically) next to plain whitespace counts. bpe_per_ws is the
    tokens-per-word expansion factor used to budget LLM training data.

    Pure JVM-side regexp + aggregation — no Python in the row path; one
    map-side-combinable agg, so it scales like a plain scan."""
    d = table(spark, sf_dir, "documents")
    bpe = F.size(
        F.regexp_extract_all("text", F.lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"), 0)
    )
    ws = F.size(F.split("text", " "))
    return (
        d.groupBy("lang")
        .agg(
            F.sum(bpe).alias("bpe_tokens"),
            F.sum(ws).alias("ws_tokens"),
            F.round(
                F.sum(bpe).cast("double") / F.sum(ws).cast("double"), 6
            ).alias("bpe_per_ws"),
        )
    )


# DuckDB twin of operators/curation.py::curate_corpus (quality gate →
# exact dedup → fingerprint dedup), ending at relation `f` with per-doc
# stage flags — shared by the funnel report and the composed prep pipeline.
_CURATE_F_CTE = """
    WITH scored AS (
      SELECT doc_id, lang, text,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_filter(string_split(text, ' '),
                             x -> x IN ('the', 'a'))) * 1.0
               / len(string_split(text, ' ')) AS stop_ratio,
             len(list_distinct(string_split(text, ' '))) * 1.0
               / len(string_split(text, ' ')) AS distinct_ratio
      FROM documents
    ), q AS (
      SELECT *, (n_tokens >= 5 AND stop_ratio <= 0.5
                 AND distinct_ratio >= 0.3) AS pass_quality
      FROM scored
    ), e AS (
      SELECT *, pass_quality AND ROW_NUMBER() OVER (
          PARTITION BY CASE WHEN pass_quality THEN lower(trim(text)) END
          ORDER BY doc_id) = 1 AS is_exact
      FROM q
    ), f AS (
      SELECT *, is_exact AND ROW_NUMBER() OVER (
          PARTITION BY CASE WHEN is_exact THEN
            md5(array_to_string(list_sort(list_distinct(
                string_split(text, ' '))), ' ')) END
          ORDER BY doc_id) = 1 AS kept
      FROM e
    )
"""


@query(
    "text_curation_pipeline",
    oracle=_CURATE_F_CTE
    + """
    SELECT lang, COUNT(*) AS n_raw,
           CAST(SUM(CASE WHEN pass_quality THEN 1 ELSE 0 END) AS BIGINT)
             AS n_quality,
           CAST(SUM(CASE WHEN is_exact THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exact,
           CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN kept THEN n_tokens ELSE 0 END) AS BIGINT)
             AS kept_tokens
    FROM f
    GROUP BY lang
    """,
)
def text_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data curation funnel (operators/curation.py):
    quality gate → exact dedup → fingerprint dedup, reported as per-lang
    stage counts + kept token budget — the report a data curator ships.
    The whole pipeline is two windows and a narrow projection; the oracle
    re-implements every stage in SQL, so the funnel itself is verified,
    not just the final count."""
    from rtdl_spark.operators.curation import curate_corpus

    d = curate_corpus(table(spark, sf_dir, "documents"))
    flag = lambda c: F.sum(F.when(F.col(c), 1).otherwise(0))  # noqa: E731
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_raw"),
        flag("pass_quality").alias("n_quality"),
        flag("is_exact_canonical").alias("n_exact"),
        flag("is_fp_canonical").alias("n_kept"),
        F.sum(F.when(F.col("kept"), F.col("n_tokens")).otherwise(0)).alias(
            "kept_tokens"
        ),
    )


@query(
    "text_stratified_sample",
    oracle="""
    SELECT lang, source, doc_id
    FROM (
      SELECT lang, source, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY lang, source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rk
      FROM documents
    ) WHERE rk <= 20
    """,
)
def text_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling
    (operators/curation.py::stratified_take): cap every (lang, source)
    bucket at 20 docs, selection order = md5(doc_id) — a pseudo-random
    but engine-independent order, so the oracle draws the *same* sample.
    The training-mixture primitive (balance languages/sources without a
    nondeterministic rand())."""
    from rtdl_spark.operators.curation import stratified_take

    d = table(spark, sf_dir, "documents")
    return stratified_take(d, ["lang", "source"], 20).select(
        "lang", "source", "doc_id"
    )


@query(
    "text_repetition_signals",
    oracle="""
    WITH g AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), k AS (
      SELECT doc_id,
        CASE WHEN len(w) >= 2 THEN
          list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
        ELSE [] END AS g2,
        CASE WHEN len(w) >= 3 THEN
          list_transform(range(1, len(w) - 1),
                         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
        ELSE [] END AS g3
      FROM g
    )
    SELECT doc_id,
      ROUND(CASE WHEN len(g2) > 0
        THEN 1.0 - len(list_distinct(g2)) * 1.0 / len(g2) ELSE 0.0 END, 6)
        AS rep2,
      ROUND(CASE WHEN len(g3) > 0
        THEN 1.0 - len(list_distinct(g3)) * 1.0 / len(g3) ELSE 0.0 END, 6)
        AS rep3,
      ROUND(CASE WHEN len(g2) > 0
        THEN list_max(list_transform(list_distinct(g2),
               x -> len(list_filter(g2, y -> y = x)))) * 1.0 / len(g2)
        ELSE 0.0 END, 6) AS top2_share
    FROM k
    """,
)
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document: duplicate
    2-gram and 3-gram fractions plus the single most frequent bigram's
    share of all bigrams (functions/text.py::ngram_repetition /
    top_ngram_share) — the filters that catch templated and looping text
    which lexical-diversity ratios alone miss."""
    from rtdl_spark.functions.text import ngram_repetition, top_ngram_share

    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.round(ngram_repetition("text", 2), 6).alias("rep2"),
        F.round(ngram_repetition("text", 3), 6).alias("rep3"),
        F.round(top_ngram_share("text", 2), 6).alias("top2_share"),
    )


@query(
    "text_chunking",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
      WHERE len(string_split(text, ' ')) > 0
    ), s AS (
      SELECT doc_id, w,
             UNNEST(range(1, greatest(len(w) - 8, 1) + 1, 56)) AS st,
             generate_subscripts(
               range(1, greatest(len(w) - 8, 1) + 1, 56), 1) - 1 AS chunk_id
      FROM t
    )
    SELECT doc_id, chunk_id,
           len(w[st:st+63]) AS n_chunk_tokens,
           md5(array_to_string(w[st:st+63], ' ')) AS chunk_md5
    FROM s
    """,
)
def text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking (operators/curation.py::chunk_documents):
    64-token windows, 8-token overlap; output pins every chunk's token
    count and text md5 so the oracle verifies the exact split points."""
    from rtdl_spark.operators.curation import chunk_documents

    d = table(spark, sf_dir, "documents")
    ch = chunk_documents(d, 64, 8)
    return ch.select(
        "doc_id",
        "chunk_id",
        F.size(F.split("chunk_text", " ")).alias("n_chunk_tokens"),
        F.md5(F.col("chunk_text")).alias("chunk_md5"),
    )


@query(
    "text_mixture_sample",
    oracle="""
    SELECT source, COUNT(*) AS n_drawn, MIN(doc_id) AS min_id
    FROM (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rk
      FROM documents
    )
    WHERE rk <= CASE source
                  WHEN 'src0' THEN 30
                  WHEN 'src1' THEN 20
                  WHEN 'src2' THEN 10
                  ELSE 0 END
    GROUP BY source
    """,
)
def text_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix sampling (operators/curation.py::mixture_sample):
    budget 60 split 50/33/17 across three sources (caps 30/20/10,
    truncated by availability — src sizes vary with sf), deterministic
    md5(id) order so the oracle draws the identical rows."""
    from rtdl_spark.operators.curation import mixture_sample

    d = table(spark, sf_dir, "documents")
    out = mixture_sample(
        d, "source", 60, {"src0": 0.5, "src1": 1 / 3, "src2": 1 / 6}
    )
    return out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_drawn"), F.min("doc_id").alias("min_id")
    )


@query(
    "text_decontaminate",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), g AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 5 THEN
               list_transform(range(1, len(w) - 3),
                 i -> list_reduce(list_transform(string_split(
                        array_to_string(w[i:i+4], ' '), ''),
                      c -> ascii(c)::BIGINT),
                      (h, c) -> (h * 31 + c) % {HASH_P}))
             ELSE [] END AS hs
      FROM toks
    ), e AS (
      SELECT doc_id, UNNEST(hs) AS h FROM g
    ), bench AS (
      SELECT DISTINCT h FROM e WHERE doc_id % 10 = 0
    ), hits AS (
      SELECT DISTINCT t.doc_id FROM e t JOIN bench b ON t.h = b.h
      WHERE t.doc_id % 10 <> 0
    )
    SELECT d.doc_id, d.source, d.lang FROM documents d
    WHERE d.doc_id % 10 <> 0
      AND d.doc_id NOT IN (SELECT doc_id FROM hits)
    """,
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/curation.py::decontaminate):
    docs with doc_id % 10 == 0 play the held-out eval set; every training
    doc sharing any 5-token n-gram with it is dropped — the GPT-3-style
    overlap rule. The oracle re-runs the identical n-gram polynomial
    hashing in DuckDB, so the hash join itself is verified."""
    from rtdl_spark.operators.curation import decontaminate

    d = table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 10 == 0)
    train = d.filter(F.col("doc_id") % 10 != 0)
    return decontaminate(train, bench, n=5).select("doc_id", "source", "lang")


@query(
    "text_unigram_logprob",
    oracle="""
    WITH tok AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
    ), freq AS (
      SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok
    ), total AS (
      SELECT CAST(SUM(c) AS DOUBLE) AS n FROM freq
    ), scored AS (
      SELECT t.doc_id, -log2(f.c / total.n) AS nll
      FROM tok t JOIN freq f USING (tok) CROSS JOIN total
    )
    SELECT doc_id, COUNT(*) AS n_tokens, ROUND(AVG(nll), 6) AS avg_nll
    FROM scored GROUP BY doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model scoring — the cheap stand-in for the
    KenLM-perplexity quality filter of training pipelines: fit token
    frequencies over the corpus in one aggregate, score each doc as the
    mean negative log2 probability of its tokens (high = out-of
    -distribution / junk).

    Scale shape: the 'model' is the vocabulary frequency table — tiny next
    to the corpus — so scoring is a broadcast join back onto the exploded
    tokens; two shuffles total (vocab agg, per-doc agg), corpus scanned
    twice, never shuffled by token for scoring."""
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens("text")).alias("tok"))
    freq = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = freq.agg(F.sum("c").cast("double").alias("n"))
    model = F.broadcast(
        freq.join(total)
        .select("tok", (-F.log2(F.col("c") / F.col("n"))).alias("nll"))
    )
    return (
        tok.join(model, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("nll"), 6).alias("avg_nll"),
        )
    )


_BM25_TERMS = ("vector", "hash", "merge")


@query(
    "text_bm25_search",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
    ), dl AS (
      SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
    ), stats AS (
      SELECT COUNT(*) AS n_docs,
             AVG(len(string_split(text, ' '))) AS avgdl
      FROM documents
    ), tf AS (
      SELECT doc_id, tok, COUNT(*) AS tf FROM tok
      WHERE tok IN {_BM25_TERMS!r}
      GROUP BY 1, 2
    ), dfreq AS (
      SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
    ), scored AS (
      SELECT tf.doc_id,
             ln((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1)
             * tf.tf * 2.2
             / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl)) AS s
      FROM tf JOIN dfreq USING (tok) JOIN dl USING (doc_id)
      CROSS JOIN stats
    )
    SELECT doc_id, COUNT(*) AS n_terms_hit, ROUND(SUM(s), 5) AS bm25
    FROM scored GROUP BY doc_id
    """,
)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword retrieval (k1=1.2, b=0.75) for a fixed term set — the
    text-search capability over the lake: per-doc term frequencies join a
    broadcast document-frequency table (vocab-sized) and corpus scalars
    (one row); the corpus itself is never shuffled by term. Returns every
    matching doc's score (no top-k cut, so float ties can't make the two
    engines pick different result SETS — ordering is the caller's cheap
    final step)."""
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens("text")).alias("tok"))
    dl = d.select("doc_id", F.size(tokens("text")).alias("dl"))
    stats = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(tokens("text"))).alias("avgdl"),
    )
    tf = (
        tok.filter(F.col("tok").isin(*_BM25_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = F.broadcast(tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df")))
    scored = (
        tf.join(dfreq, "tok")
        .join(dl, "doc_id")
        .join(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
                * F.col("tf") * 2.2
                / (
                    F.col("tf")
                    + 1.2 * (1 - 0.75 + 0.75 * F.col("dl") / F.col("avgdl"))
                )
            ).alias("s"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_terms_hit"),
        F.round(F.sum("s"), 5).alias("bm25"),
    )


@query(
    "text_corpus_prep_pipeline",
    oracle=_CURATE_F_CTE
    + f"""
    , kept AS (
      SELECT doc_id, lang, n_tokens FROM f WHERE kept
    ), toks2 AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), g AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 5 THEN
               list_transform(range(1, len(w) - 3),
                 i -> list_reduce(list_transform(string_split(
                        array_to_string(w[i:i+4], ' '), ''),
                      c -> ascii(c)::BIGINT),
                      (h, c) -> (h * 31 + c) % {HASH_P}))
             ELSE [] END AS hs
      FROM toks2
    ), ev AS (
      SELECT DISTINCT UNNEST(hs) AS h FROM g WHERE doc_id % 10 = 0
    ), hits AS (
      SELECT DISTINCT t.doc_id
      FROM (SELECT doc_id, UNNEST(hs) AS h FROM g) t JOIN ev USING (h)
    ), clean AS (
      SELECT k.* FROM kept k
      WHERE k.doc_id % 10 <> 0
        AND k.doc_id NOT IN (SELECT doc_id FROM hits)
    ), kept_stats AS (
      SELECT lang, COUNT(*) AS n_kept FROM kept GROUP BY lang
    ), clean_stats AS (
      SELECT lang, COUNT(*) AS n_clean,
             CAST(SUM((greatest(n_tokens - 8, 1) - 1) // 56 + 1) AS BIGINT)
               AS n_chunks
      FROM clean GROUP BY lang
    )
    SELECT k.lang, k.n_kept, c.n_clean, c.n_chunks
    FROM kept_stats k JOIN clean_stats c USING (lang)
    """,
)
def text_corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END corpus preparation pipeline, composed from the
    individually-verified stages: curation funnel (quality → exact →
    fingerprint dedup) → benchmark decontamination (5-gram overlap vs the
    doc_id%10==0 eval split) → context-window chunking (64 tokens,
    overlap 8) — reported per language as docs kept, docs surviving
    decontamination, and training chunks produced. The oracle re-runs
    every stage in SQL (chunk counts arithmetically from the operator's
    window formula), so the composition — stage order, survivor flow,
    chunk fan-out — is hash-verified, not just each piece."""
    from rtdl_spark.operators.curation import (
        chunk_documents,
        curate_corpus,
        decontaminate,
    )

    d = table(spark, sf_dir, "documents")
    cur = curate_corpus(d).filter(F.col("kept"))
    bench = d.filter(F.col("doc_id") % 10 == 0)
    train = cur.filter(F.col("doc_id") % 10 != 0)
    clean = decontaminate(train, bench, n=5)
    chunk_counts = (
        chunk_documents(clean, 64, 8)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_chunks"))
    )
    kept_stats = cur.groupBy("lang").agg(F.count(F.lit(1)).alias("n_kept"))
    clean_stats = (
        clean.join(chunk_counts, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_clean"),
            F.sum("n_chunks").alias("n_chunks"),
        )
    )
    return kept_stats.join(clean_stats, "lang")


@query(
    "text_sequence_packing",
    oracle="""
    WITH RECURSIVE numbered AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
             CAST(doc_id % 8 AS INT) AS shard,
             row_number() OVER (PARTITION BY doc_id % 8
                                ORDER BY doc_id) AS rn
      FROM documents
    ), r AS (
      SELECT shard, rn, doc_id, n_tokens,
             0 AS seq_idx, n_tokens AS fill
      FROM numbered WHERE rn = 1
      UNION ALL
      SELECT n.shard, n.rn, n.doc_id, n.n_tokens,
             CASE WHEN r.fill + n.n_tokens > 256
                  THEN r.seq_idx + 1 ELSE r.seq_idx END,
             CASE WHEN r.fill + n.n_tokens > 256
                  THEN n.n_tokens ELSE r.fill + n.n_tokens END
      FROM r JOIN numbered n ON n.shard = r.shard AND n.rn = r.rn + 1
    )
    SELECT doc_id, n_tokens, shard,
           CAST(seq_idx AS INT) AS seq_idx,
           CAST(MAX(fill) OVER (PARTITION BY shard, seq_idx) AS INT)
             AS seq_fill
    FROM r
    """,
)
def text_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing (operators/curation.py::pack_sequences):
    deterministic next-fit of documents into 256-token sequences within 8
    id-mod shards. The oracle replays the same recurrence as a DuckDB
    recursive CTE — per-shard walk in id order, new sequence when the
    budget would overflow — so the hash-compare verifies the packing
    itself, not just row counts."""
    from rtdl_spark.operators.curation import pack_sequences

    d = table(spark, sf_dir, "documents")
    return pack_sequences(d, budget=256, n_shards=8)


@query(
    "text_contamination_overlap",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), g AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 5 THEN
               list_distinct(list_transform(range(1, len(w) - 3),
                 i -> list_reduce(list_transform(string_split(
                        array_to_string(w[i:i+4], ' '), ''),
                      c -> ascii(c)::BIGINT),
                      (h, c) -> (h * 31 + c) % {HASH_P})))
             ELSE [] END AS hs
      FROM toks
    ), e AS (
      SELECT doc_id, UNNEST(hs) AS h FROM g
    ), bench AS (
      SELECT DISTINCT h FROM e WHERE doc_id % 10 = 0
    ), counts AS (
      SELECT t.doc_id, COUNT(*) AS n_grams, COUNT(b.h) AS n_shared
      FROM (SELECT * FROM e WHERE doc_id % 10 <> 0) t
      LEFT JOIN bench b ON t.h = b.h
      GROUP BY t.doc_id
    )
    SELECT d.doc_id,
           COALESCE(c.n_grams, 0) AS n_grams,
           COALESCE(c.n_shared, 0) AS n_shared,
           ROUND(CASE WHEN COALESCE(c.n_grams, 0) > 0
                      THEN c.n_shared * 1.0 / c.n_grams
                      ELSE 0.0 END, 6) AS overlap_frac
    FROM documents d LEFT JOIN counts c USING (doc_id)
    WHERE d.doc_id % 10 <> 0
    """,
)
def text_contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded benchmark-contamination audit (operators/curation.py::
    contamination_overlap): per training doc, the fraction of its distinct
    5-grams found anywhere in the doc_id%10==0 eval split — the WIMBD-style
    measurement behind threshold choices, vs text_decontaminate's binary
    drop rule. Oracle replays the identical polynomial n-gram hashing and
    counting in DuckDB."""
    from rtdl_spark.operators.curation import contamination_overlap

    d = table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 10 == 0)
    train = d.filter(F.col("doc_id") % 10 != 0)
    return contamination_overlap(train, bench, n=5)


@query(
    "text_quality_classifier",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
    ), scored AS (
      SELECT doc_id,
             ((list_reduce(list_transform(string_split(tok, ''),
                           c -> ascii(c)::BIGINT),
                           (h, c) -> (h * 31 + c) % {HASH_P}) % 4096)
              * 1103515245 + 12345) % 100000 - 50000 AS w
      FROM toks
    ), agg AS (
      SELECT doc_id, COUNT(*) AS n_tokens, SUM(w) AS sw
      FROM scored GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(a.n_tokens, 0) AS n_tokens,
           CAST(CASE WHEN COALESCE(a.n_tokens, 0) > 0
                     THEN FLOOR(sw * 10.0 / a.n_tokens)
                     ELSE 0 END AS BIGINT) / 1000000.0 AS score
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-feature linear quality scoring (operators/curation.py::
    linear_quality_score) — the GPT-3-style classifier SERVING path with
    deterministic integer weights, so the mean-weight score is exact in
    any partition order and the oracle hash-verifies the whole pipeline
    (tokenize → polynomial hash → bucket → weight → integer sum)."""
    from rtdl_spark.operators.curation import linear_quality_score

    d = table(spark, sf_dir, "documents")
    return linear_quality_score(d)


@query(
    "ml_logreg_quality_filter",
    # BOUND-STYLE oracle (r9 — was rows-only): the trained weights
    # themselves cannot cross engines (see docstring), but the
    # train-then-score pipeline's INVARIANTS can — exact per-class
    # counts anchor the hash to the data; the booleans certify that
    # every document got a sigmoid score in (0,1), that some GD
    # iteration improved on the w=0 log-loss ln(2), and that training
    # actually moved the weights
    oracle="""
    SELECT CASE WHEN list_contains(string_split(text, ' '), 'spark')
                THEN 1 ELSE 0 END AS y,
           COUNT(*) AS n_class,
           TRUE AS probs_in_unit,
           TRUE AS loss_improved,
           TRUE AS weights_moved
    FROM documents GROUP BY 1
    """,
)
def ml_logreg_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-score classifier filter (operators/classify.py):
    logistic regression over hashed bag-of-words learns a text-derived
    label, then scores the corpus — the fastText/CCNet quality-filter
    loop, end to end.

    The trained weights / confusion counts carry NO cross-engine oracle
    — and the kmeans-style exact unroll (ml_kmeans_embeddings) is
    provably NOT portable here (the r4-brief attempt, documented per
    its instruction): from iteration 2 onward every margin passes through
    exp() (sigmoid) and the loss through log(), and java.lang.Math.exp /
    DuckDB's libm exp are each <=1-ulp but NOT correctly-rounded — the
    same input can differ in the last ulp between engines, each
    iteration feeds those outputs into the next gradient, and GD has no
    fixed-point scale at which a floor/round could absorb an
    input-dependent ulp. Only the transcendental-free prefix is
    engine-exact — which is exactly what ml_logreg_exact_step verifies
    (iteration 1 from w=0 has p=1/(1+exp(0))=0.5 EXACTLY, so the whole
    first gradient step is +-0.5 dyadic arithmetic). The full-depth
    distributed gradient here is instead verified EXACTLY against dense
    numpy in tests/test_operators.py (same floats, same fold order);
    the ORACLE verifies the pipeline invariants (r8 verdict item 6):
    exact class counts, all sigmoid scores in (0,1), best-iteration
    loss <= ln(2) (measured to hold at sf0.001/0.01/0.1 — the lr=2.0
    trajectory oscillates but always beats the w=0 start somewhere),
    and a nonzero weight vector."""
    import math

    from rtdl_spark.operators.classify import score_logreg, train_logreg

    d = table(spark, sf_dir, "documents").withColumn(
        "y",
        F.array_contains(F.split(F.col("text"), " "), "spark").cast("int"),
    )
    w, b, losses = train_logreg(d, "y", n_buckets=1024, n_iter=8, lr=2.0)
    scored = score_logreg(d, w, b, 1024).join(
        d.select("doc_id", "y"), "doc_id"
    )
    stats = scored.groupBy("y").agg(
        F.count(F.lit(1)).alias("n_class"),
        F.min("prob").alias("pmin"),
        F.max("prob").alias("pmax"),
    )
    loss_improved = bool(min(losses[1:]) <= math.log(2) + 1e-12)
    weights_moved = bool(float(abs(w).sum()) > 0.0)
    return stats.select(
        "y",
        "n_class",
        ((F.col("pmin") > 0.0) & (F.col("pmax") < 1.0)).alias(
            "probs_in_unit"
        ),
        F.lit(loss_improved).alias("loss_improved"),
        F.lit(weights_moved).alias("weights_moved"),
    )


@query(
    "ml_logreg_exact_step",
    # full SQL replay of ONE exact gradient step + sign-threshold serving:
    # from w=0 the sigmoid is exactly 0.5 (no transcendental reached), so
    # residuals are +-0.5, per-bucket gradient sums are dyadic-exact in any
    # order, the weight step is the operator's literal -2.0*(g/n) float
    # sequence, and serving margins go through DECIMAL so the per-doc sum
    # is associativity-exact; predicted = margin+bias > 0 (sign test — no
    # sigmoid, hence no cross-engine exp() ulp exposure).
    oracle=f"""
    WITH lab AS (
      SELECT doc_id,
             CASE WHEN list_contains(string_split(text, ' '), 'spark')
                  THEN 1.0 ELSE 0.0 END AS y
      FROM documents
    ), toks AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
    ), feats AS (
      SELECT DISTINCT doc_id,
             CAST(list_reduce(list_transform(string_split(tok, ''),
                              c -> ascii(c)::BIGINT),
                  (h, c) -> (h * 31 + c) % {HASH_P}) % 1024 AS INT) AS b
      FROM toks
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents),
    grad AS (
      SELECT f.b, SUM(0.5 - l.y) AS g
      FROM feats f JOIN lab l USING (doc_id) GROUP BY f.b
    ), w AS (
      SELECT b, -2.0 * (g / (SELECT n_docs FROM n)) AS w FROM grad
    ), bias AS (
      SELECT -2.0 * AVG(0.5 - y) AS bias FROM lab
    ), marg AS (
      SELECT f.doc_id,
             CAST(SUM(CAST(w.w AS DECIMAL(28,12))) AS DOUBLE) AS m
      FROM feats f JOIN w USING (b) GROUP BY f.doc_id
    )
    SELECT CAST(l.y AS INT) AS y,
           (COALESCE(m.m, 0.0) + (SELECT bias FROM bias)) > 0 AS predicted,
           COUNT(*) AS n,
           CAST(SUM(FLOOR(
             (COALESCE(m.m, 0.0) + (SELECT bias FROM bias)) * 1e9
           )) AS BIGINT) AS margin_fix
    FROM lab l LEFT JOIN marg m USING (doc_id)
    GROUP BY 1, 2
    """,
)
def ml_logreg_exact_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine-exact prefix of the logreg trajectory, externally
    verifiable end to end (see ml_logreg_quality_filter's docstring for
    why iteration >= 2 cannot be): train_logreg with n_iter=1 computes
    one full-batch distributed gradient step (residuals exactly +-0.5,
    so every reduction is dyadic-exact), then the corpus is scored with
    a DECIMAL-exact margin sum and thresholded on the margin's SIGN
    (equivalent to prob > 0.5 without evaluating the sigmoid). Verifies
    the tokenize→hash→bucket→gradient→step→serve pipeline cross-engine,
    bit-for-bit."""
    from rtdl_spark.operators.classify import doc_features, train_logreg

    d = table(spark, sf_dir, "documents").withColumn(
        "y",
        F.array_contains(F.split(F.col("text"), " "), "spark").cast("int"),
    )
    w, b, _ = train_logreg(d, "y", n_buckets=1024, n_iter=1, lr=2.0)
    spark_w = F.broadcast(
        local_result(
            spark,
            [(i, float(w[i])) for i in range(1024) if w[i] != 0.0],
            "_b int, _w double",
        )
    )
    feats = doc_features(d, 1024)
    marg = (
        feats.join(spark_w, "_b", "inner")
        .withColumn(
            "_t", (F.col("_w") * F.col("_x")).cast("decimal(28,12)")
        )
        .groupBy("_id")
        .agg(F.sum("_t").cast("double").alias("_m"))
    )
    mb = F.coalesce(F.col("_m"), F.lit(0.0)) + F.lit(float(b))
    return (
        d.select(F.col("doc_id").alias("_id"), "y")
        .join(marg, "_id", "left")
        .groupBy("y", (mb > 0).alias("predicted"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            # floor-fixed integer sum of the margins pins every per-doc
            # margin VALUE cross-engine, not just its sign
            F.sum(F.floor(mb * 1e9)).alias("margin_fix"),
        )
    )


@query(
    "text_training_shards",
    oracle=f"""
    WITH k AS (
      SELECT doc_id, md5('42:' || CAST(doc_id AS VARCHAR)) AS sk
      FROM documents
    ), a AS (
      SELECT doc_id, sk,
             CAST(list_reduce(list_transform(string_split(sk, ''),
                              c -> ascii(c)::BIGINT),
                  (h, c) -> (h * 31 + c) % {HASH_P}) % 8 AS INT) AS shard_id
      FROM k
    )
    SELECT shard_id, COUNT(*) AS n_rows,
           md5(string_agg(CAST(doc_id AS VARCHAR), ','
               ORDER BY sk, doc_id)) AS order_digest
    FROM a GROUP BY shard_id
    """,
)
def text_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + shard assignment for training export
    (operators/export.py): shard = polyhash(md5(seed:id)) mod 8, order
    within shard = the md5 key. The manifest's order_digest folds every
    id in training order, so the oracle verifies the exact permutation —
    assignment AND order — without a global sort on either engine."""
    from rtdl_spark.operators.export import assign_shards, shard_manifest

    d = table(spark, sf_dir, "documents")
    return shard_manifest(assign_shards(d, "doc_id", 8, 42), "doc_id")


@query(
    "multimodal_phash_near_dup",
    oracle="""
    WITH h AS (
      SELECT doc_id,
             list_reduce(list_transform(
               string_split(substring(md5(text), 1, 15), ''),
               c -> CASE WHEN ascii(c) <= 57 THEN CAST(ascii(c) - 48 AS BIGINT)
                         ELSE CAST(ascii(c) - 87 AS BIGINT) END),
               (h, c) -> h * 16 + c) AS phash
      FROM documents
    ), p AS (
      SELECT doc_id + 1000000 AS doc_id,
             xor(phash, 1::BIGINT << CAST(doc_id % 60 AS INT)) AS phash
      FROM h WHERE doc_id % 20 = 0
    ), c AS (
      SELECT doc_id, phash FROM h UNION ALL SELECT doc_id, phash FROM p
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
    FROM c a JOIN c b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.phash, b.phash)) <= 3
    """,
)
def multimodal_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-dup over media payloads (operators/
    multimodal.py::perceptual_hash + phash_near_dup_pairs): 60-bit
    content fingerprint, 4-band bucket join, hamming ≤ 3 filter. With
    max_hamming < n_bands the banding is pigeonhole-LOSSLESS, so the
    all-pairs oracle is exact — the banded plan must find every pair the
    quadratic scan would. Near-dups are planted as bit-flipped replicas
    of every 20th fingerprint (the decode step is the stubbed fake;
    perturbing real pixels would need a codec)."""
    from rtdl_spark.operators.multimodal import (
        attach_binary_payload,
        perceptual_hash,
        phash_near_dup_pairs,
    )

    d = table(spark, sf_dir, "documents")
    hashed = perceptual_hash(
        attach_binary_payload(d), fake_decode=True
    ).select("doc_id", "phash")
    planted = hashed.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.expr(
            "phash ^ shiftleft(CAST(1 AS BIGINT), CAST(doc_id % 60 AS INT))"
        ).alias("phash"),
    )
    corpus = hashed.unionByName(planted)
    pairs = phash_near_dup_pairs(corpus, n_bands=4, max_hamming=3)
    return pairs.select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    )


@query(
    "text_distinctive_terms",
    oracle="""
    WITH toks AS (
      SELECT source, UNNEST(string_split(text, ' ')) AS term
      FROM documents
    ), tf AS (
      SELECT source, term, COUNT(*) AS tf
      FROM toks WHERE term <> '' GROUP BY source, term
    ), df AS (
      SELECT term, COUNT(DISTINCT source) AS df FROM tf GROUP BY term
    ), scored AS (
      SELECT tf.source, tf.term, tf.tf, df.df,
             ROW_NUMBER() OVER (
               PARTITION BY tf.source
               ORDER BY CAST(tf.tf AS DOUBLE) / df.df DESC, tf.term
             ) AS rk
      FROM tf JOIN df USING (term)
    )
    SELECT source, term, tf, df, rk FROM scored WHERE rk <= 3
    """,
)
def text_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinctive terms (the TF-IDF keyword shape, scored by
    the deterministic tf/df ratio so both engines rank identically —
    log-based idf differs only by a monotone-breaking constant here):
    top-3 terms per source. Plan: explode → two map-combinable hash aggs
    (term freq per source; source-df per term) → broadcast df join →
    per-source window over the tiny aggregated frame — the corpus text
    never reaches the window."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("source", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(
        F.countDistinct("source").alias("df")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(
        (F.col("tf").cast("double") / F.col("df")).desc(), F.col("term").asc()
    )
    return (
        tf.join(F.broadcast(df_), "term")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("source", "term", "tf", "df", "rk")
    )


@query(
    "text_train_val_test_split",
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(
               string_split(md5('split:' || CAST(doc_id AS VARCHAR)), ''),
               c -> CAST(ascii(c) AS BIGINT))),
               (a, b) -> (a * 31 + b) % {HASH_P}) % 100 AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n, MIN(doc_id) AS min_id,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM h GROUP BY 1
    """,
)
def text_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split: a document's split is
    a pure function of its id (bucket = polyhash(md5('split:'||id)) mod
    100) — reproducible on any cluster, stable under re-runs and corpus
    growth (existing docs never migrate), zero shuffle to assign. The
    id_sum digest pins the exact membership of each split."""
    from rtdl_spark.functions.text import token_hash

    d = table(spark, sf_dir, "documents")
    bucket = (
        token_hash(
            F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string")))
        )
        % 100
    )
    return (
        d.withColumn("bucket", bucket)
        .withColumn(
            "split",
            F.when(F.col("bucket") < 80, "train")
            .when(F.col("bucket") < 90, "val")
            .otherwise("test"),
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("doc_id").alias("min_id"),
            F.sum("doc_id").cast("long").alias("id_sum"),
        )
    )


_PHRASE_ORACLE = """WITH d0 AS (SELECT string_split(text, ' ') AS toks FROM documents),
q0 AS (
  SELECT p[1] AS ml, p[2] AS mr, CAST(COUNT(*) AS BIGINT) AS n
  FROM (
    SELECT unnest(list_zip(toks, toks[2:])) AS p
    FROM d0 WHERE len(toks) >= 2
  )
  WHERE p[2] IS NOT NULL
  GROUP BY 1, 2
),
b0 AS (
  SELECT ml, mr, n FROM q0 WHERE n >= 2
  ORDER BY n DESC, ml ASC, mr ASC LIMIT 1
),
d1 AS (
  SELECT string_split(ltrim(
    CASE WHEN split_part(folded, '|', 2) = ''
         THEN split_part(folded, '|', 1)
         ELSE split_part(folded, '|', 1) || '.' ||
              split_part(folded, '|', 2)
    END, '.'), '.') AS toks
  FROM (
    SELECT list_reduce(list_prepend('|', toks),
      (acc, x) -> CASE
        WHEN split_part(acc, '|', 2) = ''
          THEN split_part(acc, '|', 1) || '|' || x
        WHEN split_part(acc, '|', 2) = b.ml AND x = b.mr
          THEN split_part(acc, '|', 1) || '.' || b.ml || chr(30) ||
               b.mr || '|'
        ELSE split_part(acc, '|', 1) || '.' ||
             split_part(acc, '|', 2) || '|' || x
      END) AS folded
    FROM d0, b0 b
  )
),
q1 AS (
  SELECT p[1] AS ml, p[2] AS mr, CAST(COUNT(*) AS BIGINT) AS n
  FROM (
    SELECT unnest(list_zip(toks, toks[2:])) AS p
    FROM d1 WHERE len(toks) >= 2
  )
  WHERE p[2] IS NOT NULL
  GROUP BY 1, 2
),
b1 AS (
  SELECT ml, mr, n FROM q1 WHERE n >= 2
  ORDER BY n DESC, ml ASC, mr ASC LIMIT 1
),
d2 AS (
  SELECT string_split(ltrim(
    CASE WHEN split_part(folded, '|', 2) = ''
         THEN split_part(folded, '|', 1)
         ELSE split_part(folded, '|', 1) || '.' ||
              split_part(folded, '|', 2)
    END, '.'), '.') AS toks
  FROM (
    SELECT list_reduce(list_prepend('|', toks),
      (acc, x) -> CASE
        WHEN split_part(acc, '|', 2) = ''
          THEN split_part(acc, '|', 1) || '|' || x
        WHEN split_part(acc, '|', 2) = b.ml AND x = b.mr
          THEN split_part(acc, '|', 1) || '.' || b.ml || chr(30) ||
               b.mr || '|'
        ELSE split_part(acc, '|', 1) || '.' ||
             split_part(acc, '|', 2) || '|' || x
      END) AS folded
    FROM d1, b1 b
  )
),
q2 AS (
  SELECT p[1] AS ml, p[2] AS mr, CAST(COUNT(*) AS BIGINT) AS n
  FROM (
    SELECT unnest(list_zip(toks, toks[2:])) AS p
    FROM d2 WHERE len(toks) >= 2
  )
  WHERE p[2] IS NOT NULL
  GROUP BY 1, 2
),
b2 AS (
  SELECT ml, mr, n FROM q2 WHERE n >= 2
  ORDER BY n DESC, ml ASC, mr ASC LIMIT 1
),
d3 AS (
  SELECT string_split(ltrim(
    CASE WHEN split_part(folded, '|', 2) = ''
         THEN split_part(folded, '|', 1)
         ELSE split_part(folded, '|', 1) || '.' ||
              split_part(folded, '|', 2)
    END, '.'), '.') AS toks
  FROM (
    SELECT list_reduce(list_prepend('|', toks),
      (acc, x) -> CASE
        WHEN split_part(acc, '|', 2) = ''
          THEN split_part(acc, '|', 1) || '|' || x
        WHEN split_part(acc, '|', 2) = b.ml AND x = b.mr
          THEN split_part(acc, '|', 1) || '.' || b.ml || chr(30) ||
               b.mr || '|'
        ELSE split_part(acc, '|', 1) || '.' ||
             split_part(acc, '|', 2) || '|' || x
      END) AS folded
    FROM d2, b2 b
  )
),
q3 AS (
  SELECT p[1] AS ml, p[2] AS mr, CAST(COUNT(*) AS BIGINT) AS n
  FROM (
    SELECT unnest(list_zip(toks, toks[2:])) AS p
    FROM d3 WHERE len(toks) >= 2
  )
  WHERE p[2] IS NOT NULL
  GROUP BY 1, 2
),
b3 AS (
  SELECT ml, mr, n FROM q3 WHERE n >= 2
  ORDER BY n DESC, ml ASC, mr ASC LIMIT 1
),
d4 AS (
  SELECT string_split(ltrim(
    CASE WHEN split_part(folded, '|', 2) = ''
         THEN split_part(folded, '|', 1)
         ELSE split_part(folded, '|', 1) || '.' ||
              split_part(folded, '|', 2)
    END, '.'), '.') AS toks
  FROM (
    SELECT list_reduce(list_prepend('|', toks),
      (acc, x) -> CASE
        WHEN split_part(acc, '|', 2) = ''
          THEN split_part(acc, '|', 1) || '|' || x
        WHEN split_part(acc, '|', 2) = b.ml AND x = b.mr
          THEN split_part(acc, '|', 1) || '.' || b.ml || chr(30) ||
               b.mr || '|'
        ELSE split_part(acc, '|', 1) || '.' ||
             split_part(acc, '|', 2) || '|' || x
      END) AS folded
    FROM d3, b3 b
  )
),
q4 AS (
  SELECT p[1] AS ml, p[2] AS mr, CAST(COUNT(*) AS BIGINT) AS n
  FROM (
    SELECT unnest(list_zip(toks, toks[2:])) AS p
    FROM d4 WHERE len(toks) >= 2
  )
  WHERE p[2] IS NOT NULL
  GROUP BY 1, 2
),
b4 AS (
  SELECT ml, mr, n FROM q4 WHERE n >= 2
  ORDER BY n DESC, ml ASC, mr ASC LIMIT 1
),
d5 AS (
  SELECT string_split(ltrim(
    CASE WHEN split_part(folded, '|', 2) = ''
         THEN split_part(folded, '|', 1)
         ELSE split_part(folded, '|', 1) || '.' ||
              split_part(folded, '|', 2)
    END, '.'), '.') AS toks
  FROM (
    SELECT list_reduce(list_prepend('|', toks),
      (acc, x) -> CASE
        WHEN split_part(acc, '|', 2) = ''
          THEN split_part(acc, '|', 1) || '|' || x
        WHEN split_part(acc, '|', 2) = b.ml AND x = b.mr
          THEN split_part(acc, '|', 1) || '.' || b.ml || chr(30) ||
               b.mr || '|'
        ELSE split_part(acc, '|', 1) || '.' ||
             split_part(acc, '|', 2) || '|' || x
      END) AS folded
    FROM d4, b4 b
  )
)
SELECT 0 AS merge_idx, ml AS "left", mr AS "right", n FROM b0 UNION ALL SELECT 1 AS merge_idx, ml AS "left", mr AS "right", n FROM b1 UNION ALL SELECT 2 AS merge_idx, ml AS "left", mr AS "right", n FROM b2 UNION ALL SELECT 3 AS merge_idx, ml AS "left", mr AS "right", n FROM b3 UNION ALL SELECT 4 AS merge_idx, ml AS "left", mr AS "right", n FROM b4"""


@query("text_phrase_mining", oracle=_PHRASE_ORACLE)
def text_phrase_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative merge-rule training (operators/bpe.py — the word2phrase
    loop): 5 rounds of count-pairs → argmax → fuse over the corpus;
    returns the learned rules with their frequencies. Rows-only until
    round 6: the char-level BPE oracle technique (the fold replayed via
    DuckDB list_reduce with a string-encoded accumulator, rounds unrolled
    as chained CTEs) applies verbatim at word level — re-deriving from
    the original corpus with k rules (the operator's lineage-cutting
    trick) equals chaining one rule per round, which is what the SQL
    does. The documents fixture is pure [a-z ], so '.'/'|' accumulator
    separators and the chr(30) fuse marker cannot collide."""
    from rtdl_spark.operators.bpe import train_phrase_merges

    d = table(spark, sf_dir, "documents")
    _, stats = train_phrase_merges(d, n_merges=5)
    return stats


@query(
    "text_temperature_mixture",
    oracle="""
    WITH counts AS (
      SELECT source, COUNT(*) AS n FROM documents GROUP BY source
    ), w AS (
      SELECT source, sqrt(n) / SUM(sqrt(n)) OVER () AS wt FROM counts
    ), caps AS (
      SELECT source, CAST(round(93 * wt) AS BIGINT) AS cap FROM w
    ), ranked AS (
      SELECT d.source, d.doc_id, c.cap,
             ROW_NUMBER() OVER (
               PARTITION BY d.source
               ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id
             ) AS rk
      FROM documents d JOIN caps c USING (source)
    )
    SELECT source, COUNT(*) AS n_drawn,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM ranked WHERE rk <= cap GROUP BY source
    """,
)
def text_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-rebalanced mixture (operators/curation.py::
    temperature_weights + mixture_sample): weights ∝ sqrt(source size)
    (alpha=0.5 up-weights small sources vs natural sampling), budget 93,
    draws in deterministic md5(id) order. sqrt is IEEE-exact on both
    engines; the budget is chosen so no cap lands on an exact .5 (a
    uniform-source corpus puts budget/n_sources there, where float
    summation order makes rounding engine-unstable — 90 across 20 equal
    sources was caught by this very gate)."""
    from rtdl_spark.operators.curation import (
        mixture_sample,
        temperature_weights,
    )

    d = table(spark, sf_dir, "documents")
    w = temperature_weights(d, "source", alpha=0.5)
    out = mixture_sample(d, "source", 93, w)
    return out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_drawn"),
        F.sum("doc_id").cast("long").alias("id_sum"),
    )


@query(
    "text_domain_policy",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             concat('doc', CAST(doc_id % 7 AS VARCHAR), '.example.com') AS host
      FROM documents
    ), r AS (
      SELECT doc_id, host,
             host IN ('doc0.example.com', 'doc3.example.com') AS is_blocked,
             CASE WHEN host NOT IN ('doc0.example.com', 'doc3.example.com')
               THEN ROW_NUMBER() OVER (
                 PARTITION BY CASE WHEN host NOT IN
                   ('doc0.example.com', 'doc3.example.com') THEN host END
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
             END AS domain_rank
      FROM u
    )
    SELECT doc_id, host, is_blocked, domain_rank,
           (NOT is_blocked) AND (domain_rank <= 30) AS kept
    FROM r
    """,
)
def text_domain_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl domain policy (operators/curation.py::domain_policy): host
    extracted from a URL (parse_url, JVM built-in), blocklisted domains
    flagged, survivors capped at 30 docs per domain in deterministic
    md5(id) order — the Common-Crawl-style rule that keeps giant sites
    from dominating a training mix. The oracle re-derives host, verdicts,
    and the exact per-domain sample. One window shuffle on host; the
    blocklist is a literal hash-set probe (no join)."""
    from rtdl_spark.operators.curation import domain_policy

    d = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://doc"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.com/"),
        F.col("source"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
    )
    out = domain_policy(
        d.withColumn("url", url),
        "url",
        ["doc0.example.com", "doc3.example.com"],
        per_domain_cap=30,
    )
    return out.select("doc_id", "host", "is_blocked", "domain_rank", "kept")


@query(
    "text_exact_k_sample",
    oracle="""
    SELECT doc_id, source FROM documents
    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
    LIMIT 50
    """,
)
def text_exact_k_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic exact-k corpus sample
    (operators/curation.py::exact_k_sample): the 50 rows with the
    smallest md5(doc_id) — stable across runs/engines where
    TABLESAMPLE/rand() are neither. Compiles to TakeOrderedAndProject
    (per-partition k-row heaps, driver merges P·k rows — no global sort,
    no single-partition exchange; pinned by the plan test)."""
    from rtdl_spark.operators.curation import exact_k_sample

    d = table(spark, sf_dir, "documents")
    return exact_k_sample(d, 50).select("doc_id", "source")


@query(
    "text_row_id_assignment",
    oracle="""
    SELECT doc_id, source,
           CAST(ROW_NUMBER() OVER (ORDER BY doc_id) AS BIGINT) AS row_id
    FROM documents
    """,
)
def text_row_id_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous global row ids in doc_id order
    (operators/curation.py::assign_sequential_ids) WITHOUT the
    empty-PARTITION-BY window plan that funnels the whole table through
    one partition: equi-width buckets over a min/max pre-scan, per-bucket
    counts → cumulative offsets (window over the 1024-row aggregated
    frame only), broadcast-joined back, id = offset + intra-bucket
    row_number. Equals ROW_NUMBER() OVER (ORDER BY doc_id) exactly —
    which IS the oracle — while the big-table shuffle stays hash-
    partitioned on the bucket key (plan-gated: no SinglePartition
    exchange on the documents scan)."""
    from rtdl_spark.operators.curation import assign_sequential_ids

    d = table(spark, sf_dir, "documents").select("doc_id", "source")
    return assign_sequential_ids(d, "doc_id")


@query(
    "text_adaptive_quality_filter",
    oracle="""
    WITH s AS (
      SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ), t AS (
      SELECT lang, quantile_cont(n_tokens, 0.2) AS thr
      FROM s GROUP BY lang
    )
    SELECT s.lang, ROUND(t.thr, 4) AS q_threshold,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN s.n_tokens >= t.thr THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept
    FROM s JOIN t ON s.lang = t.lang
    GROUP BY s.lang, t.thr
    """,
)
def text_adaptive_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language adaptive quality gate
    (operators/curation.py::adaptive_quality_threshold): each language's
    cutoff is its OWN 20th token-count percentile (CCNet-style), so
    low-resource languages aren't wiped out by a global constant. The
    threshold is one per-group aggregate broadcast back — no corpus-wide
    window sort; interpolated percentiles agree exactly across engines
    (integer endpoints, identical linear interpolation)."""
    from rtdl_spark.operators.curation import adaptive_quality_threshold

    d = table(spark, sf_dir, "documents")
    s = d.select("doc_id", "lang", token_count(F.col("text")).alias("n_tokens"))
    out = adaptive_quality_threshold(s, "lang", "n_tokens", 0.2)
    return out.groupBy("lang").agg(
        F.round(F.first("q_threshold"), 4).alias("q_threshold"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("kept").cast("bigint")).alias("n_kept"),
    )


@query(
    "text_negative_samples",
    oracle="""
    WITH p AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR))) AS pos
      FROM documents
    ), c AS (SELECT COUNT(*) AS n FROM documents),
    e AS (
      SELECT doc_id AS anchor_id, pos, j
      FROM p, UNNEST([1, 2, 3]) AS t(j)
    )
    SELECT e.anchor_id, e.j, q.doc_id AS negative_id
    FROM e CROSS JOIN c
    JOIN p q ON q.pos = ((e.pos - 1 + e.j) % c.n) + 1
    """,
)
def text_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic contrastive negative sampling
    (operators/curation.py::negative_samples): each document draws 3
    negatives — its successors in the fixed md5(id) permutation of the
    corpus (circular), so every engine and rerun draws the identical
    sample. Positions come from the bucket-offset row-id scheme bucketed
    on the md5 hex prefix (string order == prefix-integer order — no
    single-partition window), and the fetch is one equi hash-join on the
    position integer. The oracle replays the permutation and modular
    walk in SQL."""
    from rtdl_spark.operators.curation import negative_samples

    d = table(spark, sf_dir, "documents")
    return negative_samples(d, "doc_id", 3)


@query(
    "text_curriculum_shards",
    oracle="""
    WITH r AS (
      SELECT doc_id, n_chars,
             CAST(ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS BIGINT)
               AS curriculum_rank,
             COUNT(*) OVER () AS n
      FROM documents
    )
    SELECT doc_id, n_chars, curriculum_rank,
           CAST(FLOOR((curriculum_rank - 1) * 8 / n) AS INT) AS shard_id
    FROM r
    """,
)
def text_curriculum_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-learning shard assignment
    (operators/export.py::assign_curriculum_shards): global rank under
    (n_chars, doc_id) — short/easy documents first — cut into 8 exactly
    balanced contiguous bands. Rank comes from the bucket-offset row-id
    scheme (hash shuffle on the score bucket, never a single-partition
    window); bands are a pure function of rank, deterministic where
    repartitionByRange's sampled boundaries are not."""
    from rtdl_spark.operators.export import assign_curriculum_shards

    d = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return assign_curriculum_shards(d, "n_chars", n_shards=8)


@query(
    "text_vocab_coverage",
    oracle="""
    WITH toks AS (
      SELECT lang, UNNEST(string_split(text, ' ')) AS tok FROM documents
    ), t2 AS (
      SELECT lang, tok FROM toks WHERE tok <> ''
    ), vc AS (
      SELECT tok FROM (
        SELECT tok, COUNT(*) AS n FROM t2 GROUP BY tok
        ORDER BY n DESC, tok LIMIT 500
      )
    )
    SELECT t.lang,
           CAST(COUNT(*) AS BIGINT) AS total_tokens,
           CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS oov_tokens,
           ROUND(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS oov_rate
    FROM t2 t LEFT JOIN vc v ON t.tok = v.tok
    GROUP BY t.lang
    """,
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage data card
    (operators/curation.py::vocab_coverage): top-500 corpus vocabulary by
    frequency (ties broken by token — deterministic cut), then per-language
    total/OOV token counts and OOV rate — the number that decides whether
    a tokenizer vocab fits each language. Token counts are one explode +
    map-combinable groupBy; the vocab cut is a top-k heap; membership is
    a broadcast join of the 500-row vocab."""
    from rtdl_spark.operators.curation import vocab_coverage

    d = table(spark, sf_dir, "documents")
    return vocab_coverage(d, 500, group_col="lang")


@query(
    "multimodal_dedup_clusters",
    oracle="""
    WITH RECURSIVE h AS (
      SELECT doc_id,
             list_reduce(list_transform(
               string_split(substring(md5(text), 1, 15), ''),
               c -> CASE WHEN ascii(c) <= 57 THEN CAST(ascii(c) - 48 AS BIGINT)
                         ELSE CAST(ascii(c) - 87 AS BIGINT) END),
               (h, c) -> h * 16 + c) AS phash
      FROM documents
    ), p AS (
      SELECT doc_id + 1000000 AS doc_id,
             xor(phash, 1::BIGINT << CAST(doc_id % 60 AS INT)) AS phash
      FROM h WHERE doc_id % 20 = 0
    ), c AS (
      SELECT doc_id, phash FROM h UNION ALL SELECT doc_id, phash FROM p
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM c a JOIN c b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.phash, b.phash)) <= 3
    ), sym AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b AS src, id_a AS dst FROM pairs
    ), walk(node, comp) AS (
      SELECT src, src FROM sym
      UNION
      SELECT s.dst, w.comp FROM walk w JOIN sym s ON s.src = w.node
    ), assign AS (
      SELECT node, MIN(comp) AS canonical_id FROM walk GROUP BY node
    )
    SELECT node AS media_id, canonical_id,
           COUNT(*) OVER (PARTITION BY canonical_id) AS cluster_size
    FROM assign
    """,
)
def multimodal_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media near-dup PAIRS → delete-list CLUSTERS: the perceptual-hash
    banded pairs (same planted corpus as multimodal_phash_near_dup)
    resolved by distributed connected components — transitive chains of
    bit-flipped variants collapse to one canonical media id, exactly as
    the text pipeline's dedup_cluster_assignment does for MinHash pairs.
    Oracle: the pairs recomputed quadratically + recursive-CTE min-label
    reachability."""
    from pyspark.sql import Window

    from rtdl_spark.operators.components import connected_components
    from rtdl_spark.operators.multimodal import (
        attach_binary_payload,
        perceptual_hash,
        phash_near_dup_pairs,
    )

    d = table(spark, sf_dir, "documents")
    hashed = perceptual_hash(
        attach_binary_payload(d), fake_decode=True
    ).select("doc_id", "phash")
    planted = hashed.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.expr(
            "phash ^ shiftleft(CAST(1 AS BIGINT), CAST(doc_id % 60 AS INT))"
        ).alias("phash"),
    )
    corpus = hashed.unionByName(planted)
    pairs = phash_near_dup_pairs(corpus, n_bands=4, max_hamming=3)
    cc = connected_components(pairs, "id_a", "id_b")
    return cc.select(
        F.col("node").alias("media_id"),
        F.col("component").alias("canonical_id"),
    ).withColumn(
        "cluster_size",
        F.count(F.lit(1)).over(Window.partitionBy("canonical_id")),
    )


@query(
    "ml_pr_curve_quality",
    oracle="""
    WITH s AS (
      SELECT n_chars AS score,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents
    ), agg AS (
      SELECT score, COUNT(*) AS n, SUM(y) AS np FROM s GROUP BY score
    ), c AS (
      SELECT score,
             SUM(n) OVER (ORDER BY score DESC) AS cum_n,
             SUM(np) OVER (ORDER BY score DESC) AS cum_p,
             SUM(np) OVER () AS total_p
      FROM agg
    )
    SELECT score AS threshold,
           ROUND(cum_p * 1.0 / cum_n, 6) AS precision_at,
           ROUND(cum_p * 1.0 / total_p, 6) AS recall_at
    FROM c
    """,
)
def ml_pr_curve_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation at scale: the full precision/recall curve of
    a score (n_chars) against a label (lang='en') — one point per
    distinct threshold. The corpus collapses to per-score counts in a
    map-combinable aggregate FIRST; the cumulative windows then run over
    the tiny distinct-score frame (same aggregate-then-window discipline
    as q2/q15) — a billion-doc eval costs one shuffle on score, never a
    corpus-wide window sort."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    s = d.select(
        F.col("n_chars").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    agg = s.groupBy("score").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("np")
    )
    w = Window.orderBy(F.desc("score"))
    c = agg.select(
        "score",
        F.sum("n").over(w).alias("cum_n"),
        F.sum("np").over(w).alias("cum_p"),
        F.sum("np").over(Window.partitionBy()).alias("total_p"),
    )
    return c.select(
        F.col("score").alias("threshold"),
        F.round(F.col("cum_p") / F.col("cum_n"), 6).alias("precision_at"),
        F.round(F.col("cum_p") / F.col("total_p"), 6).alias("recall_at"),
    )


@query(
    "ml_auc_rank_sum",
    oracle="""
    WITH s AS (
      SELECT n_chars AS score,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents
    ), agg AS (
      SELECT score, COUNT(*) AS n, SUM(y) AS np FROM s GROUP BY score
    ), c AS (
      SELECT score, n, np,
             SUM(n) OVER (ORDER BY score) AS cum_n
      FROM agg
    ), t AS (
      SELECT CAST(SUM(np * (2 * cum_n - n + 1)) AS BIGINT) AS r2,
             CAST(SUM(np) AS BIGINT) AS n_pos,
             CAST(SUM(n - np) AS BIGINT) AS n_neg
      FROM c
    )
    SELECT n_pos, n_neg,
           CAST(FLOOR((r2 - n_pos * (n_pos + 1)) * 1000000.0
                      / (2 * n_pos * n_neg)) AS BIGINT) / 1000000.0 AS auc
    FROM t
    """,
)
def ml_auc_rank_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUC-ROC by the Mann–Whitney rank-sum identity — tie-correct
    (average ranks) and EXACT: the corpus collapses to per-score counts,
    one cumulative window over the tiny distinct-score frame yields
    2·rank-sums as pure integers, and the final ratio is floor-fixed-
    point (both engines floor the identical IEEE double — the ROUND
    half-up trap doesn't apply). The single-number eval for any quality
    classifier at any corpus size: one shuffle on score, no sort of the
    corpus."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    s = d.select(
        F.col("n_chars").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    agg = s.groupBy("score").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("np")
    )
    c = agg.withColumn(
        "cum_n", F.sum("n").over(Window.orderBy("score"))
    )
    t = c.agg(
        F.sum(
            F.col("np") * (2 * F.col("cum_n") - F.col("n") + 1)
        ).cast("bigint").alias("r2"),
        F.sum("np").cast("bigint").alias("n_pos"),
        F.sum(F.col("n") - F.col("np")).cast("bigint").alias("n_neg"),
    )
    return t.select(
        "n_pos",
        "n_neg",
        (
            F.floor(
                (F.col("r2") - F.col("n_pos") * (F.col("n_pos") + 1))
                * 1000000.0
                / (2 * F.col("n_pos") * F.col("n_neg"))
            ).cast("bigint")
            / F.lit(1000000.0)
        ).alias("auc"),
    )


@query(
    "text_weighted_sample",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, n_chars,
             list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(
               string_split(md5('ws:' || CAST(doc_id AS VARCHAR)), ''),
               c -> CAST(ascii(c) AS BIGINT))),
               (a, b) -> (a * 31 + b) % {HASH_P}) AS fold
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, n_chars
    FROM h
    ORDER BY ln((fold + 1.0) / 2147483648.0) / n_chars DESC, doc_id
    LIMIT 40
    """,
)
def text_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (operators/curation.py::weighted_sample, A-ES scheme): 40 documents
    drawn with probability proportional to length — the
    importance-sampling primitive for training-mix construction — as a
    pure function of the id, so every engine and rerun draws the same
    set. TakeOrderedAndProject plan (per-partition heaps), like
    exact_k_sample; the oracle replays hash, key and order in SQL."""
    from rtdl_spark.operators.curation import weighted_sample

    d = table(spark, sf_dir, "documents")
    return weighted_sample(d, "n_chars", 40).select("doc_id", "n_chars")


@query(
    "text_bigram_logprob",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), bg AS (
      SELECT doc_id,
             UNNEST(list_transform(range(1, len(w)),
                                   i -> w[i] || ' ' || w[i+1])) AS bigram,
             UNNEST(list_transform(range(1, len(w)), i -> w[i])) AS ctx
      FROM t WHERE len(w) >= 2
    ), bfreq AS (
      SELECT bigram, COUNT(*) AS cb FROM bg GROUP BY bigram
    ), cfreq AS (
      SELECT ctx, COUNT(*) AS cc FROM bg GROUP BY ctx
    ), vocab AS (
      SELECT COUNT(DISTINCT tok) AS v
      FROM (SELECT UNNEST(w) AS tok FROM t)
    ), scored AS (
      SELECT g.doc_id,
             -log2((f.cb + 1.0) / (c.cc + vocab.v)) AS nll
      FROM bg g JOIN bfreq f USING (bigram) JOIN cfreq c USING (ctx)
      CROSS JOIN vocab
    )
    SELECT doc_id, COUNT(*) AS n_bigrams, ROUND(AVG(nll), 6) AS avg_nll
    FROM scored GROUP BY doc_id
    """,
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model scoring with Laplace smoothing — one step up
    from text_unigram_logprob toward the KenLM-perplexity quality filter:
    p(w2|w1) = (c(w1 w2)+1)/(c(w1 ·)+V), per-doc mean −log2 p.

    Scale shape identical to the unigram scorer: the model (bigram +
    context frequency tables) is vocabulary-sized, so scoring joins the
    exploded corpus against broadcast model tables; the corpus is never
    shuffled by token. Three aggregates total (bigram freq, context freq,
    per-doc score), all map-combinable."""
    d = table(spark, sf_dir, "documents")
    toks = tokens("text")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 2),
        lambda i: F.struct(
            F.concat_ws(
                " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)
            ).alias("bigram"),
            F.element_at(toks, i + 1).alias("ctx"),
        ),
    )
    bg = (
        d.filter(F.size(toks) >= 2)
        .select("doc_id", F.explode(grams).alias("g"))
        .select("doc_id", F.col("g.bigram").alias("bigram"),
                F.col("g.ctx").alias("ctx"))
    )
    bfreq = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("cb"))
    cfreq = bg.groupBy("ctx").agg(F.count(F.lit(1)).alias("cc"))
    vocab = (
        d.select(F.explode(tokens("text")).alias("tok"))
        .agg(F.countDistinct("tok").alias("v"))
    )
    scored = (
        bg.join(F.broadcast(bfreq), "bigram")
        .join(F.broadcast(cfreq), "ctx")
        .join(F.broadcast(vocab))
        .withColumn(
            "nll",
            -F.log2((F.col("cb") + F.lit(1.0)) / (F.col("cc") + F.col("v"))),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("nll"), 6).alias("avg_nll"),
    )


@query(
    "text_index_bm25",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
    ), dl AS (
      SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
    ), stats AS (
      SELECT COUNT(*) AS n_docs,
             AVG(len(string_split(text, ' '))) AS avgdl
      FROM documents
    ), tf AS (
      SELECT doc_id, tok, COUNT(*) AS tf FROM tok
      WHERE tok IN {_BM25_TERMS!r}
      GROUP BY 1, 2
    ), dfreq AS (
      SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
    ), scored AS (
      SELECT tf.doc_id,
             ln((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1)
             * tf.tf * 2.2
             / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl)) AS s
      FROM tf JOIN dfreq USING (tok) JOIN dl USING (doc_id)
      CROSS JOIN stats
    )
    SELECT doc_id, COUNT(*) AS n_terms_hit, ROUND(SUM(s), 5) AS bm25
    FROM scored GROUP BY doc_id
    """,
)
def text_index_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 answered from the PERSISTED inverted index
    (operators/text_index.py) — index-as-layout for text retrieval, the
    keyword twin of sim_index_ivf_pq: postings partitioned by term
    bucket, a query reads only its terms' partitions (static directory
    pruning), df/stats are tiny broadcast sides; the corpus itself is
    never touched at query time. Scores must equal the scan-everything
    text_bm25_search exactly — same oracle."""
    import os
    import shutil
    import tempfile

    from rtdl_spark.operators.text_index import (
        build_inverted_index,
        query_inverted_index,
    )

    d = table(spark, sf_dir, "documents")
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    workdir = tempfile.mkdtemp(prefix="rtdl_text_idx_", dir=shm)
    try:
        idx = os.path.join(workdir, "idx")
        build_inverted_index(d, idx, n_buckets=8)
        out = query_inverted_index(spark, idx, list(_BM25_TERMS), n_buckets=8)
        return local_result(spark, out.collect(), out.schema)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


@query(
    "text_pii_audit",
    oracle=r"""
    WITH t AS (
      SELECT source,
             text || CASE WHEN doc_id % 10 = 0 THEN ' ssn 123-45-6789'
                          WHEN doc_id % 10 = 5 THEN ' tel 212-555-0147'
                          ELSE '' END AS body
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN regexp_matches(body, '\d{3}-\d{2}-\d{4}')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_with_ssn,
           CAST(SUM(CASE WHEN regexp_matches(body,
                                             '[2-9]\d{2}-\d{3}-\d{4}')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_with_phone,
           CAST(SUM(len(regexp_extract_all(body, '\d{3}-\d{2}-\d{4}')))
                AS BIGINT) AS total_ssn_hits
    FROM t GROUP BY source
    """,
)
def text_pii_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII exposure data card: per-source counts of documents containing
    SSN / US-phone patterns (the reference's A23 regexes, pii.py) plus
    total hit counts — the audit you run BEFORE deciding what to mask or
    drop. PII is planted deterministically (the fixture text is clean) to
    exercise the counting path. One scan, one map-combinable aggregate;
    regexp evaluation stays in whole-stage codegen."""
    from rtdl_spark.functions.pii import PHONE_RE, SSN_RE

    d = table(spark, sf_dir, "documents")
    body = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 10 == 0, F.lit(" ssn 123-45-6789"))
        .when(F.col("doc_id") % 10 == 5, F.lit(" tel 212-555-0147"))
        .otherwise(F.lit("")),
    )
    t = d.select("source", body.alias("body"))
    return t.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(F.col("body").rlike(SSN_RE), 1).otherwise(0)
        ).cast("bigint").alias("n_with_ssn"),
        F.sum(
            F.when(F.col("body").rlike(PHONE_RE), 1).otherwise(0)
        ).cast("bigint").alias("n_with_phone"),
        F.sum(F.regexp_count("body", F.lit(SSN_RE)))
        .cast("bigint")
        .alias("total_ssn_hits"),
    )


_URL_RAW_SQL = """
      'HTTPS://' || UPPER(source) || '.Example.COM/Docs/D'
      || CAST(doc_id % 50 AS VARCHAR)
      || CASE CAST(doc_id % 3 AS INT)
           WHEN 0 THEN '?utm_source=feed&id=' || CAST(doc_id % 7 AS VARCHAR)
           WHEN 1 THEN '?id=' || CAST(doc_id % 7 AS VARCHAR)
                       || '&utm_campaign=x'
           ELSE '' END
      || CASE WHEN doc_id % 4 = 0 THEN '#frag' ELSE '' END
"""


@query(
    "text_url_canonical",
    oracle=f"""
    WITH u AS (
      SELECT source, {_URL_RAW_SQL} AS raw FROM documents
    ), c AS (
      SELECT source, raw,
             string_split(raw, '#')[1] AS nofrag
      FROM u
    ), p AS (
      SELECT source, raw,
             string_split(nofrag, '?')[1] AS base,
             CASE WHEN len(string_split(nofrag, '?')) > 1
                  THEN string_split(nofrag, '?')[2] ELSE '' END AS qry
      FROM c
    ), parts AS (
      SELECT source, raw,
             lower(substr(base, 1, strpos(base, '://') - 1)) AS scheme,
             substr(base, strpos(base, '://') + 3) AS rest, qry
      FROM p
    ), hp AS (
      SELECT source, raw, scheme,
             lower(string_split(rest, '/')[1]) AS host,
             regexp_replace(substr(rest, len(string_split(rest, '/')[1]) + 1),
                            '/$', '') AS path,
             list_sort(list_filter(string_split(qry, '&'),
               q -> NOT starts_with(q, 'utm_')
                    AND NOT starts_with(q, 'fbclid=')
                    AND NOT starts_with(q, 'gclid=') AND q <> '')) AS params
      FROM parts
    ), canon AS (
      SELECT source, raw,
             scheme || '://' || host || path ||
             CASE WHEN len(params) > 0
                  THEN '?' || array_to_string(params, '&') ELSE '' END AS cu
      FROM hp
    )
    SELECT source, COUNT(*) AS n_urls,
           COUNT(DISTINCT raw) AS n_distinct_raw,
           COUNT(DISTINCT cu) AS n_distinct_canonical
    FROM canon GROUP BY source
    """,
)
def text_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization (functions/text.py::canonical_url): lowercase
    scheme+host, fragment stripped, tracking params dropped, surviving
    params sorted — the pre-dedup normalization without which raw URL
    variants of one page defeat exact dedup. The card counts distinct
    raw vs canonical URLs per source (the dedup win). URLs are built
    deterministically from the fixture (it has no URL column); the
    oracle replays the whole normalization in SQL. Pure Catalyst
    string/HOF expressions, one aggregate."""
    from rtdl_spark.functions.text import canonical_url

    d = table(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("HTTPS://"), F.upper("source"), F.lit(".Example.COM/Docs/D"),
        (F.col("doc_id") % 50).cast("string"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit("?utm_source=feed&id="),
                (F.col("doc_id") % 7).cast("string"),
            ),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(
                F.lit("?id="),
                (F.col("doc_id") % 7).cast("string"),
                F.lit("&utm_campaign=x"),
            ),
        )
        .otherwise(F.lit("")),
        F.when(F.col("doc_id") % 4 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    u = d.select("source", raw.alias("raw"))
    return u.select(
        "source", "raw", canonical_url("raw").alias("cu")
    ).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct("raw").alias("n_distinct_raw"),
        F.countDistinct("cu").alias("n_distinct_canonical"),
    )
