"""Corpus curation — the composed LLM-training-data pipeline
(quality filter → exact dedup → fingerprint near-dedup), as one operator.

This is the flow a user of this engine runs over a raw 100 TB text crawl:
score cheap quality signals, drop junk, then remove duplicates in two
passes of increasing softness — exact normalized text, then
order/repetition-insensitive fingerprints (MinHash/SimHash slot in as
stage 3 for true near-dups; they're separate operators so their cost is
opt-in). Every stage is a flag column, not a filter, so the pipeline's
funnel (how many docs each stage kept) is one aggregation away — the
number a data curator actually reports.

Scale shape: quality signals are narrow expression work; each dedup stage
is one hash-partitioned window on its key (normalized text / fingerprint),
keeping the lowest doc_id as canonical — the standard deterministic
keeper rule. Nothing here is quadratic; near-dup candidate generation
stays in the LSH operator where blocking bounds it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rtdl_spark.functions.text import (
    distinct_token_ratio,
    fingerprint,
    stopword_ratio,
    token_count,
)


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    max_stopword_ratio: float = 0.5,
    min_distinct_ratio: float = 0.3,
) -> DataFrame:
    """Annotate each document with its curation verdict.

    Output = input + columns:
      n_tokens, stop_ratio, distinct_ratio  — quality signals
      pass_quality                          — quality gate verdict
      is_exact_canonical                    — first (lowest id) among docs
                                              with identical normalized text,
                                              quality survivors only
      is_fp_canonical                       — first among docs sharing a
                                              token-set fingerprint, exact
                                              survivors only
      kept                                  — final verdict
    """
    t = F.col(text_col)
    scored = docs.select(
        "*",
        token_count(t).alias("n_tokens"),
        stopword_ratio(t).alias("stop_ratio"),
        distinct_token_ratio(t).alias("distinct_ratio"),
    ).withColumn(
        "pass_quality",
        (F.col("n_tokens") >= min_tokens)
        & (F.col("stop_ratio") <= max_stopword_ratio)
        & (F.col("distinct_ratio") >= min_distinct_ratio),
    )

    norm = F.lower(F.trim(t))
    w_exact = Window.partitionBy(
        F.when(F.col("pass_quality"), norm)
    ).orderBy(id_col)
    scored = scored.withColumn(
        "is_exact_canonical",
        F.col("pass_quality") & (F.row_number().over(w_exact) == 1),
    )

    w_fp = Window.partitionBy(
        F.when(F.col("is_exact_canonical"), fingerprint(t))
    ).orderBy(id_col)
    scored = scored.withColumn(
        "is_fp_canonical",
        F.col("is_exact_canonical") & (F.row_number().over(w_fp) == 1),
    )
    return scored.withColumn("kept", F.col("is_fp_canonical"))


def stratified_take(
    df: DataFrame,
    group_cols: list[str],
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-group sample: exactly min(k, group size) rows per
    group, chosen by ranking on md5(id) — a fixed pseudo-random order
    that every engine computes identically, so the 'sample' is stable
    across runs, clusters, and the DuckDB oracle (rand()-based sampling
    is none of those). The training-data mixture primitive: cap each
    source/language bucket at k docs.

    One window shuffle on the group key; at skew (one giant group) the
    rank is computed per-partition after the hash partitioning, same as
    any top-k-per-group."""
    w = Window.partitionBy(*group_cols).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap — the
    context-window preparation step of a training pipeline. Chunk i
    covers tokens [1 + i·(chunk−overlap), … + chunk); the final chunk may
    be shorter; empty documents yield no chunks.

    Pure expression work (sequence → slice → posexplode): a narrow map
    whose output multiplies rows by ~len/(chunk−overlap) — do it AFTER
    quality/dedup filters so the blow-up applies only to survivors (same
    placement rule as multimodal frame sampling)."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size(toks) - overlap, F.lit(1)),
        F.lit(step),
    )
    chunks = F.transform(
        starts, lambda s: F.concat_ws(" ", F.slice(toks, s, chunk_tokens))
    )
    return (
        df.filter(F.size(toks) > 0)
        .select(
            F.col(id_col),
            F.posexplode(chunks).alias("chunk_id", "chunk_text"),
        )
    )


def pack_sequences(
    df: DataFrame,
    budget: int = 256,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Training-sequence packing: assign documents to fixed-token-budget
    sequences by deterministic next-fit — walk each shard's documents in
    id order, start a new sequence whenever the current one can't take
    the next document. The step after chunking/curation that decides
    what actually lands in each training example; fill accounting is the
    input to padding-waste dashboards.

    Packing is inherently sequential, so the corpus is sharded first
    (``id % n_shards`` — deterministic, not hash-seeded) and packed
    per-shard: shards run in parallel, each shard's recurrence runs once
    inside an Arrow-batched applyInPandas. At 100 TB, n_shards scales
    with the cluster and sequences are named (shard, seq_idx) — no
    global sequential bottleneck, no driver loop. A document longer than
    the budget gets a sequence of its own (next-fit never splits).

    Returns one row per document: id, n_tokens, shard, seq_idx (0-based
    within shard), seq_fill (the sequence's total tokens after packing —
    identical on every member row).
    """
    import pandas as pd

    toks = F.split(F.col(text_col), " ")
    base = df.select(
        F.col(id_col).alias("_id"),
        F.coalesce(F.size(toks), F.lit(0)).alias("n_tokens"),
    ).withColumn("shard", (F.col("_id") % n_shards).cast("int"))

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_id").reset_index(drop=True)
        seq_idx, fill = [], []
        cur, cur_fill = 0, 0
        for n in pdf["n_tokens"]:
            n = int(n)
            if cur_fill > 0 and cur_fill + n > budget:
                cur += 1
                cur_fill = 0
            cur_fill += n
            seq_idx.append(cur)
            fill.append(cur_fill)
        pdf["seq_idx"] = seq_idx
        # a sequence's fill is its FINAL total; backfill per sequence
        pdf["seq_fill"] = (
            pd.Series(fill).groupby(pd.Series(seq_idx)).transform("max")
        )
        return pdf

    out_schema = "_id long, n_tokens int, shard int, seq_idx int, seq_fill int"
    return (
        base.groupBy("shard")
        .applyInPandas(pack, out_schema)
        .select(
            F.col("_id").alias(id_col),
            "n_tokens",
            "shard",
            "seq_idx",
            "seq_fill",
        )
    )


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: drop every training document sharing any
    word ``n``-gram with the evaluation set — the overlap rule used to
    keep test sets out of training corpora (GPT-3 appendix C / Gopher
    style, with n set by corpus tokenization; docs shorter than n tokens
    can't collide and always survive).

    Scale shape mirrors dedup_against_corpus's winnow path: both sides
    reduce to narrow (id, ngram-hash) longs via the deterministic
    polynomial hash (functions.text.token_hash — DuckDB-reproducible, so
    the whole rule is oracle-checkable); the benchmark's distinct hash set
    — small by definition (eval sets are thousands of docs, not billions)
    — broadcast-joins against the training side, and survivors come back
    through one anti join on id. The training corpus is never shuffled by
    ngram, only scanned.

    Returns the surviving ``train`` rows unchanged."""
    from rtdl_spark.functions.text import shingles, token_hash

    grams = lambda df: df.select(  # noqa: E731
        F.col(id_col).alias("_id"),
        F.explode(
            F.transform(shingles(F.col(text_col), n), token_hash)
        ).alias("_g"),
    )
    bench_grams = F.broadcast(grams(benchmark).select("_g").distinct())
    hit_ids = grams(train).join(bench_grams, "_g").select("_id").distinct()
    return train.join(hit_ids, F.col(id_col) == F.col("_id"), "left_anti")


def linear_quality_score(
    docs: DataFrame,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Hashed-feature linear scoring — the quality-classifier serving
    shape (GPT-3/CCNet style: a linear model over hashed bag-of-words
    decides what enters the corpus). This implements the SCORING path;
    weights come from an externally trained model in production and are
    derived here deterministically from the bucket id (an LCG step) so
    the whole pipeline is engine-reproducible and oracle-checkable.

    Exactness design: weights are INTEGERS and the per-doc reduction is
    an integer SUM — exact in any partition/addition order (a float sum
    would be order-dependent across partitions and could never
    hash-match an oracle). The single division happens once at the end,
    rounded.

    Scale shape: tokenize → hash to ``n_buckets`` → weight lookup is
    pure expression work (no weight-table join at all — the "model" is a
    formula; a real weight vector would broadcast-join on bucket id);
    one map-combinable groupBy(id) sums the score. One scan, one
    shuffle.

    Returns: id, n_tokens, score (mean bucket weight in [-0.5, 0.5),
    rounded to 6; 0.0 for empty docs).
    """
    from rtdl_spark.functions.text import token_hash, tokens

    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.explode_outer(tokens(F.col(text_col))).alias("_tok"),
    )
    bucket = token_hash(F.col("_tok")) % n_buckets
    w = (bucket * F.lit(1103515245) + F.lit(12345)) % F.lit(100000) - F.lit(
        50000
    )
    per_doc = toks.withColumn(
        "_w", F.when(F.col("_tok").isNotNull(), w)
    ).groupBy("_id").agg(
        F.count(F.col("_tok")).alias("n_tokens"),
        F.sum("_w").alias("_sw"),
    )
    # fixed-point via FLOOR, not ROUND(…, 6): both engines compute the
    # IDENTICAL IEEE double for _sw*10/n (exact integers in), and floor of
    # that double is unambiguous — whereas ROUND half-up disagrees across
    # engines when the true rational lands on .5 at the 6th decimal
    # (Spark rounds the shortest decimal repr, DuckDB the binary value;
    # a real sf0.1 doc hit this)
    return per_doc.select(
        F.col("_id").alias(id_col),
        "n_tokens",
        (
            F.when(
                F.col("n_tokens") > 0,
                F.floor(F.col("_sw") * 10.0 / F.col("n_tokens")),
            )
            .otherwise(F.lit(0))
            .cast("bigint")
            / F.lit(1000000.0)
        ).alias("score"),
    )


def contamination_overlap(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Graded contamination measurement: for every training document, the
    FRACTION of its distinct word ``n``-grams that appear anywhere in the
    benchmark set (WIMBD/data-audit style), rather than decontaminate()'s
    binary any-overlap verdict — the number you threshold, report, and
    trend per corpus snapshot.

    Same scale shape as decontaminate: both sides reduce to (id,
    ngram-hash) longs, the benchmark's distinct hash set broadcasts, the
    training corpus is scanned once and never shuffled by n-gram; the
    per-doc counts are one map-combinable groupBy on the id.

    Returns: id, n_grams (distinct n-grams in the doc), n_shared,
    overlap_frac (0.0 for docs shorter than n tokens — nothing to
    collide). Every train row appears exactly once.
    """
    from rtdl_spark.functions.text import shingles, token_hash

    grams = lambda df: df.select(  # noqa: E731
        F.col(id_col).alias("_id"),
        F.explode_outer(
            F.array_distinct(
                F.transform(shingles(F.col(text_col), n), token_hash)
            )
        ).alias("_g"),
    )
    bench_grams = (
        F.broadcast(grams(benchmark).select("_g").distinct())
        .withColumn("_hit", F.lit(1))
    )
    per_doc = (
        grams(train)
        .join(bench_grams, "_g", "left")
        .groupBy("_id")
        .agg(
            F.count(F.col("_g")).alias("n_grams"),
            F.count(F.col("_hit")).alias("n_shared"),
        )
    )
    return per_doc.select(
        F.col("_id").alias(id_col),
        "n_grams",
        "n_shared",
        F.round(
            F.when(
                F.col("n_grams") > 0, F.col("n_shared") / F.col("n_grams")
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("overlap_frac"),
    )


def mixture_sample(
    df: DataFrame,
    key_col: str,
    budget: int,
    weights: dict[str, float],
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic mixture sampling: draw ~``budget`` rows following the
    per-key ``weights`` (a training-mix recipe like {'web': .6, 'code':
    .4}). Per key the cap is floor(budget·weight); rows are chosen in
    md5(id) order (engine-independent — see stratified_take); keys
    outside the recipe contribute nothing. Under-populated keys yield
    what they have — by design the recipe is a cap, not an upsampler
    (repeat-sampling a scarce source is a curriculum decision, not a
    sampling primitive).

    Caps are rounded HALF-UP (floor(x+0.5)), not truncated and not
    python-banker's-rounded: int() would turn the float epsilon in
    60·(1/3) into an off-by-one cap, and round() differs from the
    SQL/DuckDB half-up convention exactly when equal-sized keys put
    budget·w on .5 (e.g. 90 across 20 uniform sources → 4.5 → SQL says
    5, banker's says 4 — a real mismatch caught by the oracle gate)."""
    import math

    total = sum(weights.values())
    caps = {
        k: math.floor(budget * w / total + 0.5) for k, w in weights.items()
    }
    cap_expr = None
    for k, cap in caps.items():
        branch = F.when(F.col(key_col) == k, F.lit(cap))
        cap_expr = branch if cap_expr is None else cap_expr.when(
            F.col(key_col) == k, F.lit(cap)
        )
    cap_expr = cap_expr.otherwise(F.lit(0))
    w = Window.partitionBy(key_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= cap_expr)
        .drop("_rk")
    )


def temperature_weights(
    df: DataFrame, key_col: str, alpha: float = 0.5
) -> dict[str, float]:
    """Temperature-based mixture weights: w_k ∝ n_k^alpha — the standard
    multilingual/multi-source rebalancing rule (alpha=1 keeps natural
    proportions, alpha→0 approaches uniform; XLM-R used 0.3/0.7-style
    exponents). One tiny aggregate; feed the result to mixture_sample:

        mixture_sample(df, key, budget, temperature_weights(df, key, .5))

    Eager by design (the weights ARE driver-side recipe data)."""
    counts = {
        r[0]: r[1]
        for r in df.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    powered = {k: float(n) ** alpha for k, n in counts.items()}
    total = sum(powered.values())
    return {k: v / total for k, v in powered.items()}


def domain_policy(
    df: DataFrame,
    url_col: str,
    blocklist: list[str],
    per_domain_cap: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Crawl-corpus domain policy: extract the host from ``url_col``,
    drop blocklisted domains, and cap every surviving domain at
    ``per_domain_cap`` documents — the Common-Crawl-style rule that stops
    a handful of giant sites from dominating a training mix.

    Output = input + ``host`` + verdict columns (house style: flags, not
    silent drops, so the funnel is one aggregation away):
      is_blocked    — host appears in the blocklist
      domain_rank   — deterministic md5(id) rank within the host,
                      unblocked rows only
      kept          — not blocked and rank <= cap

    Scale shape: the blocklist is a literal broadcast (`isin` compiles to
    a hash-set probe, no join when the list is small; swap in a broadcast
    anti-join for million-entry lists); the cap is ONE window shuffle on
    host — the same shape as stratified_take, so a skewed giant domain
    parallelizes across its hash partition like any top-k-per-group.
    parse_url is a JVM built-in, so host extraction stays in codegen.
    """
    host = F.parse_url(F.col(url_col), F.lit("HOST"))
    out = df.withColumn("host", host).withColumn(
        "is_blocked", F.col("host").isin(blocklist)
    )
    w = Window.partitionBy(
        F.when(~F.col("is_blocked"), F.col("host"))
    ).orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
    out = out.withColumn(
        "domain_rank",
        F.when(~F.col("is_blocked"), F.row_number().over(w)),
    )
    return out.withColumn(
        "kept",
        (~F.col("is_blocked")) & (F.col("domain_rank") <= per_domain_cap),
    )


def exact_k_sample(df: DataFrame, k: int, id_col: str = "doc_id") -> DataFrame:
    """Deterministic exact-k uniform sample of a whole corpus: the k rows
    with the smallest md5(id) — a fixed pseudo-random order every engine
    computes identically (TABLESAMPLE/rand() give neither exact k nor
    stability). The eval-subset / human-inspection primitive.

    Scale shape: orderBy + limit compiles to TakeOrderedAndProject —
    each partition keeps a k-row heap (O(n log k) work, O(k) output per
    partition), then the driver merges P·k rows. There is NO global sort
    and NO single-partition exchange; pinned by the plan test."""
    return df.orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col)).limit(k)


def assign_sequential_ids(
    df: DataFrame,
    order_col: str | list[str],
    id_name: str = "row_id",
    bucket_width: int | None = None,
    n_buckets: int = 1024,
    bucket_by=None,
) -> DataFrame:
    """Contiguous 1..N row ids in ``order_col`` order — the stable
    document-id assignment a training pipeline needs — WITHOUT the naive
    ROW_NUMBER() OVER (ORDER BY ...) plan, whose empty-PARTITION-BY window
    funnels the entire table through ONE partition (the canonical
    100 TB-killer; at sf100 that is a single task sorting every row).

    Two-pass bucket-offset scheme, all Catalyst:
      1. a column-pruned min/max scan of ``order_col`` fixes equi-width
         bucket edges (deterministic, data-independent within the range);
      2. per-bucket counts (tiny: n_buckets rows) get cumulative offsets
         via a window over the AGGREGATED frame only, broadcast-joined
         back; the final id = bucket offset + intra-bucket row_number,
         one hash shuffle on the bucket key with parallelism n_buckets.

    Requires a numeric/orderable ``order_col`` with unique values (ties
    within a bucket break identically to the oracle via the column
    itself; uniqueness is the caller's contract, same as ROW_NUMBER
    determinism). Result equals ROW_NUMBER() OVER (ORDER BY order_col)
    exactly — oracle-checked.

    ``bucket_by`` overrides the equi-width numeric scheme with an explicit
    bucket expression (no pre-scan). Caller's contract: the bucket value
    must be monotone in ``order_col`` across buckets (rows in a lower
    bucket sort before every row of a higher bucket) — e.g. a fixed-width
    hex-prefix integer of a string order key, whose integer order equals
    the string's lexicographic order.

    ``order_col`` may be a list: bucketing (and the uniqueness contract)
    applies to the FIRST column; the rest are tiebreaks inside the
    bucket-local window (ties of the first column always share a bucket,
    so the combined order is global)."""
    from pyspark.sql.functions import broadcast

    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    key = F.col(order_cols[0])
    if bucket_by is not None:
        bucket = bucket_by
    elif bucket_width is None:
        lo, hi = df.agg(F.min(key), F.max(key)).first()
        if lo is None:
            return df.withColumn(id_name, F.lit(None).cast("bigint"))
        span = int(hi) - int(lo) + 1  # python ints: no overflow
        bucket_width = max(1, -(-span // n_buckets))
    if bucket_by is None:
        # floor-divide in DECIMAL: exact and monotone for the FULL int64
        # range (a bigint `key - min` subtraction overflows under ANSI when
        # keys span more than half the range, e.g. xxhash64 output)
        bucket = F.floor(
            key.cast("decimal(38,0)") / F.lit(bucket_width).cast("decimal(38,0)")
        ).cast("bigint")
    with_b = df.withColumn("_bkt", bucket)
    counts = with_b.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_n"))
    offsets = counts.withColumn(
        "_offset",
        F.coalesce(
            F.sum("_n").over(
                Window.orderBy("_bkt").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("_bkt", "_offset")
    w_local = Window.partitionBy("_bkt").orderBy(*order_cols)
    return (
        with_b.join(broadcast(offsets), "_bkt")
        .withColumn(
            id_name, (F.col("_offset") + F.row_number().over(w_local)).cast("bigint")
        )
        .drop("_bkt", "_offset")
    )


def adaptive_quality_threshold(
    df: DataFrame,
    group_col: str,
    score_col: str,
    q: float = 0.2,
    approx: bool = False,
) -> DataFrame:
    """Per-group adaptive quality gate: keep rows scoring at or above
    their OWN group's q-quantile — thresholds adapt to each language/
    source instead of one global constant, so an English-calibrated
    cutoff doesn't wipe out low-resource languages (the CCNet/fineweb
    per-language filtering rule).

    Output = input + ``q_threshold`` + ``kept`` (flags, house style).

    Scale shape: the threshold is one aggregate per group joined back via
    broadcast (group count is small: languages/sources) — never a per-row
    window sort of the corpus. Exact ``percentile`` buffers each group's
    scores in the aggregate state (fine to ~10⁸ rows/group); at true
    100 TB scale pass ``approx=True`` for the mergeable fixed-memory
    ``percentile_approx`` sketch — same plan shape, bounded state."""
    pct = (
        F.percentile_approx(score_col, q)
        if approx
        else F.percentile(score_col, q)
    )
    thr = df.groupBy(group_col).agg(pct.alias("q_threshold"))
    return df.join(F.broadcast(thr), group_col).withColumn(
        "kept", F.col(score_col) >= F.col("q_threshold")
    )


def negative_samples(
    df: DataFrame,
    id_col: str = "doc_id",
    k: int = 3,
    within: str | None = None,
) -> DataFrame:
    """Deterministic corpus-wide negative sampling for contrastive
    training: each anchor row gets ``k`` negatives — the rows at
    positions pos+1..pos+k (circular) of the md5(id) permutation of the
    corpus. The md5 order is a high-quality fixed shuffle (the house
    standard for engine-independent pseudo-randomness), so consecutive
    positions are unrelated documents, yet every engine — and every
    rerun — draws the identical sample. No anchor can draw itself
    (offsets are 1..k < N) and an anchor's negatives are distinct.

    Output: (anchor_id, j, negative_id), one row per anchor × offset.

    Scale shape: positions come from assign_sequential_ids bucketed on
    the md5 hex prefix (integer order of a fixed-width lowercase-hex
    prefix == lexicographic order of the full string, so buckets are
    monotone — no numeric pre-scan, no single-partition window); the
    fetch is ONE equi hash-join on the position integer after a
    k-element posexplode. Corpus size N is one count() (driver scalar,
    the same metadata pass any modulo-based sampler needs).

    ``within`` draws negatives from the anchor's OWN group (e.g. label
    or language) — the hard-negative recipe for contrastive training
    (in-class negatives are the informative ones). Positions become a
    per-group window (one hash shuffle on the group key — no bucket
    machinery needed, the group IS the partition), k clamps to each
    group's size - 1, and the fetch joins on (group, position)."""
    md5_key = F.md5(F.col(id_col).cast("string"))
    if within is not None:
        w = Window.partitionBy(within).orderBy(md5_key, F.col(id_col))
        perm = df.select(F.col(id_col), F.col(within)).withColumn(
            "_pos", F.row_number().over(w)
        ).withColumn(
            "_n", F.count(F.lit(1)).over(Window.partitionBy(within))
        )
        anchors = (
            perm.select(
                F.col(id_col).alias("anchor_id"),
                F.col(within),
                "_pos",
                "_n",
                F.explode(
                    F.array(*[F.lit(j) for j in range(1, k + 1)])
                ).alias("j"),
            )
            .filter(F.col("j") <= F.col("_n") - 1)
            .withColumn(
                "_target", ((F.col("_pos") - 1 + F.col("j")) % F.col("_n")) + 1
            )
        )
        lookup = perm.select(
            F.col(within),
            F.col("_pos").alias("_target"),
            F.col(id_col).alias("negative_id"),
        )
        return anchors.join(lookup, [within, "_target"]).select(
            "anchor_id", within, "j", "negative_id"
        )
    keyed = df.select(F.col(id_col), md5_key.alias("_m"))
    perm = assign_sequential_ids(
        keyed,
        "_m",
        id_name="_pos",
        bucket_by=F.conv(F.substring(F.col("_m"), 1, 4), 16, 10).cast("bigint"),
    )
    n = perm.count()
    if n <= 1:
        return df.sparkSession.createDataFrame(
            [], f"anchor_id {dict(df.dtypes)[id_col]}, j int, negative_id "
            f"{dict(df.dtypes)[id_col]}"
        )
    anchors = perm.select(
        F.col(id_col).alias("anchor_id"),
        F.col("_pos"),
        F.explode(F.array(*[F.lit(j) for j in range(1, min(k, n - 1) + 1)])).alias(
            "j"
        ),
    ).withColumn("_target", ((F.col("_pos") - 1 + F.col("j")) % n) + 1)
    lookup = perm.select(
        F.col("_pos").alias("_target"), F.col(id_col).alias("negative_id")
    )
    return anchors.join(lookup, "_target").select("anchor_id", "j", "negative_id")


def vocab_coverage(
    df: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    group_col: str | None = None,
) -> DataFrame:
    """Tokenizer-prep data card: build the corpus's top-``vocab_size``
    token vocabulary (by total frequency, ties broken by token — fully
    deterministic) and report per-``group_col`` coverage: total token
    occurrences, how many fall outside the vocabulary, and the OOV rate.
    The number that decides whether a vocab/tokenizer fits a corpus —
    per-language, so a high-resource language can't mask another's 40%
    OOV.

    Scale shape: token counts are one explode + map-combinable groupBy;
    the vocab cut is a TakeOrdered over the token-count frame (top-k
    heap, no global sort); membership is a broadcast left join of the
    vocab (vocab_size rows) onto per-group token counts — the corpus
    text is scanned once and never re-shuffled on anything but the token
    key."""
    toks = df.select(
        *( [F.col(group_col)] if group_col else [] ),
        F.explode(F.split(F.col(text_col), " ")).alias("_tok"),
    ).filter(F.col("_tok") != "")
    vocab = (
        toks.groupBy("_tok")
        .agg(F.count(F.lit(1)).alias("_n"))
        .orderBy(F.desc("_n"), F.asc("_tok"))
        .limit(vocab_size)
        .select("_tok", F.lit(True).alias("_in_vocab"))
    )
    gcols = [group_col] if group_col else []
    per_group_tok = toks.groupBy(*gcols, "_tok").agg(
        F.count(F.lit(1)).alias("_n")
    )
    joined = per_group_tok.join(F.broadcast(vocab), "_tok", "left")
    return joined.groupBy(*gcols).agg(
        F.sum("_n").alias("total_tokens"),
        F.sum(F.when(F.col("_in_vocab").isNull(), F.col("_n")).otherwise(0)).alias(
            "oov_tokens"
        ),
        F.round(
            F.sum(F.when(F.col("_in_vocab").isNull(), F.col("_n")).otherwise(0))
            / F.sum("_n"),
            6,
        ).alias("oov_rate"),
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str | Column,
    k: int,
    id_col: str = "doc_id",
    salt: str = "ws:",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (A-ES /
    Efraimidis–Spirtsis): each row draws the pseudo-uniform
    u = (fold_hash(md5(salt || id)) + 1) / 2^31 and keeps key =
    ln(u) / weight; the k LARGEST keys are the sample. P(row i first) =
    w_i / sum(w) exactly as with u^(1/w) (ln is monotone), but the whole
    draw is a pure function of the id — engine- and rerun-identical, where
    rand()-based sampling is neither.

    Scale shape: the key is a narrow map; orderBy+limit compiles to
    TakeOrderedAndProject (per-partition k-heaps, no global sort, no
    single-partition exchange) — same plan as exact_k_sample.
    Zero/negative weights are excluded (their keys are undefined)."""
    from rtdl_spark.functions.text import token_hash

    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    h = token_hash(
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    )
    u = (h.cast("double") + F.lit(1.0)) / F.lit(2147483648.0)
    key = F.log(u) / w.cast("double")
    return (
        df.filter(w > 0)
        .withColumn("_ws_key", key)
        .orderBy(F.desc("_ws_key"), F.col(id_col))
        .limit(k)
        .drop("_ws_key")
    )
