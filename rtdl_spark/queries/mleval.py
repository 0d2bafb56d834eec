"""Model-evaluation queries (north-star extension, SURVEY.md §2C): the
metric suite a training-data pipeline runs after (or while) fitting its
quality/language/topic classifiers — confusion matrix, per-class
precision/recall/F1, calibration (reliability bins + ECE), and chi-square
keyword association for feature selection.

Every metric follows the aggregate-first discipline of ml_pr_curve_quality:
the corpus collapses to a tiny per-class / per-bin / per-token frame in ONE
map-combinable shuffle, and all ratio math happens on that frame. A
billion-row eval costs the same plan.

Parity contract: counts are exact integers; every ratio is floor-fixed-point
(``FLOOR(num * 1e6 / den) / 1e6``) so both engines floor the identical IEEE
double — no ROUND half-up ambiguity (see NOTES.md, session-4 lesson).

The fixture has no trained model output, so predictions are a deterministic
simulated model: correct on doc_id % 3 != 0, else the lang at index
doc_id % 5 of the sorted label set — exactly reproducible in ANSI SQL, and
irrelevant to the metric plumbing being exercised.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rtdl_spark.catalog import table
from rtdl_spark.functions.text import tokens
from rtdl_spark.queries import query

_LANGS = ("de", "en", "es", "fr", "zh")

# Simulated model head, identical on both engines (pure integer routing).
_PRED_SQL = f"""
      CASE WHEN doc_id % 3 <> 0 THEN lang
           ELSE (ARRAY{list(_LANGS)!r})[CAST(doc_id % 5 AS INT) + 1]
      END
"""


def _pred_col() -> F.Column:
    arr = F.array(*[F.lit(x) for x in _LANGS])
    return F.when(
        F.col("doc_id") % 3 != 0, F.col("lang")
    ).otherwise(F.element_at(arr, (F.col("doc_id") % 5).cast("int") + 1))


def _predictions(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select(
        F.col("lang").alias("actual"), _pred_col().alias("predicted")
    )


@query(
    "ml_confusion_matrix",
    oracle=f"""
    WITH p AS (
      SELECT lang AS actual, {_PRED_SQL} AS predicted FROM documents
    )
    SELECT actual, predicted, COUNT(*) AS n
    FROM p GROUP BY actual, predicted
    """,
)
def ml_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiclass confusion matrix: one map-combinable two-key aggregate —
    the output is |classes|^2 rows regardless of corpus size, so every
    downstream metric (kappa, PRF, error analysis) is driver-cheap."""
    return _predictions(spark, sf_dir).groupBy("actual", "predicted").agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "ml_per_class_prf",
    oracle=f"""
    WITH p AS (
      SELECT lang AS actual, {_PRED_SQL} AS predicted FROM documents
    ), cm AS (
      SELECT actual, predicted, COUNT(*) AS n FROM p GROUP BY 1, 2
    ), act AS (
      SELECT actual AS klass, CAST(SUM(n) AS BIGINT) AS n_actual
      FROM cm GROUP BY 1
    ), prd AS (
      SELECT predicted AS klass, CAST(SUM(n) AS BIGINT) AS n_predicted
      FROM cm GROUP BY 1
    ), tp AS (
      SELECT actual AS klass, CAST(SUM(n) AS BIGINT) AS tp
      FROM cm WHERE actual = predicted GROUP BY 1
    )
    SELECT act.klass,
           COALESCE(tp.tp, 0) AS tp, act.n_actual,
           COALESCE(prd.n_predicted, 0) AS n_predicted,
           CASE WHEN COALESCE(prd.n_predicted, 0) > 0
                THEN FLOOR(COALESCE(tp.tp, 0) * 1000000.0
                           / prd.n_predicted) / 1000000.0 END AS precision_c,
           FLOOR(COALESCE(tp.tp, 0) * 1000000.0 / act.n_actual)
               / 1000000.0 AS recall_c,
           FLOOR(2.0 * COALESCE(tp.tp, 0) * 1000000.0
                 / (act.n_actual + COALESCE(prd.n_predicted, 0)))
               / 1000000.0 AS f1_c
    FROM act LEFT JOIN prd USING (klass) LEFT JOIN tp USING (klass)
    """,
)
def ml_per_class_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision / recall / F1 from the confusion matrix.

    F1 uses the integer identity 2·tp / (n_actual + n_predicted) — a single
    floor-fixed-point ratio, never a float-of-float composition. All three
    joins run over the |classes|-row matrix, not the corpus."""
    cm = _predictions(spark, sf_dir).groupBy("actual", "predicted").agg(
        F.count(F.lit(1)).alias("n")
    )
    act = cm.groupBy(F.col("actual").alias("klass")).agg(
        F.sum("n").alias("n_actual")
    )
    prd = cm.groupBy(F.col("predicted").alias("klass")).agg(
        F.sum("n").alias("n_predicted")
    )
    tp = (
        cm.filter(F.col("actual") == F.col("predicted"))
        .groupBy(F.col("actual").alias("klass"))
        .agg(F.sum("n").alias("tp"))
    )

    def fp6(num: F.Column, den: F.Column) -> F.Column:
        return F.floor(num * F.lit(1000000.0) / den) / F.lit(1000000.0)

    j = (
        act.join(prd, "klass", "left")
        .join(tp, "klass", "left")
        .select(
            "klass",
            F.coalesce("tp", F.lit(0)).alias("tp"),
            "n_actual",
            F.coalesce("n_predicted", F.lit(0)).alias("n_predicted"),
        )
    )
    return j.select(
        "klass", "tp", "n_actual", "n_predicted",
        F.when(
            F.col("n_predicted") > 0, fp6(F.col("tp"), F.col("n_predicted"))
        ).alias("precision_c"),
        fp6(F.col("tp"), F.col("n_actual")).alias("recall_c"),
        fp6(
            F.lit(2.0) * F.col("tp"),
            F.col("n_actual") + F.col("n_predicted"),
        ).alias("f1_c"),
    )


# Synthetic calibrated-ish score in integer millis: exactly reproducible,
# every downstream ratio stays in integer space until the final floor.
_SCORE_MILLI_SQL = "(doc_id * 37 + n_chars) % 1000"


def _score_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select(
        ((F.col("doc_id") * 37 + F.col("n_chars")) % 1000).alias(
            "score_milli"
        ),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )


@query(
    "ml_calibration_bins",
    oracle=f"""
    WITH s AS (
      SELECT {_SCORE_MILLI_SQL} AS score_milli,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents
    )
    SELECT score_milli // 100 AS bin,
           COUNT(*) AS n,
           FLOOR(SUM(score_milli) * 1000000.0 / (1000 * COUNT(*)))
               / 1000000.0 AS mean_confidence,
           FLOOR(SUM(y) * 1000000.0 / COUNT(*)) / 1000000.0 AS frac_positive
    FROM s GROUP BY 1
    """,
)
def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram: decile bins of the (milli-integer) model score
    vs the empirical positive rate. One map-combinable aggregate; the bin
    frame is 10 rows at any corpus size. Confidence stays integer
    (sum of millis) until one final floor-fixed-point divide."""
    s = _score_frame(spark, sf_dir)
    return s.groupBy(
        F.expr("score_milli div 100").alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.floor(
                F.sum("score_milli")
                * F.lit(1000000.0)
                / (F.lit(1000) * F.count(F.lit(1)))
            )
            / F.lit(1000000.0)
        ).alias("mean_confidence"),
        (
            F.floor(F.sum("y") * F.lit(1000000.0) / F.count(F.lit(1)))
            / F.lit(1000000.0)
        ).alias("frac_positive"),
    )


@query(
    "ml_calibration_ece",
    oracle=f"""
    WITH s AS (
      SELECT {_SCORE_MILLI_SQL} AS score_milli,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents
    ), b AS (
      SELECT score_milli // 100 AS bin,
             COUNT(*) AS n,
             CAST(SUM(score_milli) AS BIGINT) AS s_milli,
             CAST(SUM(y) AS BIGINT) AS p
      FROM s GROUP BY 1
    )
    SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
           COUNT(*) AS n_bins,
           FLOOR(SUM(ABS(1000 * p - s_milli)) * 1000000.0
                 / (1000 * SUM(n))) / 1000000.0 AS ece
    FROM b
    """,
)
def ml_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected calibration error as ONE exact integer ratio.

    Identity: ECE = sum_b (n_b/N)·|acc_b − conf_b|
                  = sum_b |1000·P_b − S_b| / (1000·N)
    with P_b = positives and S_b = sum of milli-scores in bin b — the
    per-bin divisions cancel, so the whole metric is integer arithmetic
    until a single final floor-fixed-point divide (engine-exact)."""
    s = _score_frame(spark, sf_dir)
    b = s.groupBy(F.expr("score_milli div 100").alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("score_milli").alias("s_milli"),
        F.sum("y").alias("p"),
    )
    return b.agg(
        F.sum("n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_bins"),
        (
            F.floor(
                F.sum(F.abs(F.lit(1000) * F.col("p") - F.col("s_milli")))
                * F.lit(1000000.0)
                / (F.lit(1000) * F.sum("n"))
            )
            / F.lit(1000000.0)
        ).alias("ece"),
    )


@query(
    "ml_chi2_keywords",
    oracle="""
    WITH dt AS (
      SELECT DISTINCT doc_id,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
             UNNEST(string_split(text, ' ')) AS tok
      FROM documents
    ), tot AS (
      SELECT CAST(SUM(y) AS DOUBLE) AS n_pos,
             CAST(COUNT(DISTINCT doc_id) - SUM(y) AS DOUBLE) AS n_neg
      FROM (SELECT DISTINCT doc_id, y FROM dt)
    ), tokc AS (
      SELECT tok, CAST(SUM(y) AS DOUBLE) AS a,
             CAST(COUNT(*) - SUM(y) AS DOUBLE) AS b
      FROM dt GROUP BY tok
    ), x AS (
      SELECT tok, CAST(a AS BIGINT) AS df_pos, CAST(b AS BIGINT) AS df_neg,
             ROUND(
               ((n_pos + n_neg)
                * ((a * (n_neg - b) - b * (n_pos - a))
                   * (a * (n_neg - b) - b * (n_pos - a))))
               / (((a + b) * ((n_pos - a) + (n_neg - b)))
                  * (n_pos * n_neg)), 6) AS chi2
      FROM tokc CROSS JOIN tot
      WHERE (a + b) < (n_pos + n_neg)
    )
    SELECT tok, df_pos, df_neg, chi2
    FROM x
    ORDER BY chi2 DESC, tok
    LIMIT 15
    """,
)
def ml_chi2_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square token–label association (feature selection for quality /
    language classifiers): document frequency per (token, label) in one
    vocabulary-sized aggregate, the 2×2 statistic from exact integer counts
    (cast to double once, identical operation order on both engines), top-k
    via TakeOrdered on the rounded statistic.

    Scale shape: explode feeds partial aggregation, so the shuffle carries
    vocabulary cardinality, not token volume; the chi2 math runs on the
    vocab frame; LIMIT compiles to per-partition heaps (no global sort).

    Note (a+b)(c+d)(a+c)(b+d) is factored as ((a+b)(c+d))·(n_pos·n_neg)
    since a+c = n_pos and b+d = n_neg by construction here.
    """
    d = table(spark, sf_dir, "documents")
    dt = d.select(
        "doc_id",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        F.explode(F.array_distinct(tokens("text"))).alias("tok"),
    )
    tot = d.agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("double")
        .alias("n_pos"),
        F.sum(F.when(F.col("lang") == "en", 0).otherwise(1))
        .cast("double")
        .alias("n_neg"),
    )
    tokc = dt.groupBy("tok").agg(
        F.sum("y").cast("double").alias("a"),
        (F.count(F.lit(1)) - F.sum("y")).cast("double").alias("b"),
    )
    a, b = F.col("a"), F.col("b")
    n_pos, n_neg = F.col("n_pos"), F.col("n_neg")
    delta = a * (n_neg - b) - b * (n_pos - a)
    chi2 = ((n_pos + n_neg) * (delta * delta)) / (
        ((a + b) * ((n_pos - a) + (n_neg - b))) * (n_pos * n_neg)
    )
    x = (
        tokc.join(F.broadcast(tot))
        .filter((a + b) < (n_pos + n_neg))
        .select(
            "tok",
            a.cast("bigint").alias("df_pos"),
            b.cast("bigint").alias("df_neg"),
            F.round(chi2, 6).alias("chi2"),
        )
    )
    return x.orderBy(F.desc("chi2"), F.asc("tok")).limit(15)
