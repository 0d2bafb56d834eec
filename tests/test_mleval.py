"""Unit tests for the model-evaluation query family (queries/mleval.py)
beyond the oracle parity that test_queries_oracle.py already enforces:
re-derive each metric independently (pandas/numpy) from the raw frame."""

from __future__ import annotations

import math

import pytest


def _preds(spark, sf_dir):
    from rtdl_spark.queries.mleval import _predictions

    return _predictions(spark, sf_dir).toPandas()


def test_confusion_matrix_totals(spark, sf_dir):
    from rtdl_spark.queries import all_queries

    cm = all_queries()["ml_confusion_matrix"](spark, sf_dir).toPandas()
    p = _preds(spark, sf_dir)
    assert cm["n"].sum() == len(p)
    # diagonal = rows where the simulated model is forced correct or the
    # mod-5 head happens to match
    diag = cm[cm.actual == cm.predicted]["n"].sum()
    assert diag == (p.actual == p.predicted).sum()


def test_per_class_prf_identities(spark, sf_dir):
    from rtdl_spark.queries import all_queries

    prf = all_queries()["ml_per_class_prf"](spark, sf_dir).toPandas()
    p = _preds(spark, sf_dir)
    for row in prf.itertuples():
        tp = ((p.actual == row.klass) & (p.predicted == row.klass)).sum()
        na = (p.actual == row.klass).sum()
        np_ = (p.predicted == row.klass).sum()
        assert row.tp == tp and row.n_actual == na and row.n_predicted == np_
        assert row.precision_c == math.floor(tp * 1e6 / np_) / 1e6
        assert row.recall_c == math.floor(tp * 1e6 / na) / 1e6
        # F1 identity: 2tp/(na+np) == harmonic mean of P and R (unfloored)
        assert row.f1_c == math.floor(2.0 * tp * 1e6 / (na + np_)) / 1e6
        pr, rc = tp / np_, tp / na
        if pr + rc > 0:
            assert abs(row.f1_c - 2 * pr * rc / (pr + rc)) < 2e-6


def test_calibration_ece_matches_bin_frame(spark, sf_dir):
    """ECE from the one-ratio identity must equal the weighted |acc−conf|
    sum over the (exact, unfloored) bin frame."""
    from rtdl_spark.queries import all_queries
    from rtdl_spark.queries.mleval import _score_frame

    s = _score_frame(spark, sf_dir).toPandas()
    s["bin"] = s.score_milli // 100
    g = s.groupby("bin").agg(n=("y", "size"), p=("y", "sum"),
                             sm=("score_milli", "sum"))
    exact = sum(abs(1000 * r.p - r.sm) for r in g.itertuples()) / (
        1000 * len(s)
    )
    ece = all_queries()["ml_calibration_ece"](spark, sf_dir).toPandas()
    assert ece.n_rows[0] == len(s) and ece.n_bins[0] == len(g)
    assert ece.ece[0] == math.floor(exact * 1e6) / 1e6


def test_chi2_known_counts(spark, sf_dir):
    """Recompute chi² for the returned tokens from raw document
    frequencies; the query's statistic must match to the rounding scale."""
    import pandas as pd

    from rtdl_spark.queries import all_queries

    top = all_queries()["ml_chi2_keywords"](spark, sf_dir).toPandas()
    assert len(top) == 15
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    n_pos = (docs.lang == "en").sum()
    n_neg = (docs.lang != "en").sum()
    toksets = docs.text.str.split(" ").map(set)
    for row in top.itertuples():
        has = toksets.map(lambda s, t=row.tok: t in s)
        a = (has & (docs.lang == "en")).sum()
        b = (has & (docs.lang != "en")).sum()
        assert a == row.df_pos and b == row.df_neg
        n = n_pos + n_neg
        delta = a * (n_neg - b) - b * (n_pos - a)
        chi2 = (
            n * delta * delta
            / ((a + b) * (n - a - b) * n_pos * n_neg)
        )
        assert abs(chi2 - row.chi2) < 1e-5
