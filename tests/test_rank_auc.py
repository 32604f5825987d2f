"""Exact Mann-Whitney AUC (operators/rank.rank_auc)."""

from __future__ import annotations

from graph_database_spark.operators.rank import rank_auc


def _auc(spark, rows):
    df = spark.createDataFrame(rows, "s long, y boolean")
    r = rank_auc(df, "s", "y").collect()[0]
    return r["n_pos"], r["n_neg"], r["auc_micro"]


def test_perfect_separation(spark):
    rows = [(i, False) for i in range(5)] + [(10 + i, True) for i in range(5)]
    assert _auc(spark, rows) == (5, 5, 1_000_000)


def test_reversed_is_zero(spark):
    rows = [(10 + i, False) for i in range(5)] + [(i, True) for i in range(5)]
    assert _auc(spark, rows) == (5, 5, 0)


def test_all_tied_is_half(spark):
    rows = [(7, False)] * 4 + [(7, True)] * 4
    assert _auc(spark, rows) == (4, 4, 500_000)


def test_matches_sklearn_style_reference(spark):
    # hand-computed: scores 1,2,2,3 labels F,T,F,T
    # ranks: 1, 2.5, 2.5, 4 -> R_pos = 2.5 + 4 = 6.5, U = 6.5 - 3 = 3.5
    # AUC = 3.5 / (2*2) = 0.875
    rows = [(1, False), (2, True), (2, False), (3, True)]
    assert _auc(spark, rows) == (2, 2, 875_000)
