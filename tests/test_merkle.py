"""Merkle range reconciliation: exact diff localization on hand-built
divergences (the oracle pins the catalog query; this pins the operator's
contract on controlled inputs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_spark.operators.merkle import merkle_diff


def _frame(spark, rows):
    return spark.createDataFrame(rows, "k long, payload string")


def test_divergent_leaves_localized_exactly(spark):
    left = _frame(spark, [(i, f"v{i}") for i in range(200)])
    # Mutate keys 5 and 70 (leaves 0 and 4 at leaf_div=16 -> parents 0
    # and 1 at fanout=4), delete key 130 (leaf 8, parent 2).
    right = _frame(
        spark,
        [
            (i, "MUT" if i in (5, 70) else f"v{i}")
            for i in range(200)
            if i != 130
        ],
    )
    out = {
        r["leaf"]: r
        for r in merkle_diff(
            left, right, "k", "payload", leaf_div=16, fanout=4
        ).collect()
    }
    assert set(out) == {0, 4, 8}
    assert out[0]["parent"] == 0
    assert out[4]["parent"] == 1
    assert out[8]["parent"] == 2
    # Counts diverge only for the deletion; mutations keep n equal.
    assert out[0]["n_left"] == out[0]["n_right"] == 16
    assert out[8]["n_left"] == 16 and out[8]["n_right"] == 15
    for r in out.values():
        assert r["fp_left"] != r["fp_right"]


def test_identical_replicas_report_nothing(spark):
    left = _frame(spark, [(i, f"v{i}") for i in range(100)])
    right = _frame(spark, [(i, f"v{i}") for i in range(100)])
    assert merkle_diff(left, right, "k", "payload", 16, 4).count() == 0
