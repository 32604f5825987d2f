"""Keyed table reconciliation (operators/diff.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_database_spark.operators.diff import table_diff, table_diff_rows


def _frames(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, None, 40.0)],
        "id long, name string, amount double",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10.0),       # unchanged
            (2, "b", 21.0),       # changed (amount)
            (4, "d", 40.0),       # changed (null -> 'd')
            (5, "e", 50.0),       # added
        ],
        "id long, name string, amount double",
    )
    return old, new


def test_statuses(spark):
    old, new = _frames(spark)
    got = {r["id"]: r["status"] for r in table_diff_rows(old, new, ["id"]).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "changed", 5: "added"}
    summary = {r["status"]: r["n_rows"] for r in table_diff(old, new, ["id"]).collect()}
    assert summary == {"unchanged": 1, "changed": 2, "removed": 1, "added": 1}


def test_null_vs_marker_not_conflated(spark):
    # a NULL and the sentinel string must not fingerprint equal
    old = spark.createDataFrame([(1, None)], "id long, v string")
    new = spark.createDataFrame([(1, "\x00")], "id long, v string")
    got = table_diff_rows(old, new, ["id"]).collect()[0]["status"]
    # r9: the fingerprint hashes (isNull, value) pairs, so NULL is
    # distinguishable from EVERY actual string — including the '\x00'
    # that used to be the NULL sentinel (ADVICE r8).
    assert got == "changed"


def test_column_order_insensitive(spark):
    old = spark.createDataFrame([(1, "a", 2.0)], "id long, x string, y double")
    new = spark.createDataFrame([(1, 2.0, "a")], "id long, y double, x string").select(
        "id", "y", "x"
    )
    got = table_diff_rows(old, new, ["id"]).collect()[0]["status"]
    assert got == "unchanged"


def test_schema_drift_raises(spark):
    old = spark.createDataFrame([(1, "a")], "id long, x string")
    new = spark.createDataFrame([(1, "a", 1.0)], "id long, x string, z double")
    with pytest.raises(ValueError, match="column sets differ"):
        table_diff_rows(old, new, ["id"])
