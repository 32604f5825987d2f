"""salted_join must be a pure re-plan: identical rows to the plain join."""

from __future__ import annotations

from graph_database_spark.operators.skew import salted_join


def test_salted_join_equals_plain_join(spark):
    # Heavily skewed left: 90% of rows share key 1.
    left = spark.createDataFrame(
        [(i, 1 if i % 10 else i) for i in range(1000)], "row_id long, k long"
    )
    right = spark.createDataFrame(
        [(1, "hot"), (10, "a"), (20, "b"), (999, "zz")], "k long, v string"
    )
    plain = {(r["row_id"], r["k"], r["v"]) for r in left.join(right, "k").collect()}
    salted = {
        (r["row_id"], r["k"], r["v"])
        for r in salted_join(left, right, on="k", salt_from="row_id").collect()
    }
    assert salted == plain
    assert len(plain) > 0


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, 1), (2, 5)], "row_id long, k long")
    right = spark.createDataFrame([(1, "x")], "k long, v string")
    rows = {
        (r["row_id"], r["v"])
        for r in salted_join(left, right, on="k", salt_from="row_id", how="left").collect()
    }
    assert rows == {(1, "x"), (2, None)}
