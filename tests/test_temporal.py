"""As-of and range join fixtures with hand-computed expectations."""

from __future__ import annotations

from datetime import datetime

from graph_database_spark.operators.temporal import asof_join, range_count


def ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [
            (1, 10, ts("2024-01-05T00:00:00")),
            (2, 10, ts("2024-01-01T00:00:00")),   # exactly at right row: inclusive
            (3, 10, ts("2023-12-31T23:59:59")),   # before any right row -> null
            (4, 20, ts("2024-06-01T00:00:00")),   # key with no right rows -> null
        ],
        "event_id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, ts("2024-01-01T00:00:00"), 100),
            (10, ts("2024-01-04T00:00:00"), 101),
            (10, ts("2024-01-06T00:00:00"), 102),  # after every left row
        ],
        "k long, rts timestamp, payload long",
    )
    out = {
        r["event_id"]: r["payload"]
        for r in asof_join(left, right, on="k", left_ts="ts", right_ts="rts",
                           payload=["payload"]).collect()
    }
    assert out == {1: 101, 2: 100, 3: None, 4: None}


def test_range_count_window(spark):
    left = spark.createDataFrame(
        [(1, 5, ts("2024-01-01T00:00:00")), (2, 5, ts("2024-02-01T00:00:00"))],
        "row_id long, k long, t timestamp",
    )
    right = spark.createDataFrame(
        [
            (5, ts("2024-01-01T00:00:00")),   # inclusive lower bound
            (5, ts("2024-01-07T23:59:59")),   # inside 7d
            (5, ts("2024-01-08T00:00:00")),   # exclusive upper bound
            (5, ts("2024-02-03T00:00:00")),
        ],
        "k long, rt timestamp",
    )
    out = {
        r["row_id"]: r["n_in_range"]
        for r in range_count(left, right, on="k", left_ts="t", right_ts="rt",
                             horizon_seconds=7 * 86400).collect()
    }
    assert out == {1: 2, 2: 1}


def test_ewma_trailing_dyadic_weights(spark):
    from graph_database_spark.operators.temporal import ewma_trailing

    rows = [
        # user 1: values 1, 2, 4 in ts order
        (1, 1, "t", 100, 1.0),
        (2, 1, "t", 200, 2.0),
        (3, 1, "t", 300, 4.0),
        # user 2: single event -> ewma == value
        (4, 2, "t", 100, 7.5),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts long, value double"
    )
    out = {r["event_id"]: r["ewma"] for r in ewma_trailing(df).collect()}
    assert out[1] == 1.0
    # [1,2]: (1*1 + 2*2) / 3
    assert abs(out[2] - 5 / 3) < 1e-9
    # [1,2,4]: (1*1 + 2*2 + 4*4) / 7
    assert abs(out[3] - 3.0) < 1e-9
    assert out[4] == 7.5


def test_event_transitions_probabilities(spark):
    from graph_database_spark.catalog import q_event_transitions

    rows = q_event_transitions(spark, "/root/testdata/sf0.001").collect()
    assert rows
    by_prev: dict[str, float] = {}
    for r in rows:
        assert r.n >= 1 and 0.0 < r.prob <= 1.0
        by_prev[r.prev_type] = by_prev.get(r.prev_type, 0.0) + r.prob
    for prev, s in by_prev.items():
        assert abs(s - 1.0) < 1e-4, (prev, s)
