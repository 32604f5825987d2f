"""PSI drift tests (operators/drift.py)."""

from __future__ import annotations

from datetime import datetime

from graph_database_spark.operators.drift import psi_drift


def _ev(rows, spark):
    return spark.createDataFrame(
        rows, "event_type string, event_id long, ts timestamp, value double"
    )


def ts(i):
    return datetime(2024, 1, 1, i // 60, i % 60)


def test_stable_stream_has_near_zero_psi(spark):
    # same distribution in both halves (values cycle 1..10 twice)
    rows = [("a", i, ts(i), float(1 + i % 10)) for i in range(200)]
    out = psi_drift(_ev(rows, spark)).collect()[0]
    assert out["n_a"] == 100 and out["n_b"] == 100
    assert abs(out["psi_micro"]) < 20_000  # << the 0.2 alarm (200k)


def test_shifted_stream_alarms(spark):
    # second half shifted by +100: every B value lands in the top bin
    rows = [("a", i, ts(i), float(1 + i % 10)) for i in range(100)]
    rows += [("a", 100 + i, ts(100 + i), float(101 + i % 10)) for i in range(100)]
    out = psi_drift(_ev(rows, spark)).collect()[0]
    assert out["psi_micro"] > 200_000  # fires the classic alarm
