"""Events loader handles BOTH historical ts physical encodings.

The driver's events.parquet has shipped as TIMESTAMP(NANOS) (rounds 1-3)
and as plain timestamp[us] (round 4+); the round-4 testdata regeneration
broke the then-hard-coded nanos path in load_table and took out 17
catalog queries plus the whole bench. This pins the dtype dispatch so
neither vintage can regress silently again.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from graph_database_spark.sources.parquet import load_table

_ROWS = [
    (0, 1704067200_123456789, 13, "error", 185.22, '{"k": 87}'),
    (1, 1704067500_987654321, 12, "signup", 106.03, '{"k": 0}'),
    (2, 1704070000_000000001, 12, "purchase", 9.64, '{"k": 12}'),
]


def _write_events(dir_path, ts_unit: str) -> str:
    cols = list(zip(*_ROWS))
    divisor = 1 if ts_unit == "ns" else 1000
    table = pa.table(
        {
            "event_id": pa.array(cols[0], pa.int64()),
            "ts": pa.array(
                [t // divisor for t in cols[1]], pa.timestamp(ts_unit)
            ),
            "user_id": pa.array(cols[2], pa.int64()),
            "event_type": pa.array(cols[3], pa.string()),
            "value": pa.array(cols[4], pa.float64()),
            "props": pa.array(cols[5], pa.string()),
        }
    )
    path = str(dir_path / "events.parquet")
    # version>=2.6 is what lets parquet store TIMESTAMP(NANOS) physically
    # (older writer versions silently coerce to micros).
    pq.write_table(table, path, version="2.6", coerce_timestamps=None)
    return str(dir_path)


def test_unreadable_events_raises_without_flipping_session_conf(spark, tmp_path):
    """A transient read failure must NOT set the session-wide nanosAsLong
    conf — only the confirmed PARQUET_TYPE_ILLEGAL rejection may (ADVICE
    r5: a corrupt footer used to silently flip the decode conf for every
    later parquet read in the session)."""
    conf_key = "spark.sql.legacy.parquet.nanosAsLong"
    before = spark.conf.get(conf_key, None)
    bad = tmp_path / "events.parquet"
    bad.write_bytes(b"this is not a parquet file")
    with pytest.raises(Exception) as exc_info:
        load_table(spark, str(tmp_path), "events")
    assert "PARQUET_TYPE_ILLEGAL" not in str(exc_info.value)
    assert spark.conf.get(conf_key, None) == before


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_load_table_normalizes_both_vintages(spark, tmp_path, unit):
    sf_dir = _write_events(tmp_path, unit)
    stored = pq.read_schema(f"{sf_dir}/events.parquet").field("ts").type
    assert str(stored) == f"timestamp[{unit}]"  # the vintage really differs

    df = load_table(spark, sf_dir, "events")
    assert df.schema["ts"].dataType.simpleString() == "timestamp"
    got = {
        (r["event_id"], r["ts"].isoformat()) for r in df.select("event_id", "ts").collect()
    }
    # Nanos truncate to micros (DuckDB TIMESTAMP precision); micros are
    # exact — both vintages land on the identical values.
    expect = {
        (0, "2024-01-01T00:00:00.123456"),
        (1, "2024-01-01T00:05:00.987654"),
        (2, "2024-01-01T00:46:40"),
    }
    assert got == expect
