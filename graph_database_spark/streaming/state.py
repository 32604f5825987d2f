"""Custom stateful streaming operator via ``applyInPandasWithState``.

The built-in streaming surface covers windowed/sessionized aggregation
(streaming/events.py) and keyed dedup (streaming/dedup.py); anything
with ARBITRARY per-key state — running distinct sets, decaying
counters, per-user model features — needs the user-defined-state
operator. This module implements the canonical example: a per-user
running profile (event count, value total, distinct event-type set)
maintained incrementally across micro-batches.

Arrow moves each group's rows into pandas once per batch; state is a
typed tuple the engine checkpoints with the query. At scale, state
lives partitioned by the grouping key across executors — the same
shuffle key discipline as every batch operator here — and eviction is
the watermark/timeout's job (NoTimeout keeps profiles forever, the
right default for a bounded user population; swap in EventTimeTimeout
for unbounded key spaces).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType, DoubleType, LongType, StringType, StructField, StructType,
)

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("sum_value", DoubleType()),
    StructField("n_types", LongType()),
])

STATE_SCHEMA = StructType([
    StructField("cnt", LongType()),
    StructField("total", DoubleType()),
    StructField("types", ArrayType(StringType())),
])


def _update_profile(key, pdfs, state):
    # Runs on executors, one call per (key, micro-batch).
    import pandas as pd

    if state.exists:
        cnt, total, types = state.get
        types = set(types)
    else:
        cnt, total, types = 0, 0.0, set()
    for pdf in pdfs:
        cnt += len(pdf)
        total += float(pdf["value"].sum())
        types.update(pdf["event_type"].dropna().tolist())
    state.update((cnt, total, sorted(types)))
    yield pd.DataFrame({
        "user_id": [key[0]],
        "n_events": [cnt],
        "sum_value": [total],
        "n_types": [len(types)],
    })


def user_profile_stream(events: DataFrame) -> DataFrame:
    """Per-user running profile ``(user_id, n_events, sum_value,
    n_types)`` — emitted (updated) every micro-batch the user appears
    in. The distinct-type set is the part no built-in streaming
    aggregate expresses incrementally."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
