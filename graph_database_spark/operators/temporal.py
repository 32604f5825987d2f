"""Temporal join operators: as-of and keyed range joins.

Neither exists as a Spark built-in; both are expressed as compositions
that keep one equi-shuffle on the key and never materialize a time-range
explosion — the shapes that survive 100x data.

  asof_join    "latest right-side row at or before each left timestamp,
               per key" — the union + ordered-window + last_value
               (ignorenulls) formulation: tag both sides, sort by
               (key, time, side) inside one window, carry the running
               last right-side payload forward, keep left rows. ONE
               shuffle on the key; no range condition ever reaches a
               join operator (a naive t_left >= t_right theta-join
               explodes quadratically per key).

  range_count  "count right-side rows within [t, t + horizon) per left
               row, sharing a key" — an equi-join on the key with the
               range as a post-join filter; Catalyst keeps the hash/SMJ
               strategy and AQE handles key skew. Group sizes bound the
               fan-out (right rows per key), which is the quantity to
               monitor at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["asof_join", "range_count", "ewma_trailing"]


def ewma_trailing(
    events: DataFrame,
    key_col: str = "user_id",
    order_cols: tuple[str, str] = ("ts", "event_id"),
    value_col: str = "value",
    window_rows: int = 16,
) -> DataFrame:
    """Exponentially-weighted trailing mean per key:
    ``(user_id, event_id, ewma)`` — the time-series smoothing feature a
    sessionized event pipeline derives per entity.

    Over the last ``window_rows`` events of the key (ordered by
    ``order_cols`` — a total order, so the frame is deterministic), each
    value is weighted 2x its predecessor (alpha = 1/2, dyadic):

        ewma = sum_j(v_j * 2^j) / (2^m - 1),   j = 0 (oldest) .. m-1

    Cross-engine exact by construction: values snap to integer
    micro-units first, the weights are powers of two (integer shifts),
    so the weighted sum is an INTEGER sum — no FP accumulation anywhere;
    the two trailing divisions are single IEEE ops mirrored in the
    oracle. One shuffle (the per-key window); the frame is bounded at
    ``window_rows`` rows regardless of key skew.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(-(window_rows - 1), 0)
    )
    micro = (
        F.round(F.col(value_col) * F.lit(1_000_000.0), 0)
        .cast("long")
        .alias("v_micro")
    )
    # Null values are excluded up front: Spark's collect_list silently
    # DROPS nulls while DuckDB's list() keeps them — filtering first
    # keeps the two engines' window frames identical if a future data
    # vintage ships null values (today's events table has none).
    vals = (
        events.filter(F.col(value_col).isNotNull())
        .select(key_col, *order_cols, micro)
        .withColumn("vals", F.collect_list("v_micro").over(w))
    )
    weighted = F.expr(
        "aggregate(transform(vals, (x, i) -> x * shiftleft(1L, i)),"
        " 0L, (a, b) -> a + b)"
    )
    denom = F.expr("shiftleft(1L, size(vals)) - 1L")
    return vals.select(
        key_col,
        order_cols[1],
        (
            (weighted.cast("double") / denom.cast("double"))
            / F.lit(1_000_000.0)
        ).alias("ewma"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
) -> DataFrame:
    """For every left row, append the payload of the latest right row
    with the same ``on`` key and ``right_ts <= left_ts`` (nulls when no
    prior right row exists).

    Ties on (key, time): right rows sort BEFORE left rows at the same
    instant (inclusive semantics) and among themselves by payload order,
    making the carried row deterministic.

    The payload travels as ONE struct column carried atomically with
    ``last(ignorenulls)`` — carrying each payload column independently
    (the r2 formulation) backfills a NULL field of the latest right row
    from an older row and can mix fields from different right rows,
    diverging from true latest-row as-of semantics (ADVICE r2).
    """
    from pyspark.sql.types import StructField, StructType

    p_type = StructType([StructField(p, right.schema[p].dataType) for p in payload])
    lt = left.select(
        F.lit(1).alias("_side"),
        F.col(left_ts).alias("_t"),
        "*",
        F.lit(None).cast(p_type).alias("_p"),
    )
    rt = right.select(
        F.lit(0).alias("_side"),
        F.col(right_ts).alias("_t"),
        # Right rows keep the JOIN KEY (they must land in the same window
        # partition as the left rows they precede); every other left
        # column is null-typed padding.
        *[
            (F.col(on) if c == on else F.lit(None).cast(left.schema[c].dataType)).alias(c)
            for c in left.columns
        ],
        F.struct(*[F.col(p).alias(p) for p in payload]).alias("_p"),
    )
    merged = lt.unionByName(rt.select(lt.columns))
    w = (
        Window.partitionBy(on)
        .orderBy("_t", "_side", "_p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select("*", F.last("_p", ignorenulls=True).over(w).alias("_pc"))
    return carried.where(F.col("_side") == 1).select(
        *[F.col(c) for c in left.columns],
        *[F.col("_pc").getField(p).alias(p) for p in payload],
    )


def range_count(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    horizon_seconds: int,
    count_alias: str = "n_in_range",
) -> DataFrame:
    """Per left row, the count of right rows with the same key whose
    timestamp falls in ``[left_ts, left_ts + horizon)``; left rows with
    no matches keep count 0.

    Row multiplicity is preserved: the post-join regroup keys on a
    generated unique row id, not the left columns — grouping on the
    columns alone collapses duplicate left rows into one row with a
    merged count (2 identical left rows x m matches -> one row with 2m;
    ADVICE r2)."""
    lid = left.withColumn("_rowid", F.monotonically_increasing_id())
    r = right.select(F.col(on).alias("_k"), F.col(right_ts).alias("_rt"))
    cond = (
        (lid[on] == r["_k"])
        & (r["_rt"] >= lid[left_ts])
        & (r["_rt"] < F.timestamp_add("SECOND", F.lit(horizon_seconds), lid[left_ts]))
    )
    joined = lid.join(r, cond, "left")
    return (
        joined.groupBy(F.col("_rowid"), *[lid[c] for c in left.columns])
        .agg(F.count("_k").alias(count_alias))
        .drop("_rowid")
    )
