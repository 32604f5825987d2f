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

__all__ = [
    "asof_join",
    "range_count",
    "ewma_trailing",
    "resample_hourly",
    "rolling_median",
]


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


def resample_hourly(events: DataFrame) -> DataFrame:
    """Gap-filling hourly resample per user: ``(user_id, hour, n_events,
    v_hour, is_gap, v_ffill, v_interp)`` over every user's COMPLETE
    hour grid from their first to last event — missing hours appear with
    n_events = 0, a forward-filled value, and a linearly interpolated
    one. The time-series regularization step (telemetry, finance bars,
    feature windows) that turns an irregular event stream into
    model-ready fixed-step input; the reference has no temporal surface
    at all (src/main.js is static-graph only).

    Plan: ONE groupBy (user, hour) for the observed bars, one tiny
    per-user min/max agg whose hour grid is generated with sequence()
    (JVM-side, no driver loop), a broadcast-sized join back, then two
    window passes over the user-partitioned grid (carry-last and
    carry-next with ignorenulls). The grid is |users| x their active
    span in hours — linear state, one shuffle key, no range join.

    Float posture: the per-hour double sum is snapped to round(4)
    (partition-order ulp, catalog convention), the interpolation weight
    is a ratio of exact epoch-second integers, and the final values are
    round(6) over a fixed IEEE tree the oracle mirrors."""
    hours = events.select(
        "user_id",
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "value",
    )
    obs = hours.groupBy("user_id", "hour").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("v_hour"),
    )
    span = hours.groupBy("user_id").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    grid = span.select(
        "user_id",
        F.explode(
            F.sequence(F.col("h0"), F.col("h1"), F.expr("interval 1 hour"))
        ).alias("hour"),
    )
    g = grid.join(obs, ["user_id", "hour"], "left")

    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    is_obs = F.col("v_hour").isNotNull()
    prev_v = F.last(F.when(is_obs, F.col("v_hour")), ignorenulls=True).over(w_prev)
    prev_h = F.last(F.when(is_obs, F.col("hour")), ignorenulls=True).over(w_prev)
    next_v = F.first(F.when(is_obs, F.col("v_hour")), ignorenulls=True).over(w_next)
    next_h = F.first(F.when(is_obs, F.col("hour")), ignorenulls=True).over(w_next)

    # Interpolation in exact integers: v0 + (v1-v0)*k/m computed as ONE
    # IEEE division (v0m*m + (v1m-v0m)*k) / (m*1e4) of exact BIGINTs —
    # bit-identical across engines. A float round(6) here landed on
    # .xxxxxx5 boundaries (4-decimal bars x dyadic hour ratios) and
    # Spark's BigDecimal HALF_UP disagreed with DuckDB's binary round
    # on 9/105k rows.
    v0m = F.round(prev_v * F.lit(10000.0), 0).cast("long")
    v1m = F.round(next_v * F.lit(10000.0), 0).cast("long")
    k_s = F.col("hour").cast("long") - prev_h.cast("long")
    m_s = next_h.cast("long") - prev_h.cast("long")
    num = v0m * m_s + (v1m - v0m) * k_s
    den = m_s * F.lit(10000)
    interp = F.when(is_obs, F.col("v_hour")).otherwise(
        F.when(
            prev_v.isNotNull() & next_v.isNotNull(),
            num.cast("double") / den.cast("double"),
        ).otherwise(F.coalesce(prev_v, next_v))
    )
    return g.select(
        "user_id",
        "hour",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "v_hour",
        (~is_obs).cast("int").alias("is_gap"),
        F.round(prev_v, 6).alias("v_ffill"),
        interp.alias("v_interp"),
    )


def rolling_median(
    events: DataFrame,
    key_col: str = "user_id",
    order_cols: tuple[str, str] = ("ts", "event_id"),
    value_col: str = "value",
    window_rows: int = 15,
) -> DataFrame:
    """Trailing-window median per key: ``(user_id, event_id,
    roll_median)`` over the last ``window_rows`` events — the robust
    twin of ewma_trailing (a median shrugs off the outlier spikes that
    drag any mean-based smoother; this is the anomaly-resistant
    baseline signal).

    No built-in windowed median exists in either engine; the rewrite is
    collect_list over the bounded frame + one array_sort per row. Exact
    cross-engine: values snap to integer micro-units first, the median
    of integers is either an integer or a dyadic half (x.5 — exact in
    a double), and the final unscaling is one IEEE division. The frame
    is bounded at ``window_rows`` rows regardless of key skew, so the
    sort is O(w log w) per row with w constant."""
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
    # Nulls excluded up front for the same engine-parity reason as
    # ewma_trailing (Spark collect_list drops them, DuckDB list keeps).
    vals = (
        events.filter(F.col(value_col).isNotNull())
        .select(key_col, *order_cols, micro)
        .withColumn("vals", F.collect_list("v_micro").over(w))
        # sorted array materialized ONCE (CLAUDE.md: the median CASE
        # below references it three times)
        .withColumn("sv", F.array_sort("vals"))
    )
    med_micro = F.expr(
        "CASE WHEN size(sv) % 2 = 1"
        "     THEN CAST(element_at(sv, CAST((size(sv) + 1) div 2 AS INT))"
        "               AS DOUBLE)"
        "     ELSE (CAST(element_at(sv, CAST(size(sv) div 2 AS INT))"
        "                AS DOUBLE)"
        "           + CAST(element_at(sv, CAST(size(sv) div 2 + 1 AS INT))"
        "                  AS DOUBLE))"
        "          / CAST(2.0 AS DOUBLE) END"
    )
    return vals.select(
        key_col,
        order_cols[1],
        (med_micro / F.lit(1_000_000.0)).alias("roll_median"),
    )
