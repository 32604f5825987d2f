"""Event-stream operators, batch form (SURVEY.md §2.11 X4/X6).

JSON prop extraction, hourly rollups, and gap-based sessionization over
the ``events`` table. The streaming variants live in streaming/ — same
logical shapes expressed with watermarks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = [
    "json_extract_stats",
    "hourly_rollup",
    "sessionize",
    "burstiness",
    "cumulative_users",
    "cusum_changepoints",
]


def json_extract_stats(events: DataFrame) -> DataFrame:
    """Parse the JSON ``props`` column and aggregate per event_type:
    ``(event_type, n_events, sum_k, min_k, max_k)``.

    get_json_object is JVM-side (Jackson); the aggregate is map-side
    combinable. X4: typed extraction from semi-structured columns."""
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Time-window aggregation: ``(hour, event_type, n_events, sum_value)``.

    Batch analog of a 1-hour tumbling window (X6). sum_value is rounded —
    double summation order is engine/partition dependent, the rounded
    value is stable."""
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization: ``(user_id, session_id, n_events,
    session_start, session_end)``.

    A session breaks when the gap to the previous event of the same user
    exceeds ``gap_minutes``. One shuffle (partition by user), two window
    passes — the classic lag + running-sum formulation; at scale the
    partition key is user_id, which is naturally high-cardinality."""
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(order)
    is_new = F.when(
        prev_ts.isNull()
        | (F.col("ts").cast("long") - prev_ts.cast("long") > gap_minutes * 60),
        1,
    ).otherwise(0)
    flagged = events.select("user_id", "event_id", "ts").withColumn("is_new", is_new)
    with_sess = flagged.withColumn("session_id", F.sum("is_new").over(order))
    return with_sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


def transitions(events: DataFrame) -> DataFrame:
    """Event-type Markov transitions per user stream: ``(prev_type,
    event_type, n, prob)`` — the sequence-model prep aggregate (what a
    next-event predictor or funnel simulator trains on).

    One window pass partitioned by user (high-cardinality key, same
    shuffle sessionize pays) with the (ts, event_id) tiebreak making
    the lag deterministic; the transition matrix is event-type² rows —
    tiny — so its row-normalization totals join broadcast. prob is one IEEE
    division over exact integer counts, hash-stable."""
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select("user_id", "event_id", "ts", "event_type").withColumn(
        "prev_type", F.lag("event_type").over(order)
    )
    counts = (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count("*").alias("n"))
        .localCheckpoint()  # feeds row totals AND probabilities
    )
    tot = counts.groupBy("prev_type").agg(F.sum("n").alias("tot"))
    return counts.join(F.broadcast(tot), "prev_type").select(
        "prev_type",
        "event_type",
        "n",
        F.round(F.col("n") / F.col("tot"), 6).alias("prob"),
    )


def burstiness(events: DataFrame) -> DataFrame:
    """Per-user inter-event-time statistics: ``(user_id, n_gaps,
    mean_gap, cv, burstiness)`` — the point-process burstiness
    coefficient B = (sigma - mu) / (sigma + mu) of Goh & Barabasi
    (EPL 81, 2008). B -> -1 for periodic streams, 0 for Poisson, -> 1
    for bursty ones; a curation pipeline uses it to separate organic
    user activity from machine-generated (periodic) event streams.

    The reference has no temporal analytics at all (src/main.js is
    static-graph only); this extends the X6 window family. One window
    pass partitioned by user_id (high-cardinality, same shuffle
    sessionize pays) computes integer-second gaps via lag, then ONE
    map-side-combinable agg per user. Gaps are exact BIGINTs, so
    sum/sum-of-squares are partition-order-exact; mu/sigma are derived
    from the exact integer moments with a fixed IEEE expression tree
    (population variance as E[x^2] - E[x]^2, guarded against the
    catastrophic-cancellation negatives by greatest(0)), so the oracle
    mirrors it operand-for-operand and the final round(6) is stable."""
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag("ts").over(order).cast("long")
    gaps = (
        events.select("user_id", "event_id", "ts")
        .withColumn("gap", gap)
        .where(F.col("gap").isNotNull())
    )
    agg = gaps.groupBy("user_id").agg(
        F.count("*").alias("n_gaps"),
        F.sum("gap").alias("s1"),
        F.sum(F.col("gap") * F.col("gap")).alias("s2"),
    )
    n = F.col("n_gaps").cast("double")
    mu = F.col("s1") / n
    var = F.greatest(F.lit(0.0), F.col("s2") / n - mu * mu)
    sigma = F.sqrt(var)
    return agg.where(F.col("n_gaps") >= 2).select(
        "user_id",
        "n_gaps",
        F.round(mu, 6).alias("mean_gap"),
        F.round(F.when(mu > 0, sigma / mu), 6).alias("cv"),
        F.round(
            F.when(sigma + mu > 0, (sigma - mu) / (sigma + mu)), 6
        ).alias("burstiness"),
    )


def cumulative_users(events: DataFrame) -> DataFrame:
    """Daily audience growth: ``(day, new_users, cum_users)`` — users
    counted on the day of their FIRST event, with a running total. The
    running-distinct-count every growth dashboard needs, computed
    without any distinct-over-window (which Spark cannot express and
    an engine must rewrite exactly like this): first-seen per user is
    one min-agg, the daily rollup is map-side combinable, and the
    cumulative sum runs over the tiny day-grain frame (one partition
    by construction — bounded by days-of-history, not data size)."""
    first_seen = events.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("day")
    )
    daily = first_seen.groupBy("day").agg(
        F.count("*").alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).alias("cum_users"),
    )


def cusum_changepoints(events: DataFrame) -> DataFrame:
    """Per-user CUSUM mean-shift detection over the time-ordered value
    series: ``(user_id, n_events, shift_up, shift_dn, cp_event_id)``.

    The classic drift detector a pipeline runs over per-source metric
    streams: with P_k the centered prefix sum, the largest upward mean
    shift is ``max_k (P_k - min_{j<=k} P_j)`` and the change point is
    its argmax (earliest on ties). Centering is DIVISION-FREE: using
    ``P_k = cumsum(n * x_micro) - k * total_micro`` (both BIGINT) scales
    every deviation by n, so ``shift_*`` are exact integers in
    n-micro-units — partition-order-exact cross-engine with no mean
    rounding at all (the kmeans floor trick made unnecessary).

    One window pass per user (running sum + running min/max), one
    aggregation. At 100 TB this is the per-key sessionization shape:
    a single (user) shuffle, sort within partitions.
    """
    from pyspark.sql import Window

    ev = events.where(F.col("value").isNotNull()).select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("value") * F.lit(1000000.0), 0).cast("long").alias("xm"),
    )
    totals = ev.groupBy("user_id").agg(
        F.count("*").alias("n"), F.sum("xm").alias("t")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = (
        ev.join(F.broadcast(totals), "user_id")
        .withColumn("term", F.col("n") * F.col("xm") - F.col("t"))
        .withColumn("pk", F.sum("term").over(w))
        # second projection: windows over a window column cannot nest
        .withColumn("runmin", F.min("pk").over(w))
        .withColumn("runmax", F.max("pk").over(w))
        .select(
            "user_id",
            "event_id",
            "ts",
            "n",
            (F.col("pk") - F.col("runmin")).alias("dev_up"),
            (F.col("runmax") - F.col("pk")).alias("dev_dn"),
        )
    )
    wr = Window.partitionBy("user_id").orderBy(
        F.desc("dev_up"), F.asc("ts"), F.asc("event_id")
    )
    return (
        p.withColumn("rn", F.row_number().over(wr))
        .groupBy("user_id")
        .agg(
            F.max("n").alias("n_events"),
            F.max("dev_up").alias("shift_up"),
            F.max("dev_dn").alias("shift_dn"),
            F.max(F.when(F.col("rn") == 1, F.col("event_id"))).alias(
                "cp_event_id"
            ),
        )
    )


def best_mean_shift(events: DataFrame) -> DataFrame:
    """Exact single-changepoint localization per event_type: the split
    of the dense hourly count series minimizing total SSE — the
    binary-segmentation base step that LOCALIZES the shift
    ``cusum_changepoints`` detects.

    Minimizing SSE_left + SSE_right over split k equals maximizing the
    between-segment term n1*n2/n*(m1-m2)^2; dropping the constant n,
    the integer objective is gain(k) = (S_k*n - k*S_n)^2 div (k*(n-k))
    over prefix sums S_k — division-free means, no floats, so the
    argmax (ties -> earliest k) is identical cross-engine. Windows are
    partitioned per event_type over the bounded dense grid
    (#hours-in-span rows per series). Returns one row per type:
    (event_type, split_hour, k, n, gain, left/right mean in milli).
    """
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count("*").alias("y"))
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    grid = (
        events.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.expr("sequence(h0, h1, interval 1 hour)")
            ).alias("h"),
        )
    )
    # dense feeds both the prefix window and the totals groupBy —
    # checkpoint so the grid build + left join run once (reuse rule).
    dense = (
        grid.join(hourly, ["event_type", "h"], "left")
        .select(
            "event_type",
            "h",
            F.coalesce(F.col("y"), F.lit(0)).cast("long").alias("y"),
        )
        .localCheckpoint()
    )
    w = Window.partitionBy("event_type").orderBy("h")
    pre = dense.select(
        "event_type",
        "h",
        F.row_number().over(w).cast("long").alias("k"),
        F.sum("y").over(w).alias("sk"),
    )
    tot = dense.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum("y").alias("sn")
    )
    scored = (
        pre.join(F.broadcast(tot), "event_type")
        .where(F.col("k") < F.col("n"))
        .select(
            "event_type",
            "h",
            "k",
            "n",
            "sk",
            "sn",
            F.expr(
                "((sk * n - k * sn) * (sk * n - k * sn))"
                " div (k * (n - k))"
            ).alias("gain"),
        )
    )
    wbest = Window.partitionBy("event_type").orderBy(
        F.desc("gain"), F.asc("k")
    )
    return (
        scored.withColumn("rn", F.row_number().over(wbest))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("h").alias("split_hour"),
            "k",
            "n",
            "gain",
            F.expr("(1000 * sk) div k").alias("left_mean_milli"),
            F.expr("(1000 * (sn - sk)) div (n - k)").alias(
                "right_mean_milli"
            ),
        )
    )
