"""Viterbi decoding of a 2-state HMM over per-user event sequences —
the sequence-labeling primitive (session phase segmentation: is the user
in a "mainstream" or "niche" browsing regime?) as ONE JVM aggregate HOF
fold per user, with the max-product recursion's argmax paths carried
forward as strings (the parallel-backpointer trick: the best path ENDING
in each state rides the fold state, so no backward pass is needed).

Model (deterministic, data-derived):
- emission(state 0 "common", type x) = ln(freq(x)); emission(state 1
  "rare", x) = ln(1 - freq(x)) — global type frequencies, snapped to
  integer micro-units per (CLAUDE.md micro-unit rule).
- transition: stay ln(0.9), switch ln(0.1); initial ln(0.5) — fixed
  integer micro literals embedded identically in the oracle.

Sequences cap at MAX_STEPS events per user (deterministic prefix by
(ts, event_id)) — bounds the fold state and the oracle's recursion
depth. All arithmetic is BIGINT micro: max/+ only, so the recursion is
exact on both engines; ties in the max break toward state 0, mirrored
as >= on both sides.

Scale posture: emissions are a broadcast model (|event types| rows);
the only shuffle is the per-user collect (one keyed exchange), state is
O(MAX_STEPS) chars per user. No driver loop, no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["viterbi_decode", "MAX_STEPS", "T_STAY", "T_SWITCH", "INIT"]

# round(1e6 * ln(p)) literals; recomputed in tests/test_viterbi replay.
T_STAY = -105361  # ln(0.9)
T_SWITCH = -2302585  # ln(0.1)
INIT = -693147  # ln(0.5)
MAX_STEPS = 64


def _fold_expr() -> str:
    ts, tw = T_STAY, T_SWITCH
    step = (
        "struct("
        f"x.e0 + greatest(st.v0 + {ts}, st.v1 + {tw}) AS v0,"
        f" x.e1 + greatest(st.v0 + {tw}, st.v1 + {ts}) AS v1,"
        f" concat(IF(st.v0 + {ts} >= st.v1 + {tw}, st.p0, st.p1), '0') AS p0,"
        f" concat(IF(st.v0 + {tw} >= st.v1 + {ts}, st.p0, st.p1), '1') AS p1)"
    )
    return (
        "aggregate(slice(a, 2, greatest(size(a) - 1, 0)),"
        f" struct(CAST({INIT} + element_at(a, 1).e0 AS BIGINT) AS v0,"
        f" CAST({INIT} + element_at(a, 1).e1 AS BIGINT) AS v1,"
        " '0' AS p0, '1' AS p1),"
        f" (st, x) -> {step},"
        " st -> IF(st.v0 >= st.v1,"
        " struct(st.v0 AS score_micro, st.p0 AS path),"
        " struct(st.v1 AS score_micro, st.p1 AS path)))"
    )


def viterbi_decode(events: DataFrame) -> DataFrame:
    """(user_id, n_steps, score_micro, path) — the max-probability state
    path per user. Requires >= 2 distinct event types (state-1 emission
    is ln(1 - freq))."""
    et = events.groupBy("event_type").agg(F.count("*").alias("n"))
    tot = et.agg(F.sum("n").alias("t"))
    em = et.crossJoin(F.broadcast(tot)).select(
        "event_type",
        F.expr(
            "CAST(round(1000000 * ln(CAST(n AS DOUBLE)"
            " / CAST(t AS DOUBLE)), 0) AS BIGINT)"
        ).alias("e0"),
        F.expr(
            "CAST(round(1000000 * ln(CAST(t - n AS DOUBLE)"
            " / CAST(t AS DOUBLE)), 0) AS BIGINT)"
        ).alias("e1"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        events.join(F.broadcast(em), "event_type")
        .select("user_id", "ts", "event_id", "e0", "e1")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= MAX_STEPS)
    )
    packed = seq.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("rn", "e0", "e1"))).alias("a")
    )
    return packed.select(
        "user_id",
        F.size("a").cast("long").alias("n_steps"),
        F.expr(_fold_expr()).alias("r"),
    ).select("user_id", "n_steps", "r.score_micro", "r.path")
