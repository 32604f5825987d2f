"""Time-respecting reachability (earliest-arrival paths).

Temporal-graph traversal: an edge active at time t can only extend a
path that has already ARRIVED by t, so reachability is path-dependent in
a way static BFS cannot express (Holme & Saramäki, temporal networks).
Earliest arrival satisfies the same monotone min-fold recurrence as
shortest paths —

    arr(s, n) = min over edges (v, n, t) with t >= arr(s, v) of t

— so the operator reuses the sssp skeleton verbatim: synchronous relax
rounds, previous state folded in as UNION rows, ONE groupBy-min per
round (two shuffles, no join-back), state coalesced + localCheckpoint'd
per round, a pinned round budget mirrored by the unrolled-CTE oracle
(the graph_mis contract: same recurrence both engines, no convergence
claim). Times are integer month ordinals; everything stays BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["temporal_reachability"]


def temporal_reachability(
    tedges: DataFrame, num_sources: int = 8, rounds: int = 12
) -> DataFrame:
    """``(source, id, arrival)`` earliest-arrival month from the
    ``num_sources`` smallest vertex ids after exactly ``rounds``
    synchronous relax rounds over ``(src, dst, t)`` temporal edges."""
    spark = tedges.sparkSession
    ew = tedges.localCheckpoint()
    sym = (
        ew.select("src", "dst", "t")
        .unionByName(
            ew.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "t"
            )
        )
        .select(F.col("src").alias("v"), F.col("dst").alias("n"), "t")
        .localCheckpoint()
    )
    src_ids = [
        r.v
        for r in sym.select("v")
        .distinct()
        .orderBy("v")
        .limit(num_sources)
        .collect()
    ]
    state = spark.createDataFrame(
        [(s, s, 0) for s in src_ids], "s bigint, id bigint, arr bigint"
    )
    few = max(4, spark.sparkContext.defaultParallelism // 4)
    # FUSED rounds (r14 optimization round): the budget is fixed, so
    # chaining 3 relax steps per checkpoint computes the IDENTICAL
    # state (fusion only changes materialization frequency, never the
    # step count) while paying a third of the ~0.5 s fixed per-job
    # overhead (SCALE.md r13 floor measurement). Both intra-block state
    # references (relax join + union) read the previous step's
    # (s, id) groupBy exchange — the identical-subtree ReuseExchange
    # criterion the hash-min fuse=3 family established.
    fuse = 3
    done = 0
    while done < rounds:
        s = state
        for _ in range(min(fuse, rounds - done)):
            done += 1
            relax = (
                s.join(sym, F.col("id") == F.col("v"))
                .where(F.col("t") >= F.col("arr"))
                .select("s", F.col("n").alias("id"), F.col("t").alias("arr"))
            )
            s = (
                s.unionByName(relax)
                .groupBy("s", "id")
                .agg(F.min("arr").alias("arr"))
            )
        state = s.coalesce(few).localCheckpoint()
    return state.select(
        F.col("s").alias("source"), "id", F.col("arr").alias("arrival")
    )
