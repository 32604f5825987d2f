"""Maximal independent set — Luby's algorithm with deterministic rounds.

The distributed-graph classic, and a training-pipeline tool: an MIS over
a near-duplicate pair graph is a maximal set of mutually non-duplicate
documents — a principled keeper-selection strategy (every dropped doc
has a kept near-duplicate, no two kept docs are near-duplicates).

Luby rounds with md5-derived per-round priorities instead of RNG state
(the repo's deterministic-sampling discipline): vertex v enters the MIS
in round r iff its priority ``md5(r || '|' || v)`` is a strict local
minimum among still-undecided neighbors (ties — impossible for distinct
vertices in practice — break on vertex id, keeping the round total).
Winners and their neighbors leave the undecided set; O(log n) rounds
with high probability, re-randomized each round exactly as Luby
prescribes, yet fully replayable and hash-verifiable against an
unrolled-round SQL oracle (catalog._build_mis_sql).

At 100 TB: per-round state is the undecided vertex set (shrinking
geometrically); each round is two vertex-keyed joins (priority compare,
neighbor elimination) — no edge materialization beyond the input's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graph_database_spark.operators.fixpoint import materialize
from graph_database_spark.operators.sketches import md5_hash60
from graph_database_spark.plans.copurchase import symmetrize

__all__ = ["luby_mis"]


def luby_mis(edges: DataFrame, max_iterations: int = 32) -> DataFrame:
    """``(id, round)`` — the MIS members with the Luby round that
    selected them. Isolated vertices don't appear in ``edges`` and are
    trivially independent — callers union them in if needed."""
    sym = materialize(symmetrize(edges))
    und = materialize(sym.select("v").distinct())
    spark = edges.sparkSession
    won: list[DataFrame] = []
    r = 0
    while not und.isEmpty():
        # Emptiness is probed BEFORE the round-budget check so a set
        # that empties exactly on the last allowed round still returns
        # (the for/else formulation raised spuriously there).
        r += 1
        if r > max_iterations:
            raise RuntimeError(
                f"luby_mis did not finish in {max_iterations} rounds"
            )
        pr = materialize(
            und.select(
                "v",
                md5_hash60(
                    F.concat_ws("|", F.lit(str(r)), F.col("v").cast("string"))
                ).alias("p"),
            )
        )
        nbr = (
            sym.join(
                pr.select(
                    F.col("v").alias("nv"), F.col("p").alias("np")
                ),
                sym.n == F.col("nv"),
            )
            .select("v", "nv", "np")
        )
        cand = pr.join(nbr, "v", "left")
        win = materialize(
            cand.groupBy("v", "p")
            .agg(
                F.max(
                    (F.col("np") < F.col("p"))
                    | ((F.col("np") == F.col("p")) & (F.col("nv") < F.col("v")))
                ).alias("beaten")
            )
            .filter(~F.coalesce("beaten", F.lit(False)))
            .select("v")
        )
        won.append(win.select("v", F.lit(r).alias("round")))
        eliminated = sym.join(win, "v").select(F.col("n").alias("v")).distinct()
        und = materialize(
            und.join(win, "v", "left_anti").join(eliminated, "v", "left_anti")
        )
    if not won:
        return spark.createDataFrame([], "id long, round int")
    res = won[0]
    for frame in won[1:]:
        res = res.unionByName(frame)
    return res.select(F.col("v").alias("id"), "round")
