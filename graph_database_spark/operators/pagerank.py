"""PageRank over the undirected (symmetrized) graph.

Built entirely on the shared fixpoint + aggregate-messages skeleton
(operators/fixpoint.py) — the operator itself is the textbook update

    r'(v) = (1 - d) / N + d * sum_{u in N(v)} r(u) / deg(u)

with one aggregate-messages shuffle per round. The reference has no
PageRank (its only centrality attempt, betweenness, never completed —
src/main.js:108-125); this extends the analytics surface toward the
north star's "GraphX for analytics" (BASELINE.json).

Scale posture: state is (id, rank, deg) — one row per vertex; each round
is one shuffle keyed by vertex id. Degrees are joined from a materialized
frame, never recomputed. On the symmetrized graph every vertex has
degree >= 1, so there is no dangling-mass redistribution term; rank mass
is conserved at 1 every round (asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graph_database_spark.operators.fixpoint import fixpoint, materialize
from graph_database_spark.plans.copurchase import symmetrize

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    max_iterations: int = 20,
    tol: float = 1e-6,
) -> DataFrame:
    """``(id, rank)`` — PageRank with convergence at max |Δrank| < tol,
    or the ``max_iterations``-th iterate (anytime semantics: a fixed
    round budget is the standard production contract)."""
    sym = materialize(symmetrize(edges))
    deg = materialize(
        sym.groupBy(F.col("v").alias("id")).agg(F.count("*").alias("deg"))
    )
    n = deg.count()
    if n == 0:
        return deg.select("id", F.lit(0.0).alias("rank"))
    init = deg.select("id", F.lit(1.0 / n).alias("rank"), "deg")
    teleport = (1.0 - damping) / n

    def step(state: DataFrame) -> DataFrame:
        # Two shuffles, not three (same rewrite as closeness.py): the
        # join-back that kept the state total is replaced by unioning a
        # zero-contribution self row per vertex into the one groupBy.
        # The self row also smuggles deg through max() (messages carry
        # NULL deg), so the static degree frame never rejoins.
        msgs = sym.join(
            state.select(
                F.col("id").alias("v"), (F.col("rank") / F.col("deg")).alias("c")
            ),
            "v",
        ).select(
            F.col("n").alias("id"), "c", F.lit(None).cast("long").alias("deg")
        )
        selfr = state.select("id", F.lit(0.0).alias("c"), "deg")
        return (
            msgs.unionByName(selfr)
            .groupBy("id")
            .agg(
                (F.lit(teleport) + F.lit(damping) * F.sum("c")).alias("rank"),
                F.max("deg").alias("deg"),
            )
        )

    def converged(old: DataFrame, new: DataFrame) -> bool:
        delta = (
            new.join(old.select("id", F.col("rank").alias("prev")), "id")
            .agg(F.max(F.abs(F.col("rank") - F.col("prev"))))
            .first()[0]
        )
        return delta is not None and delta < tol

    out = fixpoint(
        init, step, converged, max_iterations, name="pagerank", on_exhaust="return"
    )
    return out.select("id", "rank")
