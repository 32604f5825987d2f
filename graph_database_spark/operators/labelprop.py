"""Label propagation community detection on the fixpoint skeleton.

Each vertex starts in its own community; every round it adopts the most
frequent label among its neighbors (ties -> smallest label, making every
round deterministic — vanilla LPA's random tie-breaking is exactly what
an oracle-checked engine can't have). Converged when no label changes;
LPA can oscillate on bipartite-ish structures, so the round budget
returns the last iterate instead of raising (anytime semantics, like
PageRank).

Per round: one shuffle to count neighbor labels per (vertex, label),
one to argmax per vertex — both keyed by vertex id. State is one row
per vertex. The reference has no community detection; this extends the
analytics surface the north star names (BASELINE.json "GraphX for
analytics") on the same aggregate-messages machinery as components /
PageRank / k-core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graph_database_spark.operators.fixpoint import fixpoint, materialize
from graph_database_spark.plans.copurchase import symmetrize

__all__ = ["label_propagation"]


def label_propagation(edges: DataFrame, max_iterations: int = 10) -> DataFrame:
    """``(id, community)`` — community = the converged (or
    ``max_iterations``-th) propagated label; labels are vertex ids."""
    sym = materialize(symmetrize(edges))
    labels = (
        sym.select(F.col("v").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("community"))
    )

    def step(state: DataFrame) -> DataFrame:
        # Neighbor label frequencies, then argmax (count desc, label asc):
        # max_by over the (count, -label) struct is lexicographic, so the
        # highest count wins and ties fall to the smallest label.
        incoming = sym.join(
            state.withColumnRenamed("id", "v"), "v"
        ).select(F.col("n").alias("id"), "community")
        counts = incoming.groupBy("id", "community").agg(F.count("*").alias("cnt"))
        return counts.groupBy("id").agg(
            F.max_by(
                "community", F.struct(F.col("cnt"), (-F.col("community")).alias("neg"))
            ).alias("community")
        )

    def converged(old: DataFrame, new: DataFrame) -> bool:
        return (
            new.join(old.withColumnRenamed("community", "prev"), "id")
            .where(F.col("community") != F.col("prev"))
            .isEmpty()
        )

    return fixpoint(
        labels, step, converged, max_iterations, name="label_propagation",
        on_exhaust="return",
    )
