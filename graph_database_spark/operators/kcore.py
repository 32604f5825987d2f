"""k-core decomposition: iterative peeling on the fixpoint skeleton.

The k-core is the maximal induced subgraph in which every vertex has
degree >= k — the standard graph-cleaning primitive (drop weakly
connected fringe before expensive analytics). Peeling: repeatedly remove
vertices with induced degree < k until none remain; the survivor set is
exactly the k-core regardless of removal order, so the data-parallel
"remove all violators each round" variant is correct.

Scale posture: state is the surviving vertex set (one id column); each
round recomputes induced degrees with two semi-joins against the edge
frame + one groupBy — shuffles keyed by vertex id. Rounds are bounded by
the peeling depth (worst case O(|V|) on a path, typically a few dozen);
``max_iterations`` guards the budget and the shared fixpoint raises on
exhaustion rather than returning a non-core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graph_database_spark.operators.fixpoint import fixpoint, materialize
from graph_database_spark.plans.copurchase import symmetrize

__all__ = ["k_core"]


def k_core(edges: DataFrame, k: int, max_iterations: int = 200) -> DataFrame:
    """``(id, degree)`` — the vertices of the k-core with their induced
    degrees (empty frame when no k-core exists)."""
    sym = materialize(symmetrize(edges))
    verts = sym.select(F.col("v").alias("id")).distinct()

    def induced_degrees(alive: DataFrame) -> DataFrame:
        return (
            sym.join(alive.withColumnRenamed("id", "v"), "v", "left_semi")
            .join(alive.withColumnRenamed("id", "n"), "n", "left_semi")
            .groupBy(F.col("v").alias("id"))
            .agg(F.count("*").alias("degree"))
        )

    def step(alive: DataFrame) -> DataFrame:
        return induced_degrees(alive).where(F.col("degree") >= k).select("id")

    # The alive set shrinks monotonically, so equal counts <=> no vertex
    # was peeled this round <=> fixpoint (counts on materialized frames
    # are one cheap job each).
    def converged(old: DataFrame, new: DataFrame) -> bool:
        return new.count() == old.count()

    core = fixpoint(verts, step, converged, max_iterations, name="k_core")
    return induced_degrees(core)
