"""Distributed greedy graph coloring (Jones-Plassmann).

The parallel-MIS-based coloring of Jones & Plassmann (1993): each round,
every uncolored vertex whose random priority beats all of its uncolored
neighbors takes the smallest color absent from its already-colored
neighborhood. Priorities are md5-derived (deterministic, retry-stable —
the same argument as operators/mis.py's Luby rounds), so the full
coloring is a pure function of the graph. Colors are bounded by
max-degree + 1, rounds by O(log n) with high probability.

The reference has no coloring (or any vertex-labeling algorithm —
src/main.js ships only the five Cypher analytics); this rounds out the
symmetry-breaking family (MIS, LPA) the GraphX-style surface implies.
Register allocation, parallel scheduling, and conflict-free data
partitioning are the classic uses; in a data pipeline it batch-groups
mutually-adjacent entities so no batch contains a conflicting pair.

Oracle-wise rows-only: the round count is data-dependent, so a DuckDB
unroll cannot be pinned; tests/test_r6_operators.py asserts properness
(no monochromatic edge), determinism, and the max-degree+1 bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graph_database_spark.operators.fixpoint import fixpoint, materialize
from graph_database_spark.plans.copurchase import symmetrize

__all__ = ["graph_coloring"]


def _priority(col):
    return F.conv(F.md5(F.concat(F.lit("jp|"), col.cast("string"))).substr(1, 15), 16, 10).cast("long")


def graph_coloring(edges: DataFrame, max_iterations: int = 64) -> DataFrame:
    """``(id, color)`` — proper coloring, color in [0, max_degree]."""
    sym = materialize(symmetrize(edges))
    init = (
        sym.select(F.col("v").alias("id"))
        .distinct()
        .select(
            "id",
            F.lit(None).cast("int").alias("color"),
            _priority(F.col("id")).alias("p"),
        )
    )

    def step(state: DataFrame) -> DataFrame:
        # One aggregate-messages shuffle: each vertex hears, from its
        # neighbors, (a) the best (priority, id) among the UNCOLORED
        # ones and (b) the set of colors already taken. Vertices with
        # no uncolored rival claim the smallest free color.
        nbr = sym.join(
            state.select(
                F.col("id").alias("n"),
                F.col("color").alias("n_color"),
                F.col("p").alias("n_p"),
            ),
            "n",
        )
        agg = nbr.groupBy(F.col("v").alias("id")).agg(
            F.max(
                F.when(
                    F.col("n_color").isNull(),
                    F.struct(F.col("n_p").alias("p"), F.col("n").alias("id")),
                )
            ).alias("rival"),
            F.collect_set("n_color").alias("used"),
        )
        joined = state.join(agg, "id", "left")
        wins = F.col("color").isNull() & (
            F.col("rival").isNull()
            | (
                F.struct(F.col("p").alias("p"), F.col("id").alias("id"))
                > F.col("rival")
            )
        )
        # smallest color not used by neighbors: sequence(0, |used|)
        # always contains a free slot (pigeonhole)
        free = F.expr(
            "filter(sequence(0, size(used)),"
            " x -> NOT array_contains(used, x))[0]"
        ).cast("int")
        return joined.select(
            "id",
            F.when(wins, F.coalesce(free, F.lit(0))).otherwise(
                F.col("color")
            ).alias("color"),
            "p",
        )

    def converged(old: DataFrame, new: DataFrame) -> bool:
        return new.where(F.col("color").isNull()).isEmpty()

    out = fixpoint(init, step, converged, max_iterations, name="graph_coloring")
    return out.select("id", "color")
