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
        # Mode of the neighbor labels with smallest-label tie-break, in
        # TWO shuffles (join + one groupBy) instead of three (the
        # count-per-(id,label) pre-aggregate needed its own shuffle):
        # collect the labels, sort ascending, and fold a longest-run
        # scan over the sorted array row-locally. Runs of equal labels
        # are contiguous after the sort and the fold keeps a STRICTLY
        # longer run only, so ties resolve to the smallest label — the
        # same argmax(count, -label) the two-stage form computed.
        # Row-local cost is O(deg log deg); label lists are
        # neighborhood-sized, the same order as the messages the
        # two-stage form shuffled (caveat: a super-hub's list lands on
        # one task — the count-based form spreads it, so hub-heavy
        # graphs at extreme scale may prefer the old shape).
        incoming = sym.join(
            state.select(F.col("id").alias("v"), "community"), "v"
        ).select(
            F.col("n").alias("id"), "community",
            F.lit(None).cast("long").alias("prev"),
        )
        # The self row carries community=NULL so collect_list skips it
        # (the mode stays a NEIGHBOR majority) while its `prev` column
        # smuggles the old label through max() — the convergence probe
        # then needs no old-vs-new join job.
        keep = state.select(
            "id",
            F.lit(None).cast(state.schema["community"].dataType).alias("community"),
            F.col("community").alias("prev"),
        )
        incoming = incoming.unionByName(keep)
        labels_sorted = F.sort_array(F.collect_list("community"))
        zero = F.lit(0).cast("long")
        init_acc = F.struct(
            F.lit(-1).cast("long").alias("best"),
            zero.alias("best_n"),
            F.lit(-1).cast("long").alias("cur"),
            zero.alias("cur_n"),
        )

        def fold(acc, x):
            cur_n = F.when(x == acc["cur"], acc["cur_n"] + 1).otherwise(F.lit(1).cast("long"))
            better = cur_n > acc["best_n"]
            return F.struct(
                F.when(better, x).otherwise(acc["best"]).alias("best"),
                F.when(better, cur_n).otherwise(acc["best_n"]).alias("best_n"),
                x.alias("cur"),
                cur_n.alias("cur_n"),
            )

        mode = F.aggregate(labels_sorted, init_acc, fold, lambda acc: acc["best"])
        return incoming.groupBy("id").agg(
            mode.alias("community"), F.max("prev").alias("prev")
        )

    def converged(old: DataFrame, new: DataFrame) -> bool:
        return new.where(F.col("community") != F.col("prev")).isEmpty()

    out = fixpoint(
        labels, step, converged, max_iterations, name="label_propagation",
        on_exhaust="return",
    )
    return out.select("id", "community")
