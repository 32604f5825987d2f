"""Maximal matching — deterministic Israeli-Itai-style rounds.

The edge twin of Luby's MIS (operators/mis.py): per round, every
still-unmatched edge draws a deterministic md5 priority; an edge joins
the matching iff it is the strict minimum among ALL edges incident to
either endpoint (i.e. a local minimum in the line graph); matched
endpoints leave and their incident edges dissolve. O(log n) rounds
with high probability, fully replayable — the SQL oracle unrolls the
same rounds byte-for-byte (catalog._build_matching_sql).

Pipeline use: a maximal matching over a near-duplicate PAIR graph is
the canonical "merge in parallel waves" schedule — each wave merges
disjoint pairs, so no record participates in two merges at once (the
entity-resolution consolidation step after record_linkage).

At 100 TB: per-round state is the live edge list (shrinking
geometrically); each round is one vertex-keyed min aggregation + two
semi-join eliminations — no edge blowup, no driver-side loops over
data (only the round counter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graph_database_spark.operators.fixpoint import materialize
from graph_database_spark.operators.sketches import md5_hash60

__all__ = ["greedy_matching"]


def greedy_matching(edges: DataFrame, max_iterations: int = 16) -> DataFrame:
    """``(src, dst, round)`` — the matched pairs with the round that
    matched them, over canonical undirected edges ``(src, dst)``.
    Ties (distinct edges sharing an md5 priority — ~2^-60) break on
    (src, dst), keeping every round deterministic."""
    from pyspark.sql import Observation

    e = materialize(edges.select("src", "dst").distinct())
    spark = edges.sparkSession
    won: list[DataFrame] = []
    r = 0
    live = not e.isEmpty()
    # r14 optimization round: 4 jobs/round -> 2. The priority frame is
    # a NARROW md5 projection over the checkpointed edge state — its
    # three consumers re-derive it for pennies, so its checkpoint job
    # was pure overhead; and the next round's liveness probe rides the
    # edge-state checkpoint as an observe() metric instead of a
    # separate isEmpty job.
    while live:
        r += 1
        if r > max_iterations:
            raise RuntimeError(
                f"greedy_matching did not finish in {max_iterations} rounds"
            )
        pr = e.select(
            "src",
            "dst",
            md5_hash60(
                F.concat_ws(
                    "|",
                    F.lit(str(r)),
                    F.col("src").cast("string"),
                    F.col("dst").cast("string"),
                )
            ).alias("p"),
        )
        key = F.struct("p", "src", "dst")
        both = pr.select(F.col("src").alias("vert"), key.alias("k")).unionByName(
            pr.select(F.col("dst").alias("vert"), key.alias("k"))
        )
        vmin = both.groupBy("vert").agg(F.min("k").alias("m"))
        win = materialize(
            pr.join(
                vmin.select(F.col("vert").alias("src"), F.col("m").alias("mu")),
                "src",
            )
            .join(
                vmin.select(F.col("vert").alias("dst"), F.col("m").alias("mv")),
                "dst",
            )
            .where((key == F.col("mu")) & (key == F.col("mv")))
            .select("src", "dst")
        )
        won.append(win.select("src", "dst", F.lit(r).alias("round")))
        matched = win.select(F.col("src").alias("x")).unionByName(
            win.select(F.col("dst").alias("x"))
        )
        obs = Observation(f"matching_r{r}")
        e = materialize(
            e.join(matched.select(F.col("x").alias("src")), "src", "left_anti")
            .join(matched.select(F.col("x").alias("dst")), "dst", "left_anti")
            .select("src", "dst")
            .observe(obs, F.count(F.lit(1)).alias("n"))
        )
        live = bool(obs.get["n"])
    if not won:
        return spark.createDataFrame([], "src long, dst long, round int")
    out = won[0]
    for w in won[1:]:
        out = out.unionByName(w)
    return out.select("src", "dst", F.col("round").cast("int").alias("round"))
