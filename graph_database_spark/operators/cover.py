"""Greedy maximum-coverage seed selection (influence-max primitive).

Pick k vertices whose closed neighborhoods cover the most not-yet-
covered vertices — the (1 - 1/e) greedy of Nemhauser et al., the
seed-selection step of influence maximization / facility placement.
Deterministic: ties break on the smallest vertex id, so the whole
selection replays in an unrolled SQL oracle (catalog.py).

Plan: per round ONE anti-join of the closed-neighborhood edge list
against the covered set (keyed by the covered vertex) + one count
groupBy + a distributed top-1 (TakeOrderedAndProject); the covered set
is re-materialized per round on few partitions (iterative-state
discipline). No driver-side collect — the pick rides a broadcast join.
k rounds = k bounded supersteps regardless of graph size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graph_database_spark.operators.fixpoint import materialize
from graph_database_spark.plans.copurchase import symmetrize

__all__ = ["max_cover_seeds"]


def max_cover_seeds(edges: DataFrame, k: int = 5) -> DataFrame:
    """``(seed_rank, seed, gain)`` — the k greedy max-coverage picks
    over closed neighborhoods, gain = newly covered vertices."""
    sym = symmetrize(edges)
    nbhd = materialize(
        sym.unionByName(
            sym.select(F.col("v"), F.col("v").alias("n")).distinct()
        )
    )
    spark = edges.sparkSession
    cov = spark.createDataFrame([], "id long")
    out = []
    for r in range(1, k + 1):
        gain = (
            nbhd.join(cov, nbhd.n == cov.id, "left_anti")
            .groupBy("v")
            .agg(F.count("*").alias("g"))
            .where(F.col("g") >= 1)
        )
        pick = materialize(
            gain.orderBy(F.col("g").desc(), F.col("v").asc()).limit(1)
        )
        out.append(
            pick.select(
                F.lit(r).alias("seed_rank"),
                F.col("v").alias("seed"),
                F.col("g").alias("gain"),
            )
        )
        newly = nbhd.join(
            F.broadcast(pick.select(F.col("v").alias("pv"))),
            nbhd.v == F.col("pv"),
        ).select(F.col("n").alias("id"))
        cov = materialize(
            cov.unionByName(newly).distinct().coalesce(8)
        )
    res = out[0]
    for frame in out[1:]:
        res = res.unionByName(frame)
    return res
