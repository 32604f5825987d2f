"""Truncated Katz centrality with exact dyadic weights.

Katz centrality sums walk counts into a vertex damped by beta^k; the
reference's only centrality attempt (betweenness, src/main.js:108-125)
never completed, and Katz is the standard spectral companion every
graph-analytics surface ships (GraphX/GraphFrames express it the same
way: repeated aggregate-messages matvecs).

Exactness: with beta = 1/2 and a fixed horizon K, the score
``sum_{k=1..K} w_k(v) / 2^k`` rescales to the INTEGER
``sum_k w_k(v) * 2^(K-k)`` over exact BIGINT walk counts — the same
dyadic-weight trick events_ewma uses — so the whole iteration is
partition-order-exact and a DuckDB oracle can unroll it join-for-join.
Shifts stay well under 31 bits (CLAUDE.md rule).

Scale: K aggregate-messages shuffles over O(|V|) state; walk counts
grow like (avg degree)^K, bounded by BIGINT for any realistic K <= 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graph_database_spark.operators.fixpoint import materialize
from graph_database_spark.plans.copurchase import symmetrize

__all__ = ["katz_centrality"]


def katz_centrality(edges: DataFrame, horizon: int = 4) -> DataFrame:
    """``(id, katz_num, katz)`` — katz_num = sum_k w_k * 2^(horizon-k)
    (exact integer), katz = katz_num / 2^horizon (one IEEE division)."""
    if not 1 <= horizon <= 6:
        raise ValueError(f"horizon must be in [1, 6], got {horizon}")
    sym = materialize(symmetrize(edges))
    verts = sym.select(F.col("v").alias("id")).distinct()

    w = verts.select("id", F.lit(1).cast("long").alias("w"))
    score = verts.select("id", F.lit(0).cast("long").alias("katz_num"))
    for k in range(1, horizon + 1):
        # one aggregate-messages shuffle: w_k(v) = sum_{n in N(v)} w_{k-1}(n)
        w = materialize(
            sym.join(w.withColumnRenamed("id", "n"), "n")
            .groupBy(F.col("v").alias("id"))
            .agg(F.sum("w").alias("w"))
        )
        weight = 1 << (horizon - k)
        score = score.join(w, "id", "left").select(
            "id",
            (
                F.col("katz_num")
                + F.coalesce(F.col("w"), F.lit(0)) * F.lit(weight)
            ).alias("katz_num"),
        )
    return score.select(
        "id",
        "katz_num",
        (F.col("katz_num").cast("double") / F.lit(float(1 << horizon))).alias(
            "katz"
        ),
    )
