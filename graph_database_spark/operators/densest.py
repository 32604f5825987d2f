"""Densest-subgraph extraction via (1+eps)-greedy peeling.

Charikar's greedy peel (remove the min-degree vertex, remember the
densest prefix) is inherently sequential; the distributed variant of
Bahmani, Kumar & Vassilvitskii (VLDB 2012) removes EVERY vertex with
degree <= (1+eps) * average each round — a 2(1+eps)-approximation in
O(log_{1+eps} n) rounds, deterministically (the surviving set shrinks
by at least the 1/(1+eps) fraction every round). With eps = 1/2 all
comparisons stay INTEGER (d * 2|V| vs 3 * sum_deg — no float average
anywhere), so every round's vertex set is a pure function of the graph
and a DuckDB recursive CTE replays the peel row-for-row: the whole
iterative optimization is hash-verified, not just sanity-checked.

The reference ships no subgraph-mining analytic (src/main.js's five
queries are counts/coefficients); densest subgraph is the standard
community-core / fraud-cluster / spam-farm primitive on co-purchase
graphs. Per round: one degree aggregation plus two semi-joins — all
keyed on vertex id, state coalesced + checkpointed (fixpoint hygiene);
the per-round driver read is ONE stats row (bounded model, same class
as the IVF centroids)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graph_database_spark.operators.fixpoint import materialize
from graph_database_spark.plans.copurchase import symmetrize

__all__ = ["densest_subgraph"]


def densest_subgraph(edges: DataFrame, max_rounds: int = 48) -> DataFrame:
    """One row ``(round, n_nodes, n_edges, density)`` — the densest
    round-prefix of the eps=1/2 peel; density = |E|/|V| (Charikar's
    objective), a single IEEE division of exact integers."""
    cur = materialize(symmetrize(edges))
    best = None  # (round, n_v, n_e, density_double)
    for r in range(max_rounds + 1):
        deg = cur.groupBy("v").agg(F.count("*").alias("d")).localCheckpoint()
        n_v, sum_d = deg.agg(F.count("*"), F.sum("d")).first()
        if not n_v:
            break
        e = sum_d // 2
        density = float(e) / float(n_v)
        # strict > keeps the EARLIEST maximum — mirrors the oracle's
        # row_number(ORDER BY density DESC, r) = 1 (both engines compare
        # the same exact small-integer-derived doubles)
        if best is None or density > best[3]:
            best = (r, n_v, e, density)
        # Bahmani peel: drop v with d <= 1.5 * avg_degree, i.e.
        # d * 2 * n_v <= 3 * sum_d — integer-exact, no float average.
        keep = deg.where(
            F.col("d") * F.lit(2 * int(n_v)) > F.lit(3 * int(sum_d))
        ).select("v")
        cur = materialize(
            cur.join(keep, "v", "left_semi").join(
                keep.select(F.col("v").alias("n")), "n", "left_semi"
            )
        )
    else:
        raise RuntimeError(
            f"densest_subgraph: peel not finished after {max_rounds} rounds"
        )
    spark = edges.sparkSession
    return spark.createDataFrame(
        [best], "round int, n_nodes bigint, n_edges bigint, density double"
    )
