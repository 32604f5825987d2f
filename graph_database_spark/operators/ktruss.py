"""k-truss decomposition: triangle-support peeling on the fixpoint
skeleton — the edge-grain companion of k-core (operators/kcore.py).

The k-truss is the maximal subgraph in which every EDGE participates in
at least k-2 triangles of the subgraph (Cohen 2008) — a strictly
stronger cohesion filter than the k-core (every k-truss is inside the
(k-1)-core), and the standard community-scaffold/graph-cleaning
primitive at edge grain. Peeling: repeatedly drop all edges with
support < k-2; the survivor set is order-independent, so the
data-parallel remove-all-violators round is exact.

Per round: one canonical-triangle enumeration (edges are src < dst, so
the wedge join x=(a,b) ⋈ y=(b,c) closed by z=(a,c) counts each triangle
exactly once), an explode to the 3 member edges, a per-edge count, and
the filter join — all equi-joins keyed by vertex/edge ids. Rounds are
bounded by the peeling depth.

Scale posture: the wedge join is quadratic in hub degree — the same
exposure as every triangle query in this repo; AQE skew splitting
covers moderate hubs and operators/skew.py's salting is the escalation
path (triangle_edges uses it). State hygiene: the edge state is
SELF-JOINED three ways per round, so each iterate is wrapped in
``reset_plan_stats`` after ``materialize`` — without it the carried
sizeInBytes estimate is CUBED per round and the driver ends up in
million-bit BigInteger multiplications (the Borůvka post-mortem,
fixpoint.reset_plan_stats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graph_database_spark.operators.fixpoint import (
    materialize,
    reset_plan_stats,
)

__all__ = ["k_truss", "edge_support"]


def edge_support(e: DataFrame) -> DataFrame:
    """Per-edge triangle count over a canonical (src < dst) edge frame:
    ``(src, dst, support)`` for every edge in at least one triangle."""
    ab = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    ac = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"])
    members = (
        tri.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(
            tri.select(F.col("b").alias("src"), F.col("c").alias("dst"))
        )
        .unionByName(
            tri.select(F.col("a").alias("src"), F.col("c").alias("dst"))
        )
    )
    return members.groupBy("src", "dst").agg(
        F.count("*").alias("support")
    )


def k_truss(
    edges: DataFrame, k: int = 4, max_iterations: int = 30
) -> DataFrame:
    """``(src, dst, support)`` — the k-truss edges (k >= 3) with their
    final in-truss supports. Converges when a peel round removes no
    edge; raises on budget exhaustion (the oracle unrolls a fixed round
    count, so returning an unconverged iterate would hash-mismatch —
    the graph_mis budget-pinning pattern)."""
    if k < 3:
        raise ValueError("k_truss requires k >= 3 (support >= 1)")
    state = reset_plan_stats(materialize(edges.select("src", "dst")))
    n_old = state.count()
    for _ in range(max_iterations):
        s = edge_support(state)
        new = reset_plan_stats(
            materialize(
                state.join(s, ["src", "dst"])
                .where(F.col("support") >= k - 2)
                .select("src", "dst")
            )
        )
        n_new = new.count()
        if n_new == n_old:
            return new.join(edge_support(new), ["src", "dst"]).select(
                "src", "dst", F.col("support").cast("long").alias("support")
            )
        state, n_old = new, n_new
    raise RuntimeError(
        f"k_truss did not converge in {max_iterations} rounds; raise the "
        "budget (the oracle unroll depth must match)"
    )
