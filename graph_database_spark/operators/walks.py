"""Deterministic random walks — the graph-embedding sampling primitive.

DeepWalk/node2vec-style training corpora are built from random walks
over the graph; at 100 TB the walk generator IS the pipeline bottleneck,
and a walk that can't be replayed can't be debugged or resumed. Walks
here are fully deterministic: the step-t transition out of vertex v on
walk w picks neighbor index

    md5_hash60(w || '|' || t || '|' || v)  %  degree(v)

over the SORTED neighbor list — a replayable, retry-stable pseudo-random
choice with no RNG state (the same discipline as the repo's md5 sampling
operators), which also makes the whole walk set value-hash-verifiable
against a SQL oracle.

Plan: adjacency is one groupBy building the sorted neighbor array per
vertex (sym pairs are distinct, so the array is exact); each step is one
equi-join of the walk frontier against the adjacency on the current
vertex — the shuffle is keyed by vertex, exactly how a billion-walk
generator wants to run (hot vertices are AQE skew-join territory; the
neighbor ARRAY rides the build side only once per step).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graph_database_spark.operators.fixpoint import materialize
from graph_database_spark.operators.sketches import md5_hash60
from graph_database_spark.plans.copurchase import symmetrize

__all__ = ["random_walks", "node2vec_walks"]


def node2vec_walks(
    edges: DataFrame,
    num_walks: int = 32,
    steps: int = 8,
    w_ret: int = 4,
    w_bfs: int = 2,
    w_out: int = 1,
    fuse: int = 4,
) -> DataFrame:
    """Second-order biased walks (node2vec, Grover & Leskovec 2016,
    KDD) with INTEGER bias weights: a neighbor x of the current vertex v
    (having arrived from u) weighs ``w_ret`` if x = u (return), ``w_bfs``
    if x is also a neighbor of u (distance-1, BFS-ish), else ``w_out``
    (DFS-ish) — the defaults (4, 2, 1) encode return p = 1/2, in-out
    q = 2 relative to the standard alpha = (1/p, 1, 1/q).

    The weighted pick stays deterministic and oracle-replayable: r =
    md5_hash60(w|t|v) mod total_weight, choose the first neighbor whose
    integer prefix-weight exceeds r (exact cumulative inverse-CDF over
    the SORTED neighbor list — the md5 discipline of random_walks with a
    weighted instead of uniform CDF). Step 1 has no predecessor and is
    the uniform random_walks transition.

    Plan: each step is the frontier equi-joined against adjacency TWICE
    (current vertex and predecessor) — neighbor arrays ride the build
    side per step and are never carried in walk state (array payloads
    don't shuffle with the frontier; CLAUDE.md discipline). The
    distance-1 test is an array_contains over the predecessor's sorted
    neighbors: O(deg_v * deg_u) per step-vertex, the documented cost of
    second-order walks.
    """
    sym = symmetrize(edges)
    adj = materialize(
        sym.groupBy(F.col("v")).agg(
            F.sort_array(F.collect_list("n")).alias("nbrs")
        )
    )
    starts = (
        adj.select(F.col("v").alias("walk_id"))
        .orderBy("walk_id")
        .limit(num_walks)
    )
    s0 = materialize(
        starts.select(
            "walk_id", F.lit(0).alias("step"), F.col("walk_id").alias("node")
        )
    )
    idx1 = md5_hash60(
        F.concat_ws(
            "|",
            F.col("walk_id").cast("string"),
            F.lit("1"),
            F.col("node").cast("string"),
        )
    ) % F.size("nbrs")
    state = materialize(
        s0.join(adj, s0.node == adj.v).select(
            "walk_id",
            F.lit(1).alias("step"),
            F.element_at("nbrs", (idx1 + F.lit(1)).cast("int")).alias("node"),
            F.col("node").alias("prev"),
        )
    )
    out = [s0, state.select("walk_id", "step", "node")]
    # Materialize every `fuse` steps, not every step: the walk state is
    # num_walks rows (a fixed sample, SF-independent), so the per-step
    # checkpoint was pure fixed job overhead — one sequential cluster
    # barrier per hop. Between checkpoints the next step and the union
    # branch re-derive at most fuse-1 lazy broadcast joins against the
    # CHECKPOINTED adjacency. fuse=4 measured best of {1, 4, no-ckpt}
    # on both walk kinds (r15 A/B min-of-3: n2v 4.05 -> 3.16 s, uniform
    # 2.82 -> 2.37; fully-lazy loses on the double-join n2v chain and
    # risks the multiplicative size-estimate trap at depth).
    since = 0
    for t in range(2, steps + 1):
        j = (
            state.alias("s")
            .join(adj.alias("av"), F.col("s.node") == F.col("av.v"))
            .join(adj.alias("ap"), F.col("s.prev") == F.col("ap.v"))
            .select(
                F.col("s.walk_id").alias("walk_id"),
                F.col("s.node").alias("node"),
                F.col("s.prev").alias("prev"),
                F.col("av.nbrs").alias("nbrs"),
                F.col("ap.nbrs").alias("pn"),
            )
            .withColumn(
                "wl",
                F.expr(
                    f"transform(nbrs, x -> CAST(CASE WHEN x = prev THEN {w_ret}"
                    f" WHEN array_contains(pn, x) THEN {w_bfs}"
                    f" ELSE {w_out} END AS BIGINT))"
                ),
            )
            .withColumn(
                "r",
                md5_hash60(
                    F.concat_ws(
                        "|",
                        F.col("walk_id").cast("string"),
                        F.lit(str(t)),
                        F.col("node").cast("string"),
                    )
                )
                % F.expr("aggregate(wl, CAST(0 AS BIGINT), (a, x) -> a + x)"),
            )
            .withColumn(
                "idx",
                F.expr(
                    "array_min(filter(sequence(1, size(wl)), i ->"
                    " aggregate(slice(wl, 1, i), CAST(0 AS BIGINT),"
                    " (a, x) -> a + x) > r))"
                ),
            )
        )
        state = j.select(
            "walk_id",
            F.lit(t).alias("step"),
            F.expr("element_at(nbrs, CAST(idx AS INT))").alias("node"),
            F.col("node").alias("prev"),
        )
        since += 1
        if since >= fuse and t < steps:
            state = materialize(state)
            since = 0
        out.append(state.select("walk_id", "step", "node"))
    res = out[0]
    for frame in out[1:]:
        res = res.unionByName(frame)
    return res


def random_walks(
    edges: DataFrame, num_walks: int = 32, steps: int = 8, fuse: int = 4
) -> DataFrame:
    """``(walk_id, step, node)`` — one deterministic walk of ``steps``
    hops from each of the ``num_walks`` smallest vertex ids (walk_id =
    the start vertex). Step 0 is the start vertex itself."""
    sym = symmetrize(edges)
    adj = materialize(
        sym.groupBy(F.col("v")).agg(
            F.sort_array(F.collect_list("n")).alias("nbrs")
        )
    )
    starts = (
        adj.select(F.col("v").alias("walk_id"))
        .orderBy("walk_id")
        .limit(num_walks)
    )
    state = materialize(
        starts.select(
            "walk_id", F.lit(0).alias("step"), F.col("walk_id").alias("node")
        )
    )
    out = [state]
    # same fuse policy as node2vec_walks (see comment there): the
    # num_walks-row state only checkpoints every `fuse` hops.
    since = 0
    for t in range(1, steps + 1):
        idx = md5_hash60(
            F.concat_ws(
                "|",
                F.col("walk_id").cast("string"),
                F.lit(str(t)),
                F.col("node").cast("string"),
            )
        ) % F.size("nbrs")
        state = state.join(adj, state.node == adj.v).select(
            "walk_id",
            F.lit(t).alias("step"),
            F.element_at("nbrs", (idx + F.lit(1)).cast("int")).alias("node"),
        )
        since += 1
        if since >= fuse and t < steps:
            state = materialize(state)
            since = 0
        out.append(state)
    res = out[0]
    for frame in out[1:]:
        res = res.unionByName(frame)
    return res
