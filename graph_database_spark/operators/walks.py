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

__all__ = ["random_walks"]


def random_walks(
    edges: DataFrame, num_walks: int = 32, steps: int = 8
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
    for t in range(1, steps + 1):
        idx = md5_hash60(
            F.concat_ws(
                "|",
                F.col("walk_id").cast("string"),
                F.lit(str(t)),
                F.col("node").cast("string"),
            )
        ) % F.size("nbrs")
        state = materialize(
            state.join(adj, state.node == adj.v).select(
                "walk_id",
                F.lit(t).alias("step"),
                F.element_at("nbrs", (idx + F.lit(1)).cast("int")).alias(
                    "node"
                ),
            )
        )
        out.append(state)
    res = out[0]
    for frame in out[1:]:
        res = res.unionByName(frame)
    return res
