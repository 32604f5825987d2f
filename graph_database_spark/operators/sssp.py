"""Weighted single-source shortest paths (multi-source Bellman-Ford).

Completes the path-query family: bfs_distances (operators/bfs.py) is the
unit-cost case; this is the weighted one — cheapest path over the
tie-strength co-purchase graph, where an edge's cost is inverse to its
weight (strong ties are cheap to traverse). The reference engine's
Cypher surface (src/main.js:1-296) stops at unweighted patterns; this
extends SURVEY.md §2's traversal operators the way closeness/betweenness
already do.

Execution shape (the repo's standard iterative recurrence):
- synchronous Bellman-Ford rounds: relax every edge, fold the previous
  state in as UNION rows, one ``groupBy(s, id).min(dist)`` per round —
  two shuffles/round, NO third join-back shuffle (CLAUDE.md fixpoint
  rule; same shape as bfs/closeness/pagerank/kcore).
- state lives on few coalesced partitions and is localCheckpoint()ed per
  round, so the plan never re-derives the expensive edge build.
- costs are INTEGER micro-units (``1_000_000 div weight``) and the fold
  is min() over BIGINT — partition-order-exact, so a DuckDB oracle
  running the same R unrolled rounds reproduces it bit-for-bit.

Round-budget contract: exactly ``rounds`` synchronous rounds on BOTH
engines (the graph_mis pattern — pin the budget, don't claim
convergence). After R rounds the state holds the cheapest cost over
paths of at most R edges; if the true shortest path uses more hops the
two engines still agree, because they run the same recurrence.

Scale posture at 100 TB: per-round cost is one edges-sized join shuffle
+ one state-sized groupBy; state is O(num_sources · |V|) with
``num_sources`` the explicit cost knob (closeness_sampled discipline).
Sources are a bounded driver-side model (K ids, collected once).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["sssp_weighted"]


def sssp_weighted(
    edges_weighted: DataFrame,
    num_sources: int = 4,
    rounds: int = 12,
) -> DataFrame:
    """Cheapest-path distances ``(source, id, dist_micro)`` from the
    ``num_sources`` smallest vertex ids after exactly ``rounds``
    synchronous Bellman-Ford rounds.

    ``edges_weighted``: canonical ``(src, dst, weight)`` with BIGINT
    weights (plans/copurchase.copurchase_edges_weighted).
    """
    spark = edges_weighted.sparkSession
    ew = edges_weighted.localCheckpoint()
    sym = (
        ew.select("src", "dst", "weight")
        .unionByName(
            ew.select(
                F.col("dst").alias("src"),
                F.col("src").alias("dst"),
                "weight",
            )
        )
        .select(
            F.col("src").alias("v"),
            F.col("dst").alias("n"),
            # Integer micro-cost: strong ties are cheap. `div` keeps the
            # whole recurrence in BIGINT (no float ever enters a min()).
            F.expr("CAST(1000000 AS BIGINT) div weight").alias("cost"),
        )
        .localCheckpoint()
    )

    # Sources are a bounded driver-side model: the K smallest vertex ids
    # (deterministic, oracle-mirrorable as ORDER BY v LIMIT K).
    src_ids = [
        r.v
        for r in sym.select("v").distinct().orderBy("v").limit(num_sources).collect()
    ]
    state = spark.createDataFrame(
        [(s, s, 0) for s in src_ids], "s bigint, id bigint, dist bigint"
    )

    few = max(4, spark.sparkContext.defaultParallelism // 4)
    # FUSED rounds (r14 optimization round, the treach.py move): the
    # budget is fixed, so chaining 3 relax steps per checkpoint computes
    # the IDENTICAL state — fusion only changes materialization
    # frequency — and both intra-block state references (relax join +
    # union) read the previous step's (s, id) groupBy exchange, the
    # identical-subtree ReuseExchange criterion.
    fuse = 3
    done = 0
    while done < rounds:
        s = state
        for _ in range(min(fuse, rounds - done)):
            done += 1
            relax = s.join(sym, F.col("id") == F.col("v")).select(
                "s",
                F.col("n").alias("id"),
                (F.col("dist") + F.col("cost")).alias("dist"),
            )
            s = (
                s.unionByName(relax)
                .groupBy("s", "id")
                .agg(F.min("dist").alias("dist"))
            )
        state = s.coalesce(few).localCheckpoint()

    return state.select(
        F.col("s").alias("source"), "id", F.col("dist").alias("dist_micro")
    ).orderBy("source", "id")
