"""Betweenness (stress) centrality — the reference's semantics, distributed.

The reference attempts, per node x, to count the shortest paths over all
ordered (source, destination) pairs with length > 1 in which x is interior
(``allShortestPaths`` + interior filter, src/main.js:108-125). That query
never completed and produced no golden output (BASELINE.md) — this is the
'stress centrality' variant of betweenness (path COUNTS, not Brandes'
fractional dependencies).

Algorithm (two DataFrame fixpoint loops, SURVEY.md §4.3 / §7 phase 4):
  forward   multi-source BFS: state (s, v, dist, sigma) where sigma is
            the number of shortest s->v paths. All sources advance in the
            same join — one shuffle per level, not one query per vertex.
  backward  level-by-level accumulation of
                g(s, v) = sum_{w in succ_s(v)} (1 + g(s, w))
            which equals the number of shortest-path continuations from v
            (each shortest v->t DAG path decomposes uniquely by first hop).
  score(x)  = sum_s sigma(s, x) * g(s, x)  over s != x
            = sum over ordered pairs (s, t) of the shortest s->t paths
              with x interior — exactly the reference's count, restricted
              to sources in the sample.

Scale posture: state is |S| x |V| rows (S = source sample); each level is
one shuffle keyed by (s, v). Exact betweenness on a 100 TB graph is not a
thing anyone computes — sampled-source is the published approach
(Brandes/Pich 2007) and the sample size is the explicit cost knob.
localCheckpoint() per level truncates lineage so plans stay flat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graph_database_spark.operators.fixpoint import materialize
from graph_database_spark.plans.copurchase import symmetrize

__all__ = ["betweenness", "edge_betweenness"]


def _sigma_g(
    edges: DataFrame,
    sources: DataFrame | None = None,
    num_sources: int | None = None,
    max_iterations: int = 64,
    collect_dag: bool = False,
    fwd_fuse: int = 1,
):
    """Shared forward/backward machinery: returns ``(vertices, visited,
    g, sym, dag_levels)`` — per-(source, vertex) shortest-path counts
    sigma and continuation counts g, both exact integers. Consumed by
    the vertex score (betweenness) and the per-edge score
    (edge_betweenness).

    ``collect_dag=True`` additionally checkpoints, per backward level,
    the DAG-edge frame ``(s, v, n, sigma, g_next)`` the backward
    recurrence derives its aggregate from anyway — the edge score is a
    pure per-row function of it, so edge_betweenness pays NO re-join of
    the full visited/g state (VERDICT r6 #7: the old 3-way
    visited x sym x visited join was the widest plan in the suite)."""
    spark = edges.sparkSession
    sym = symmetrize(edges).localCheckpoint()  # (v, n), reused every level

    vertices = sym.select(F.col("v").alias("id")).distinct()
    if sources is None:
        src = vertices
        if num_sources is not None:
            src = vertices.orderBy("id").limit(num_sources)
    else:
        src = sources.toDF("id")
    src = src.localCheckpoint()

    # ---- forward BFS ------------------------------------------------------
    visited = src.select(
        F.col("id").alias("s"),
        F.col("id").alias("v"),
        F.lit(0).alias("dist"),
        F.lit(1).cast("long").alias("sigma"),
    ).localCheckpoint()

    # Per-level state is |S| x |frontier| rows — small relative to the
    # session's shuffle width, so each checkpointed frame is coalesced
    # (narrow, no shuffle) to keep task counts from dominating runtime.
    # (A lazy-union visited set was tried instead of re-checkpointing:
    # 1.5x SLOWER — the anti-join then reads L stacked frames per level.)
    state_parts = max(4, spark.sparkContext.defaultParallelism // 4)

    # FUSED levels (r14 optimization round): per-round cost here is the
    # FIXED checkpoint-job overhead (~0.5 s, data-size-independent —
    # the fixpoint(fuse=) measurement, SCALE.md r13), so three BFS
    # levels chain into ONE materialization. The level step qualifies
    # for fusion: both state references (frontier filter + seen
    # projection) read the previous step's (s, v) groupBy exchange —
    # an identical subtree ending in an exchange, exactly the
    # ReuseExchange criterion the hash-min family's fuse=3 relies on
    # (and the onion peel pipeline lacks). A level past convergence is
    # the identity (empty frontier -> no messages -> state unchanged),
    # so overshooting inside a block never changes the answer. The
    # visited count rides the checkpoint job as an observe() metric
    # (the onion_layers r14 move) instead of a separate count() job.
    from pyspark.sql import Observation

    prev_count = visited.count()
    converged = False
    level = 0
    while level < max_iterations:
        state = visited
        for _ in range(min(fwd_fuse, max_iterations - level)):
            level += 1
            frontier = state.where(F.col("dist") == level - 1)
            # TWO shuffles per level, not three: raw frontier messages
            # union the visited state into ONE (s, v) groupBy that both
            # aggregates the new sigma and performs the visited check (a
            # row whose group contains a visited row keeps the visited
            # dist/sigma — the old shape did this with a pre-aggregate
            # plus a left-anti join, paying a third shuffle). Visited
            # rows are unique per (s, v), so max() on the when-guarded
            # columns reads exactly that row.
            msgs = frontier.join(sym, "v").select(
                "s",
                F.col("n").alias("v"),
                F.lit(False).alias("old"),
                F.lit(None).cast("long").alias("dist"),
                "sigma",
            )
            seen = state.select(
                "s", "v", F.lit(True).alias("old"), "dist", "sigma"
            )
            state = (
                msgs.unionByName(seen)
                .groupBy("s", "v")
                .agg(
                    F.max("old").alias("was_seen"),
                    F.max(F.when(F.col("old"), F.col("dist"))).alias(
                        "old_dist"
                    ),
                    F.max(F.when(F.col("old"), F.col("sigma"))).alias(
                        "old_sigma"
                    ),
                    F.sum(F.when(~F.col("old"), F.col("sigma"))).alias(
                        "new_sigma"
                    ),
                )
                .select(
                    "s",
                    "v",
                    F.when(F.col("was_seen"), F.col("old_dist"))
                    .otherwise(F.lit(level))
                    .alias("dist"),
                    F.when(F.col("was_seen"), F.col("old_sigma"))
                    .otherwise(F.col("new_sigma"))
                    .alias("sigma"),
                )
            )
        obs = Observation(f"bfs_l{level}")
        visited = materialize(
            state.observe(obs, F.count(F.lit(1)).alias("n")), state_parts
        )
        count = obs.get["n"] or 0
        if count == prev_count:
            converged = True
            break
        prev_count = count
    if not converged:
        # Block-boundary counts can hide convergence INSIDE the final
        # block. The exact original-budget criterion ("some level
        # <= max_iterations added nothing") is equivalent to "no row
        # sits at dist == max_iterations" — monotone BFS growth cannot
        # resume once a level adds nothing — so one cheap filter probe
        # on the checkpointed frame settles it exactly.
        converged = visited.where(
            F.col("dist") == max_iterations
        ).isEmpty()
    if not converged:
        # A truncated BFS would silently understate sigma/g for the
        # unreached fringe — and desynchronize from any fixed-level
        # unrolled oracle. Raise loudly instead (q_graph_mis pattern:
        # both engine and oracle are pinned to the same budget, and
        # overflow is an error, not a wrong answer).
        raise RuntimeError(
            f"betweenness: BFS still growing after {max_iterations} levels; "
            "raise max_iterations (and the oracle's unroll depth) together"
        )

    max_dist = visited.agg(F.max("dist")).first()[0] or 0

    # ---- backward accumulation -------------------------------------------
    # g rows exist only where g > 0; missing means 0.
    # (Materializing the whole per-source DAG up front and slicing it per
    # level was tried: ~1.5x slower here — the |visited| x degree join is
    # bigger than the sum of the level-filtered joins it replaces.)
    #
    # The recurrence only ever reads g for nodes ONE level down, so the
    # join probes the previous level's frame, not a growing accumulator
    # (measured at sf0.1: the accumulator version probed 250k rows at the
    # last level where 7k are relevant). Bounded per-level state is also
    # the 100 TB posture: peak join size is one BFS level, not the DAG.
    # Folding the successor semi-join and the g lookup into one inner
    # join against nxt_with_g (every level-(l+1) node, g defaulted to 0)
    # drops a per-level shuffle.
    # r14 optimization round: fewer materializations, same math.
    # - collect_dag=True (edge_betweenness): dag_l must be checkpointed
    #   (the edge score unions every level), but succ is then ONE lazy
    #   groupBy over that checkpointed frame — materializing it too was
    #   a second ~0.5 s fixed-cost job per level for a frame the next
    #   level's join can derive in-plan.
    # - collect_dag=False (betweenness): succ checkpoints every third
    #   level; the in-between frames stay lazy (each succ is referenced
    #   once by the next level's left join, so lineage grows LINEARLY —
    #   no repeated-subtree blowup, the onion-fusion failure mode does
    #   not apply). The final g union recomputes the lazy tail from
    #   checkpointed inputs inside the readout job; identical exchange
    #   subtrees there dedupe via ReuseExchange.
    level_frames: list[DataFrame] = []
    dag_levels: list[DataFrame] = []
    g_above: DataFrame | None = None  # g rows for nodes at level + 1
    since_ckpt = 0
    for level in range(max_dist - 1, -1, -1):
        nodes_l = visited.where(F.col("dist") == level).select("s", "v", "sigma")
        nxt = visited.where(F.col("dist") == level + 1).select(
            "s", F.col("v").alias("n")
        )
        if g_above is None:
            nxt_with_g = nxt.withColumn("g_next", F.lit(0).cast("long"))
        else:
            nxt_with_g = nxt.join(
                g_above.select(
                    "s", F.col("v").alias("n"), F.col("g").alias("g_next")
                ),
                ["s", "n"],
                "left",
            ).select("s", "n", F.coalesce("g_next", F.lit(0)).alias("g_next"))
        dag_l = (
            nodes_l.join(sym, "v")
            .join(nxt_with_g, ["s", "n"])  # inner: only DAG successors
        )
        if collect_dag:
            # Materialize the per-level DAG edges once; the backward
            # aggregate is a lazy groupBy over the checkpointed frame
            # and the edge score reads these frames for free.
            dag_l = materialize(dag_l, state_parts)
            dag_levels.append(dag_l)
        succ = dag_l.groupBy("s", "v").agg(
            F.sum(F.col("g_next") + 1).alias("g")
        )
        if not collect_dag:
            since_ckpt += 1
            if since_ckpt >= 3:
                succ = materialize(succ, state_parts)
                since_ckpt = 0
        level_frames.append(succ)
        g_above = succ

    if level_frames:
        g = level_frames[0]
        for frame in level_frames[1:]:
            g = g.union(frame)
    else:
        g = spark.createDataFrame([], "s long, v long, g long")

    return vertices, visited, g, sym, dag_levels


def betweenness(
    edges: DataFrame,
    sources: DataFrame | None = None,
    num_sources: int | None = None,
    max_iterations: int = 64,
) -> DataFrame:
    """Stress centrality ``(id, betweenness)`` from sampled sources.

    ``sources``: one-column DataFrame of source vertex ids; default = all
    vertices (exact), or the ``num_sources`` smallest ids (deterministic
    sample).
    """
    vertices, visited, g, _, _ = _sigma_g(edges, sources, num_sources, max_iterations)
    scored = (
        visited.where(F.col("dist") >= 1)  # v != s
        .join(g, ["s", "v"])
        .groupBy(F.col("v").alias("id"))
        .agg(F.sum(F.col("sigma") * F.col("g")).alias("betweenness"))
    )
    return (
        vertices.join(scored, "id", "left")
        .select("id", F.coalesce("betweenness", F.lit(0)).alias("betweenness"))
    )


def edge_betweenness(
    edges: DataFrame,
    sources: DataFrame | None = None,
    num_sources: int | None = None,
    max_iterations: int = 64,
) -> DataFrame:
    """Per-EDGE stress centrality ``(src, dst, edge_betweenness)`` —
    the Girvan-Newman primitive (their 2002 community algorithm removes
    the highest-betweenness edge and recomputes). For a source s and a
    shortest-path DAG edge v->w (dist_s(w) = dist_s(v) + 1), the number
    of shortest s->t paths traversing the edge is
    ``sigma(s, v) * (1 + g(s, w))`` — sigma ways in, the +1 counting
    paths that END at w, g(s, w) counting every longer continuation.
    Summed over the source sample and both DAG orientations of the
    undirected edge (least/greatest canonicalization), all in exact
    integers — hash-verified against the same unrolled oracle family as
    the vertex score.

    Cost over betweenness: NONE beyond per-level checkpoints — the
    backward pass already joins each level against its DAG successors
    (with g attached); ``collect_dag=True`` keeps those per-level
    frames, and the edge score is a per-row product over their union
    followed by one (src, dst) aggregation. No re-join of the full
    visited/g state (the r6 form's 3-way visited x sym x visited join
    was the widest plan in the suite — VERDICT r6 #7)."""
    spark = edges.sparkSession
    _, _, _, _, dag_levels = _sigma_g(
        edges, sources, num_sources, max_iterations, collect_dag=True
    )
    if dag_levels:
        all_dag = dag_levels[0]
        for frame in dag_levels[1:]:
            all_dag = all_dag.union(frame)
    else:
        all_dag = spark.createDataFrame(
            [], "s long, v long, sigma long, n long, g_next long"
        )
    scored = (
        all_dag.select(
            F.least("v", "n").alias("src"),
            F.greatest("v", "n").alias("dst"),
            (F.col("sigma") * (F.col("g_next") + F.lit(1))).alias("c"),
        )
        .groupBy("src", "dst")
        .agg(F.sum("c").alias("edge_betweenness"))
    )
    return (
        edges.select("src", "dst")
        .join(scored, ["src", "dst"], "left")
        .select(
            "src",
            "dst",
            F.coalesce("edge_betweenness", F.lit(0)).alias("edge_betweenness"),
        )
    )
