"""Borůvka maximum spanning forest over a weighted undirected graph.

The backbone-extraction / single-linkage-clustering primitive: keep, per
growing component, its strongest outgoing tie until no inter-component
edge remains. Borůvka is the distributed-native MST algorithm — every
round each component picks one edge (a single grouped max) and the
number of components at least halves, so the outer loop is
O(log |V|) rounds with per-round cost dominated by one edges-to-labels
join over the SHRINKING cross-edge set (the kcore/coloring edge-state
pattern from CLAUDE.md).

Determinism: edges are ordered by the composite key
``(w DESC, src ASC, dst ASC)``. A strict total order on edges is
equivalent to all-distinct weights, under which the spanning forest is
UNIQUE — so the output is algorithm-independent and retry-stable. That
uniqueness is what makes the query hash-verifiable: the DuckDB oracle
(catalog.ORACLES["max_spanning_forest"]) runs a DIFFERENT Borůvka
(lazy one-hop contraction in a recursive CTE, sound by the cut
property) and converges to the identical edge set; a pure-Python
Kruskal pytest (tests/test_r7b_operators.py) pins it a third way.

Contraction per round reuses :func:`connected_components` on the
component graph (one node per component, one edge per chosen tie — at
most |V| rows, halving each round), not on the data graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graph_database_spark.operators.fixpoint import (
    materialize,
    reset_plan_stats,
)


def _mat(df: DataFrame) -> DataFrame:
    # materialize + stats reset: this operator SELF-JOINS its evolving
    # state (p2 pointer doubling, labels <- p2, e <- cross(e)), which
    # squares localCheckpoint's carried sizeInBytes estimate per round
    # and sends the optimizer into million-bit BigInteger arithmetic —
    # see reset_plan_stats' docstring for the measurements.
    return reset_plan_stats(materialize(df))


def max_spanning_forest(edges: DataFrame, max_rounds: int = 24) -> DataFrame:
    """``(src, dst, w)`` — the unique maximum spanning forest of the
    canonical (src < dst) weighted edge set under ``(w DESC, src, dst)``
    tie-breaking. Raises if ``max_rounds`` Borůvka rounds do not
    exhaust the cross edges (rounds needed ≈ log2 of the largest
    component, far below the default)."""
    e = _mat(
        edges.select("src", "dst", F.col("w").cast("long").alias("w"))
    )
    labels = _mat(
        e.select(F.col("src").alias("v"))
        .union(e.select(F.col("dst").alias("v")))
        .distinct()
        .select("v", F.col("v").alias("lbl"))
    )
    forest_parts: list[DataFrame] = []
    for rnd in range(max_rounds):
        if rnd == 0:
            # labels are the identity in round 0 — the relabel joins
            # would be no-ops over the LARGEST edge frame of the run
            cross = e.select(
                "src",
                "dst",
                "w",
                F.col("src").alias("cs"),
                F.col("dst").alias("cd"),
            )
        else:
            # The cross-edge liveness probe rides the checkpoint job as
            # an observe() metric (r14 optimization round) — no
            # separate isEmpty job per round.
            from pyspark.sql import Observation

            obs = Observation(f"msf_cross_{rnd}")
            cross = _mat(
                e.join(
                    labels.select(
                        F.col("v").alias("src"), F.col("lbl").alias("cs")
                    ),
                    "src",
                )
                .join(
                    labels.select(
                        F.col("v").alias("dst"), F.col("lbl").alias("cd")
                    ),
                    "dst",
                )
                .where(F.col("cs") != F.col("cd"))
                .select("src", "dst", "w", "cs", "cd")
                .observe(obs, F.count(F.lit(1)).alias("n"))
            )
            if not obs.get["n"]:
                break
        # next round only ever needs edges still crossing components
        e = cross.select("src", "dst", "w")
        both = cross.select(
            F.col("cs").alias("c"), "src", "dst", "w", F.col("cd").alias("oc")
        ).unionByName(
            cross.select(
                F.col("cd").alias("c"), "src", "dst", "w", F.col("cs").alias("oc")
            )
        )
        # strongest tie per component: max w, ties to the smallest
        # (src, dst). (w, -src, -dst) is unique per edge, so the
        # trailing payload fields never decide the max.
        chosen = _mat(
            both.groupBy("c")
            .agg(
                F.max(
                    F.struct(
                        F.col("w"),
                        (-F.col("src")).alias("ns"),
                        (-F.col("dst")).alias("nd"),
                        F.col("src"),
                        F.col("dst"),
                        F.col("oc"),
                    )
                ).alias("b")
            )
            .select(
                "c",
                F.col("b.src").alias("src"),
                F.col("b.dst").alias("dst"),
                F.col("b.w").alias("w"),
                F.col("b.oc").alias("oc"),
            )
        )
        # the same edge is typically chosen from both sides — dedupe
        forest_parts.append(chosen.select("src", "dst", "w").distinct())
        # Contract via pointer doubling, not a nested CC fixpoint: the
        # best-edge pointer graph has strictly increasing weights along
        # every chain, so each merge component contains exactly one
        # 2-cycle (its locally-maximum edge, picked from both sides).
        # Break it min-wise to get a rooted forest, then double
        # (p := p(p)) to collapse depth in O(log chain) tiny joins —
        # measured 29.2 -> ~13 s at sf0.1 vs the per-round
        # connected_components call this replaces. Labels only need to
        # be ANY consistent representative (they never reach the
        # output), and partial contraction is sound by the cut
        # property, so the jump loop needs no raise: leftover chains
        # just spend one more outer round.
        ptr = chosen.select("c", F.col("oc").alias("p"))
        p2 = _mat(
            ptr.alias("x")
            .join(
                ptr.select(F.col("c").alias("p"), F.col("p").alias("pp")),
                "p",
                "left",
            )
            .select(
                "c",
                F.when(F.col("pp") == F.col("c"), F.least("c", "p"))
                .otherwise(F.col("p"))
                .alias("p"),
            )
        )
        for _jump in range(16):
            from pyspark.sql import Observation

            obs_j = Observation(f"msf_jump_{rnd}_{_jump}")
            nxt = _mat(
                p2.alias("x")
                .join(
                    p2.select(F.col("c").alias("p"), F.col("p").alias("pp")),
                    "p",
                    "left",
                )
                .select(
                    "c",
                    F.col("p").alias("prev"),
                    F.coalesce("pp", F.col("p")).alias("p"),
                )
                .observe(
                    obs_j,
                    F.sum(
                        (F.col("p") != F.col("prev")).cast("long")
                    ).alias("chg"),
                )
            )
            done = not (obs_j.get["chg"] or 0)
            p2 = nxt.select("c", "p")
            if done:
                break
        labels = _mat(
            labels.join(
                p2.select(F.col("c").alias("lbl"), "p"), "lbl", "left"
            ).select("v", F.coalesce("p", F.col("lbl")).alias("lbl"))
        )
    else:
        raise RuntimeError(
            f"max_spanning_forest: not exhausted after {max_rounds} rounds"
        )
    if not forest_parts:
        return e.select("src", "dst", "w").limit(0)
    out = forest_parts[0]
    for p in forest_parts[1:]:
        out = out.unionByName(p)
    return out.distinct()
