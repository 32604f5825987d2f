"""Weighted one-mode projection of a two-mode (bipartite) frame.

A user-item purchase matrix, a doc-term incidence list, an author-paper
graph — all two-mode frames whose standard analysis step is the
PROJECTION: connect two items when they share a group, weighted by how
many groups they share. ``project_counts`` is that operator, with the
same scalar-rides-the-shuffle discipline as the dedup family (only the
item id travels through the pair explosion, never baskets or arrays)
and a hot-group guard nothing ad hoc had (r8 VERDICT's one
scale-killer: item_cf's unguarded customer self-join).

Hot-group guard: the pair generation self-joins on the group key, so
one power-law group (a 100k-item customer, a stop-word term) emits
C(m,2) rows on a SINGLE join key — AQE's skew splitting cannot divide
one key's build side, and its byte-based coalescing actively folds the
tiny-bytes/huge-compute cells back together (CLAUDE.md, linkage
edition). Groups above ``hot_threshold`` are therefore grid-decomposed
exactly like operators/linkage.block_self_pairs: each side gets a
deterministic item-hash group id in [0, n_groups) and is replicated
n_groups times, splitting the m^2 pair space into n_groups^2
independent (ga, gb) cells on a user-pinned repartition (exempt from
AQE coalescing). Every pair lands in exactly one cell, so the union of
the two paths counts each co-occurrence exactly once — pytest-pinned
byte-identical to the plain join (tests/test_bipartite.py).

Cost model: hot rows are replicated n_groups times (bytes) in exchange
for m^2/n_groups^2 pairs per task instead of m^2; the groupBy that
follows is map-side combinable, so the explosion never shuffles raw
pair instances farther than its own stage boundary.

Reference scope note: the reference engine (src/main.js) has no
bipartite projection; this is part of the mandated LLM-pipeline /
recsys extension surface (item_cf, copurchase analysis).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["project_counts"]


def project_counts(
    df: DataFrame,
    group_col: str,
    item_col: str,
    hot_threshold: int = 4096,
    n_groups: int = 8,
    min_count: int = 1,
    out_cols: tuple[str, str, str] = ("item_a", "item_b", "co"),
    weight_col: str | None = None,
    combine: str = "count",
) -> DataFrame:
    """Weighted one-mode projection: ``(item_a, item_b, co)`` with
    ``item_a < item_b`` and ``co >= min_count``, where ``co`` combines
    the pair's per-group weights:

    - ``combine="count"`` (default): number of shared groups;
    - ``combine="least"``: ``sum(least(w_a, w_b))`` — the multiset
      intersection mass (weighted-Jaccard numerator);
    - ``combine="product"``: ``sum(w_a * w_b)`` — the inner product
      (co-occurrence cosine numerator).

    ``df`` must be DISTINCT on (group, item) — duplicates would inflate
    counts, and deduping here would waste a shuffle when the caller
    already has the invariant. Groups larger than ``hot_threshold``
    take the grid decomposition; the rest the plain self-join."""
    ia, ib, co = out_cols
    if combine == "count":
        pair_w = F.count("*")
    elif combine == "least":
        pair_w = F.sum(F.least(F.col("_wa"), F.col("_wb")))
    elif combine == "product":
        pair_w = F.sum(F.col("_wa") * F.col("_wb"))
    else:
        raise ValueError(f"unknown combine {combine!r}")
    w = F.col(weight_col) if weight_col else F.lit(1).cast("long")
    sizes = df.groupBy(group_col).agg(F.count("*").alias("_gn"))
    packed = (
        df.select(group_col, item_col, w.alias("_w"))
        .join(sizes, group_col)
        .localCheckpoint()  # feeds both paths' both sides
    )

    cold = packed.where(F.col("_gn") <= hot_threshold)
    cold_pairs = (
        cold.select(group_col, F.col(item_col).alias(ia), F.col("_w").alias("_wa"))
        .join(
            cold.select(
                group_col, F.col(item_col).alias(ib), F.col("_w").alias("_wb")
            ),
            group_col,
        )
        .where(F.col(ia) < F.col(ib))
        .select(ia, ib, "_wa", "_wb")
    )

    hot = packed.where(F.col("_gn") > hot_threshold)
    grp = F.pmod(F.xxhash64(F.col(item_col).cast("string")), F.lit(n_groups)).cast(
        "int"
    )
    gseq = F.explode(F.expr(f"sequence(0, {n_groups - 1})"))
    # Pinned repartition BY the composite key: grid cells are tiny
    # bytes but enormous compute, and AQE byte-coalescing would fold
    # them onto one task (measured in linkage.py, 253 s). A user-pinned
    # repartition is exempt and satisfies the join's distribution
    # requirement, so no extra Exchange is added.
    parts = df.sparkSession.sparkContext.defaultParallelism
    hot_a = hot.select(
        group_col,
        F.col(item_col).alias(ia),
        F.col("_w").alias("_wa"),
        grp.alias("_ga"),
        gseq.alias("_gb"),
    ).repartition(parts, group_col, "_ga", "_gb")
    hot_b = hot.select(
        group_col,
        F.col(item_col).alias(ib),
        F.col("_w").alias("_wb"),
        gseq.alias("_ga"),
        grp.alias("_gb"),
    ).repartition(parts, group_col, "_ga", "_gb")
    hot_pairs = (
        hot_a.join(hot_b, [group_col, "_ga", "_gb"])
        .where(F.col(ia) < F.col(ib))
        .select(ia, ib, "_wa", "_wb")
    )

    out = (
        cold_pairs.unionByName(hot_pairs)
        .groupBy(ia, ib)
        .agg(pair_w.alias(co))
    )
    if min_count > 1:
        out = out.where(F.col(co) >= min_count)
    return out
