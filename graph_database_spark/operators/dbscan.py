"""Grid-blocked DBSCAN (Ester et al. 1996) over 2-D integer points —
the density clustering primitive next to kmeans_assign's centroid
model: finds arbitrarily-shaped clusters and an explicit NOISE class,
with no k to choose.

Determinized exactly (textbook DBSCAN's border assignment depends on
visit order): core points are order-free by definition (>= min_pts
neighbors within eps, self included); clusters are connected components
of the core-core eps-graph labeled by MIN core id (the hash-min
fixpoint's invariant, so the oracle's min-reach recursive CTE agrees);
border points join the MINIMUM cluster label among their in-eps cores.
Every quantity is integer (squared L2 distances), so the whole operator
hash-verifies.

Scale shape: the eps-neighborhood join is the band_join_pairs pattern
lifted to 2-D — each point's cell is ``(x div eps, y div eps)``, the
probe side explodes to its 3x3 cell neighborhood, and candidates meet
on ONE (cx, cy) equi-join (every true pair meets exactly once, at the
build point's home cell). Cost is sum of per-cell products — bounded by
the densest cell, the same occupancy knob as every blocked join here
(shrink eps or pre-aggregate duplicate coordinates if a cell goes hot).
Coordinates must be NON-NEGATIVE integers: Spark ``div`` truncates
toward zero while floor-division semantics differ across engines below
zero — shift inputs first (the catalog query does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graph_database_spark.operators.components import connected_components

__all__ = ["dbscan_grid"]


def dbscan_grid(
    points: DataFrame,
    eps: int,
    min_pts: int,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    max_iterations: int = 50,
) -> DataFrame:
    """``(id, n_eps, role, cluster)`` for every input point: role in
    ('core', 'border', 'noise'); cluster = min core id of the
    component, -1 for noise."""
    eps2 = eps * eps
    p = points.select(
        F.col(id_col).alias("id"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    ).localCheckpoint()  # probe, build, and the final left-join
    build = p.select(
        "id", "x", "y",
        F.expr(f"x div {eps}").alias("cx"),
        F.expr(f"y div {eps}").alias("cy"),
    )
    probe = p.select(
        F.col("id").alias("ia"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.explode(F.expr("sequence(-1, 1)")).alias("dx"),
    ).select(
        "ia", "xa", "ya",
        (F.expr(f"xa div {eps}") + F.col("dx")).alias("cx"),
        F.explode(F.expr("sequence(-1, 1)")).alias("dy"),
    ).select(
        "ia", "xa", "ya", "cx",
        (F.expr(f"ya div {eps}") + F.col("dy")).alias("cy"),
    )
    pairs = (
        probe.join(build, ["cx", "cy"])
        .where(
            F.expr(
                f"(xa - x) * (xa - x) + (ya - y) * (ya - y) <= {eps2}"
            )
        )
        .select("ia", F.col("id").alias("ib"))
        .localCheckpoint()  # neighbor counts, core edges, border pick
    )
    neps = pairs.groupBy(F.col("ia").alias("id")).agg(
        F.count("*").alias("n_eps")
    )
    core = neps.where(F.col("n_eps") >= min_pts).select("id").localCheckpoint()
    core_edges = (
        pairs.where(F.col("ia") < F.col("ib"))
        .join(core.select(F.col("id").alias("ia")), "ia")
        .join(core.select(F.col("id").alias("ib")), "ib")
        .select(F.col("ia").alias("src"), F.col("ib").alias("dst"))
    )
    # Quotient the core graph by fine grid cells before the CC fixpoint
    # (r14 optimization round). Cores in dense regions make the core-core
    # eps-graph huge (886k edges over ~13k cores at sf0.1; the CC fixpoint
    # was 9.4 s of dbscan's 11.6). Any two cores in the same g-cell with
    # 2*(g-1)^2 <= eps^2 are within eps (max coordinate gap g-1 each
    # axis), so every cell's cores form a CLIQUE in core_edges and the
    # quotient graph has exactly the same connected components. Labels
    # are preserved exactly: component min core id = min over the
    # component's cells of the per-cell min core id. In-session A/B at
    # sf0.1: 15.9 -> 8.9 s, output row-identical.
    g = int((eps2 / 2) ** 0.5) + 1
    while 2 * (g - 1) * (g - 1) > eps2:
        g -= 1
    # Cell key packs (x div g, y div g) into one BIGINT; requires
    # 0 <= y div g < 1_000_000 (non-negative coords are already a
    # documented precondition; y < g * 1e6 bounds the second axis).
    cellof = core.join(p, "id").select(
        "id",
        (F.expr(f"x div {g}") * F.lit(1_000_000) + F.expr(f"y div {g}")).alias(
            "cell"
        ),
    ).localCheckpoint()  # per-cell min, two edge-label joins, readout
    mcell = cellof.groupBy("cell").agg(F.min("id").alias("mid"))
    cell_edges = (
        core_edges
        .join(cellof.select(F.col("id").alias("src"), F.col("cell").alias("ca")), "src")
        .join(cellof.select(F.col("id").alias("dst"), F.col("cell").alias("cb")), "dst")
        .where(F.col("ca") != F.col("cb"))
        .select(F.least("ca", "cb").alias("src"), F.greatest("ca", "cb").alias("dst"))
        .distinct()
    )
    comp_c = connected_components(cell_edges, max_iterations=max_iterations)
    # isolated cells (single core, no cross-cell core edge) keep their own
    # cell as component — exactly the old coalesce(component, id) rule
    # lifted to the quotient.
    cl_cell = mcell.join(
        comp_c.withColumnRenamed("id", "cell"), "cell", "left"
    ).withColumn(
        "comp", F.coalesce("component", F.col("cell"))
    ).localCheckpoint()  # tiny (one row per cell); feeds cl AND joins back

    cl = cl_cell.groupBy("comp").agg(F.min("mid").alias("cluster"))
    core_lbl = cellof.join(
        cl_cell.join(cl, "comp").select("cell", "cluster"), "cell"
    ).select("id", "cluster")
    # Single-pass readout (r11, VERDICT r10 next-#6 — replaces three
    # sequential id-keyed left joins + a border groupBy): every point
    # has its self-pair in `pairs`, so ONE left join of pairs against
    # the core labels on ib and ONE groupBy on ia yields everything —
    #   n_eps        = count(*)            (self included, as before)
    #   min(cl_b)    = for a CORE point its own component label (all
    #                  its in-eps cores, self included, share it by
    #                  construction of the core-core edge set); for a
    #                  non-core point the minimum in-eps core cluster
    #                  (the determinized border rule); NULL = noise.
    nbr = pairs.join(
        core_lbl.select(
            F.col("id").alias("ib"), F.col("cluster").alias("cl_b")
        ),
        "ib",
        "left",
    )
    return (
        nbr.groupBy(F.col("ia").alias("id"))
        .agg(F.count("*").alias("n_eps"), F.min("cl_b").alias("cl"))
        .select(
            "id",
            "n_eps",
            F.expr(
                f"CASE WHEN n_eps >= {min_pts} THEN 'core'"
                " WHEN cl IS NOT NULL THEN 'border'"
                " ELSE 'noise' END"
            ).alias("role"),
            F.coalesce("cl", F.lit(-1)).alias("cluster"),
        )
    )
