"""Nonparametric two-sample tests and rank correlation — the drift /
A-B diagnostics a data pipeline runs before trusting a new corpus
snapshot (KS distance between yesterday's and today's distributions,
rank tests when the metric is heavy-tailed, Spearman when the relation
is monotone but not linear).

The reference engine has no statistics surface (src/main.js:1-296 is a
loader/dispatcher); these extend the ab_test_welch / psi_drift family.

Exactness discipline (CLAUDE.md micro rule): every statistic here is
built from INTEGER sufficient statistics so group sums are
partition-order-exact cross-engine:

- KS: D = max_v |n2*cumA(v) - n1*cumB(v)| is an integer numerator over
  the merged value grid; the running sum uses the distributed
  ``global_prefix_sum`` (never a bare ORDER BY window).
- Mann-Whitney: tie-averaged ranks are half-integers, so everything is
  carried 2-scaled (2*avg_rank = 2*cum_before + cnt + 1 — integer), and
  the tie-correction term sum(t^3 - t) is exact.
- Spearman: per-group 2-scaled average ranks feed integer
  (num, dxx, dyy); the single final rho involves one sqrt and one
  division — both IEEE exactly-rounded ops over identical exact
  integers, then ``floor`` (mode-free, unlike round-half) to micro.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graph_database_spark.operators.rank import global_prefix_sum


def ks_2sample(
    df: DataFrame, value_col: str, flag_col: str
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance, exact integer form.

    ``flag_col`` is 1 for sample A, 0 for sample B; ``value_col`` must
    be integral (callers snap money to cents). Returns ONE row:
    (n1, n2, d_num, ks_micro) where d_num = max_v |n2*cumA - n1*cumB|
    and KS D = d_num / (n1*n2), reported floor-scaled to micro.

    Plan: one groupBy on the value grid (|grid| <= |rows| distinct
    values), one range shuffle for the prefix sum, one bounded agg.

    Integer headroom (ADVICE r9): d_num can reach n1*n2, so the naive
    1e6 scaling overflows int64 once n1*n2 > 2^63/1e6 ~ 9.2e12 — only
    ~3e6 rows per side, NOT the 3e9 an earlier docstring claimed. Above
    that the scaling switches (CASE, same expression both engines) to
    divide-by-the-smaller-side-first: (1e6*(d div least)) div greatest,
    exact to < 1 micro in-branch (greatest > 3e6 there) and safe up to
    the operator's intrinsic ~3e9/side cap (n2*cumA itself must fit
    int64).
    """
    grid = (
        df.groupBy(F.col(value_col).alias("v"))
        .agg(
            F.sum(F.col(flag_col).cast("long")).alias("na"),
            F.sum(1 - F.col(flag_col).cast("long")).alias("nb"),
        )
    )
    tot = grid.agg(
        F.sum("na").alias("n1"), F.sum("nb").alias("n2")
    )
    diff = grid.crossJoin(F.broadcast(tot)).select(
        "v",
        "n1",
        "n2",
        (F.col("n2") * F.col("na") - F.col("n1") * F.col("nb")).alias(
            "d"
        ),
    )
    run = global_prefix_sum(diff, ["v"], "d", "cum")
    return run.agg(
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
        F.max(F.abs(F.col("cum"))).alias("d_num"),
        F.expr(
            "CASE WHEN max(n1) * max(n2) <= 9223372036854"
            " THEN (1000000 * max(abs(cum))) div (max(n1) * max(n2))"
            " ELSE (1000000 * (max(abs(cum)) div least(max(n1), max(n2))))"
            " div greatest(max(n1), max(n2)) END"
        ).alias("ks_micro"),
    )


def mannwhitney_u(
    df: DataFrame, value_col: str, flag_col: str
) -> DataFrame:
    """Mann-Whitney U with exact tie handling, 2-scaled integers.

    Tie-averaged rank of a tie group occupying positions s..s+cnt-1 is
    (2s + cnt - 1)/2; with s = cum_before + 1 the 2-scaled rank is
    2*cum_before + cnt + 1 — integer. Returns ONE row: (n1, n2, r1_x2,
    u1_x2, tie_t3_minus_t, u_eff_micro) where u1_x2 = 2*U1 and
    u_eff_micro = floor-scaled U1/(n1*n2) (the common-language effect
    size). The tie term sum(t^3 - t) feeds the normal-approx variance
    downstream without another scan.
    """
    grid = (
        df.groupBy(F.col(value_col).alias("v"))
        .agg(
            F.sum(F.col(flag_col).cast("long")).alias("na"),
            F.count("*").cast("long").alias("cnt"),
        )
    )
    run = global_prefix_sum(grid, ["v"], "cnt", "cum")
    tot = run.agg(
        F.sum("na").alias("n1"),
        (F.sum("cnt") - F.sum("na")).alias("n2"),
    )
    return (
        run.crossJoin(F.broadcast(tot))
        .agg(
            F.max("n1").alias("n1"),
            F.max("n2").alias("n2"),
            F.sum(
                F.col("na") * (2 * (F.col("cum") - F.col("cnt")) + F.col("cnt") + 1)
            ).alias("r1_x2"),
            F.sum(
                F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")
            ).alias("tie_t3_minus_t"),
        )
        .select(
            "n1",
            "n2",
            "r1_x2",
            (F.col("r1_x2") - F.col("n1") * (F.col("n1") + 1)).alias(
                "u1_x2"
            ),
            "tie_t3_minus_t",
            F.expr(
                "(1000000 * (r1_x2 - n1 * (n1 + 1)))"
                " div (2 * n1 * n2)"
            ).alias("u_eff_micro"),
        )
    )


def spearman_grouped(
    df: DataFrame, group_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Per-group Spearman rank correlation with tie-averaged ranks.

    Ranks are computed WITHIN each group (windows partitioned by the
    group key — bounded by group size, the per-entity shape every
    grouped statistic here uses), 2-scaled to keep tie averages
    integral. Per group returns the exact integer sufficient statistics
    (num, dxx, dyy) of Pearson-on-ranks plus rho_micro =
    floor(1e6*num / sqrt(dxx*dyy)) — the sqrt and the division are the
    only float ops, both IEEE exactly-rounded over identical exact
    integers, so the two engines agree bit for bit; floor (not round)
    keeps the snap mode-free.
    """
    gx = Window.partitionBy(group_col).orderBy(x_col)
    gy = Window.partitionBy(group_col).orderBy(y_col)
    ranked = df.select(
        F.col(group_col).alias("g"),
        (
            2 * F.rank().over(gx)
            + F.count("*").over(Window.partitionBy(group_col, x_col))
            - 1
        ).cast("long").alias("rx2"),
        (
            2 * F.rank().over(gy)
            + F.count("*").over(Window.partitionBy(group_col, y_col))
            - 1
        ).cast("long").alias("ry2"),
    )
    suff = ranked.groupBy("g").agg(
        F.count("*").alias("n"),
        F.sum("rx2").alias("sx"),
        F.sum("ry2").alias("sy"),
        F.sum(F.col("rx2") * F.col("ry2")).alias("sxy"),
        F.sum(F.col("rx2") * F.col("rx2")).alias("sxx"),
        F.sum(F.col("ry2") * F.col("ry2")).alias("syy"),
    )
    return suff.select(
        "g",
        "n",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias(
            "num"
        ),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias(
            "dxx"
        ),
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).alias(
            "dyy"
        ),
    ).select(
        "g",
        "n",
        "num",
        "dxx",
        "dyy",
        F.expr(
            "CASE WHEN dxx > 0 AND dyy > 0 THEN"
            " CAST(floor(CAST(1000000 * num AS DOUBLE)"
            " / sqrt(CAST(dxx AS DOUBLE) * CAST(dyy AS DOUBLE)))"
            " AS BIGINT) END"
        ).alias("rho_micro"),
    )


def emd_1d(df: DataFrame, value_col: str, flag_col: str) -> DataFrame:
    """Exact 1-D Wasserstein-1 (earth mover's) distance between two
    samples, integer form: W1 = sum over the merged value grid of
    |n2*cumA - n1*cumB| * (next_v - v), normalized by n1*n2 — the
    drift metric that weights HOW FAR mass moved where KS only sees
    the largest gap.

    Same distributed shape as :func:`ks_2sample` (grid groupBy + one
    range-shuffled prefix sum); the grid gap (next_v - v) comes from an
    equi-join on consecutive global ranks (the sorted-neighborhood
    pattern), never a single-partition lead window. Returns ONE row
    (n1, n2, w1_num, w1_milli) with w1_milli = (1000*w1_num) div
    (n1*n2) in value units.

    Integer headroom (ADVICE r9): 1000*w1_num overflows int64 once
    w1_num > ~9.2e15; above that the scaling switches (CASE, same
    expression both engines) to divide-by-the-smaller-side-first,
    trading exactness for < 1000/greatest(n1,n2) milli of error. The
    intrinsic cap is w1_num itself (sum of |cum|*gap <= n1*n2*range
    must fit int64) — beyond that consume w1_num raw at a coarser
    value snap.
    """
    from graph_database_spark.operators.rank import global_rank

    grid = (
        df.groupBy(F.col(value_col).alias("v"))
        .agg(
            F.sum(F.col(flag_col).cast("long")).alias("na"),
            F.sum(1 - F.col(flag_col).cast("long")).alias("nb"),
        )
    )
    tot = grid.agg(F.sum("na").alias("n1"), F.sum("nb").alias("n2"))
    diff = grid.crossJoin(F.broadcast(tot)).select(
        "v",
        "n1",
        "n2",
        (F.col("n2") * F.col("na") - F.col("n1") * F.col("nb")).alias(
            "d"
        ),
    )
    run = global_prefix_sum(diff, ["v"], "d", "cum").localCheckpoint()
    ranked = global_rank(run, ["v"], out_col="r")
    nxt = ranked.select(
        (F.col("r") - 1).alias("r"), F.col("v").alias("v_next")
    )
    seg = ranked.join(nxt, "r")  # drops the last grid point (no gap)
    return seg.agg(
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
        F.sum(
            F.abs(F.col("cum")) * (F.col("v_next") - F.col("v"))
        ).alias("w1_num"),
        F.expr(
            "CASE WHEN sum(abs(cum) * (v_next - v)) <= 9223372036854775"
            " THEN (1000 * sum(abs(cum) * (v_next - v)))"
            " div (max(n1) * max(n2))"
            " ELSE (1000 * (sum(abs(cum) * (v_next - v))"
            " div least(max(n1), max(n2)))) div greatest(max(n1), max(n2))"
            " END"
        ).alias("w1_milli"),
    )
