"""Rank-2 ALS matrix factorization over a (user, item, rating) frame —
the collaborative-filtering model step beyond item_cf's neighborhood
scores, and the embedding-producing training loop a recsys pipeline
runs at scale (the public alternating-least-squares recipe: fix item
factors, solve every user's 2x2 ridge system in closed form, swap).

Exactness discipline (the logistic_calibration philosophy, but fully
distributed — every solve is per-entity, no driver state):

* Factors are integer CENTI-units (x100). Initial item factors are
  md5-derived in [-100, 100] (|value| <= 1.0).
* Each entity's normal equations use MEAN-normalized sufficient
  statistics (sums followed by one truncating ``div n``): dividing A
  and b by the same n cancels mathematically but keeps det = a11*a22 -
  a12^2 bounded by (c^2 + lam)^2 INDEPENDENT of ratings-per-entity, so
  nothing overflows int64 at any fan-in (the item_cf hot-basket lesson
  applied to arithmetic range).
* The 2x2 ridge solve is the exact adjugate formula over integers:
  f = (10000 * (adj(A) b)) div det, clamped to +-2000 centi (+-20.0).
  Spark ``div`` and DuckDB ``//`` both truncate toward zero
  (CLAUDE.md), so the oracle replays every round bit for bit.

At 100 TB: ratings is the only large frame (checkpointed once); each
round is one broadcast join of the entity-count-sized factor table +
one combinable groupBy. No driver loop over data, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

CLAMP = 2000          # +-20.0 in centi-units
LAM = 10000           # ridge lambda = 1.0 in centi^2 units
SCALE = 10000         # centi^2 -> centi solve rescale


def init_factors(ids: DataFrame, id_col: str, salt: str) -> DataFrame:
    """Deterministic md5 item-factor init in [-100, 100] centi."""
    def h(tag: str):
        return F.expr(
            f"CAST(conv(substr(md5(concat('{salt}{tag}|',"
            f" CAST({id_col} AS STRING))), 1, 15), 16, 10) AS BIGINT)"
            f" % 201 - 100"
        )

    return ids.select(
        F.col(id_col).alias("fid"),
        h("a").cast("long").alias("f1"),
        h("b").cast("long").alias("f2"),
    )


def solve_side(
    ratings: DataFrame,
    factors: DataFrame,
    join_col: str,
    group_col: str,
) -> DataFrame:
    """One ALS half-step: join current factors on ``join_col``, solve
    the mean-normalized 2x2 ridge system per ``group_col`` entity.
    Returns (fid, f1, f2) for the solved side."""
    j = ratings.join(
        F.broadcast(factors.withColumnRenamed("fid", join_col)),
        join_col,
    )
    suff = j.groupBy(F.col(group_col).alias("fid")).agg(
        F.count("*").alias("n"),
        F.sum(F.col("f1") * F.col("f1")).alias("a11s"),
        F.sum(F.col("f1") * F.col("f2")).alias("a12s"),
        F.sum(F.col("f2") * F.col("f2")).alias("a22s"),
        F.sum(F.col("r") * F.col("f1")).alias("b1s"),
        F.sum(F.col("r") * F.col("f2")).alias("b2s"),
    )
    return suff.select(
        "fid",
        F.expr(_solve_expr("f1")).alias("f1"),
        F.expr(_solve_expr("f2")).alias("f2"),
    )


def _solve_expr(which: str) -> str:
    """Generated integer solve for one factor component; the DuckDB
    mirror below is generated from the same template."""
    return _solve_sql(which, div="div")


def _solve_sql(which: str, div: str) -> str:
    a11 = f"(a11s {div} n + {LAM})"
    a12 = f"(a12s {div} n)"
    a22 = f"(a22s {div} n + {LAM})"
    b1 = f"(b1s {div} n)"
    b2 = f"(b2s {div} n)"
    det = f"greatest({a11} * {a22} - {a12} * {a12}, 1)"
    num = (
        f"({a22} * {b1} - {a12} * {b2})"
        if which == "f1"
        else f"({a11} * {b2} - {a12} * {b1})"
    )
    return (
        f"greatest(CAST(-{CLAMP} AS BIGINT), least(CAST({CLAMP} AS BIGINT),"
        f" ({SCALE} * {num}) {div} {det}))"
    )


def duckdb_solve_sql(which: str) -> str:
    """DuckDB mirror of the per-entity solve, operand for operand."""
    return _solve_sql(which, div="//")


def als_user_factors(ratings: DataFrame) -> DataFrame:
    """Run init -> users -> items -> users (two user solves, one item
    solve) and return the final user factors ``(fid, f1, f2)``.

    ``ratings`` must expose (u, p, r) with integer r. Three broadcast
    joins + three combinable groupBys; ratings is checkpointed once so
    each round rescans the materialized frame, not the build plan.
    """
    r = ratings.localCheckpoint()
    v0 = init_factors(r.select("p").distinct(), "p", "als")
    u1 = solve_side(r, v0, "p", "u").localCheckpoint()
    v1 = solve_side(r, u1, "u", "p").localCheckpoint()
    return solve_side(r, v1, "p", "u")
