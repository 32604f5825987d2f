"""Unnormalized Haar wavelet transform over a fixed dyadic window —
the multi-resolution signature of a time series in exact integers.

Level ``l`` halves the series: approximation a_i = x_{2i} + x_{2i+1},
detail d_i = x_{2i} - x_{2i+1} (unnormalized, so every coefficient is
an exact integer — no sqrt(2), no floats, and the DuckDB oracle can
replay all levels as unrolled GROUP BY halvings). The detail pyramid is
the standard change/burst signature (a big |d| at level l flags a
disturbance of duration ~2^l) and the lossy-compression basis: keeping
the top-k coefficients reconstructs the series with bounded L2 error.

The window is a FIXED 4096 slots (12 levels) so the unroll is static —
data-independent, zero-padded; callers map their series onto slot
indexes (the catalog query uses days since the corpus epoch).

Scale: level frames are <= window/2 rows regardless of input size; the
only O(N) work is the first per-slot aggregation. Each level is one
tiny keyed shuffle on an already-bounded frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

WINDOW = 4096
LEVELS = 12  # log2(WINDOW)


def haar_transform(series: DataFrame, idx_col: str, val_col: str) -> DataFrame:
    """All detail coefficients plus the final approximation of the
    zero-padded ``WINDOW``-slot series (rows outside [0, WINDOW) are
    dropped — the caller owns the slot mapping). Returns (lvl, idx,
    kind 'a'|'d', coef)."""
    spark = series.sparkSession
    vals = (
        series.select(
            F.col(idx_col).cast("long").alias("idx"),
            F.col(val_col).cast("long").alias("v"),
        )
        .where((F.col("idx") >= 0) & (F.col("idx") < WINDOW))
        .groupBy("idx")
        .agg(F.sum("v").alias("v"))
    )
    spine = spark.range(WINDOW).select(F.col("id").alias("idx"))
    cur = spine.join(vals, "idx", "left").select(
        "idx", F.coalesce("v", F.lit(0).cast("long")).alias("v")
    )
    outs = []
    for lvl in range(1, LEVELS + 1):
        pair = (
            cur.groupBy(F.expr("idx div 2").alias("idx"))
            .agg(
                F.sum("v").alias("a"),
                F.sum(
                    F.when(F.col("idx") % 2 == 0, F.col("v")).otherwise(
                        -F.col("v")
                    )
                ).alias("d"),
            )
            .localCheckpoint()  # feeds this level's details AND the next level
        )
        outs.append(
            pair.select(
                F.lit(lvl).cast("long").alias("lvl"),
                "idx",
                F.lit("d").alias("kind"),
                F.col("d").alias("coef"),
            )
        )
        cur = pair.select("idx", F.col("a").alias("v"))
    outs.append(
        cur.select(
            F.lit(LEVELS).cast("long").alias("lvl"),
            "idx",
            F.lit("a").alias("kind"),
            F.col("v").alias("coef"),
        )
    )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def haar_sql(series_cte: str) -> str:
    """DuckDB oracle: the same pyramid as unrolled MATERIALIZED
    halvings over ``series_cte`` (which must yield (idx, v) covering
    whatever slots are nonzero; the spine zero-pads). Each level CTE is
    referenced twice (its details and the next level), hence
    MATERIALIZED (CLAUDE.md: DuckDB re-inlines multiply-referenced
    scans otherwise)."""
    parts = [
        f"src AS ({series_cte})",
        f"""l0 AS MATERIALIZED (
  SELECT g.idx, CAST(coalesce(s.v, 0) AS BIGINT) AS v
  FROM (SELECT unnest(range(0, {WINDOW})) AS idx) g
  LEFT JOIN (SELECT idx, CAST(sum(v) AS BIGINT) AS v FROM src
             WHERE idx >= 0 AND idx < {WINDOW} GROUP BY 1) s
    ON s.idx = g.idx)""",
    ]
    for lvl in range(1, LEVELS + 1):
        prev = "l0" if lvl == 1 else f"l{lvl - 1}a"
        parts.append(
            f"""l{lvl} AS MATERIALIZED (
  SELECT idx // 2 AS idx, CAST(sum(v) AS BIGINT) AS a,
         CAST(sum(CASE WHEN idx % 2 = 0 THEN v ELSE -v END) AS BIGINT) AS d
  FROM {prev} GROUP BY 1)"""
        )
        # Each level's approximations feed the next level under the
        # (idx, v) shape.
        parts.append(f"l{lvl}a AS (SELECT idx, a AS v FROM l{lvl})")
    sql_parts = parts
    details = "\nUNION ALL\n".join(
        f"SELECT CAST({lvl} AS BIGINT) AS lvl, idx, 'd' AS kind,"
        f" d AS coef FROM l{lvl}"
        for lvl in range(1, LEVELS + 1)
    )
    final = (
        f"SELECT CAST({LEVELS} AS BIGINT) AS lvl, idx, 'a' AS kind,"
        f" a AS coef FROM l{LEVELS}"
    )
    return (
        "WITH " + ",\n".join(sql_parts) + "\n"
        + details + "\nUNION ALL\n" + final
    )
