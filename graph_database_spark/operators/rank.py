"""Distributed global rank without a single-partition window.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY moves the
whole frame to one task — fine for a 20-row report, fatal for an
O(N)-row frame at cluster scale. ``global_rank`` computes the identical
1-based total-order rank with a range shuffle instead:

1. ``repartitionByRange`` on the order columns, so partition p holds a
   contiguous key range and every key in partition p sorts before every
   key in partition p+1;
2. count rows per partition (a #partitions-sized driver collect — a
   bounded model, same class as the IVF centroid pull);
3. rank = cumulative offset of the partition + row_number within it.

The range-partitioned frame is localCheckpoint'ed so the count pass and
the rank pass see the SAME partition boundaries (RangePartitioner
samples; two evaluations could otherwise disagree).

The order columns must form a total order (ties would make the rank
partition-placement-dependent); callers append a unique id as the last
key, exactly as they would under the window form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_rank(df: DataFrame, order_cols, out_col: str = "r") -> DataFrame:
    """1-based global rank over a total order, computed distributed.

    ``order_cols`` is a list of column names or Columns defining a total
    order (ascending). Returns ``df`` plus ``out_col``.
    """
    spark = df.sparkSession
    parts = spark.sparkContext.defaultParallelism
    keyed = (
        df.repartitionByRange(parts, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = keyed.groupBy("__pid").count().collect()
    offsets, total = {}, 0
    for row in sorted(counts, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = total
        total += row["count"]
    if not offsets:
        return df.withColumn(out_col, F.lit(0).cast("long")).drop("__pid")
    off_expr = "map(" + ",".join(
        f"{pid},{off}" for pid, off in offsets.items()
    ) + ")"
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    return (
        keyed.withColumn(
            out_col,
            (
                F.row_number().over(w)
                + F.expr(off_expr)[F.col("__pid")].cast("long")
            ).cast("long"),
        )
        .drop("__pid")
    )


def global_prefix_sum(
    df: DataFrame, order_cols, value_col: str, out_col: str = "running"
) -> DataFrame:
    """Running sum of ``value_col`` over a global total order, computed
    distributed — the sweep-line / cumulative-scan primitive.

    Same shape as :func:`global_rank`: range-partition on the order
    columns, per-partition window sums, and a #partitions-sized driver
    collect of partition totals turned into broadcast offsets. A bare
    ``sum() OVER (ORDER BY ...)`` would drag every row onto one task.
    """
    spark = df.sparkSession
    parts = spark.sparkContext.defaultParallelism
    keyed = (
        df.repartitionByRange(parts, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    sums = keyed.groupBy("__pid").agg(F.sum(value_col).alias("s")).collect()
    offsets, total = {}, 0
    for row in sorted(sums, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = total
        total += row["s"] or 0
    if not offsets:
        return df.withColumn(out_col, F.lit(0).cast("long"))
    off_expr = "map(" + ",".join(
        f"{pid},{off}" for pid, off in offsets.items()
    ) + ")"
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        keyed.withColumn(
            out_col,
            (
                F.sum(value_col).over(w)
                + F.expr(off_expr)[F.col("__pid")].cast("long")
            ).cast("long"),
        )
        .drop("__pid")
    )


def rank_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    max_score_universe: int | None = 100_000,
) -> DataFrame:
    """Exact tie-corrected Mann-Whitney AUC of ``score_col`` as a
    ranker for boolean ``label_col``: one row ``(n_pos, n_neg,
    auc_micro)`` — the standard eval for "does this quality signal
    actually separate the classes", computed without floats: average
    ranks for ties enter doubled (2R is an integer), U = (2R -
    n_pos(n_pos+1)) / 2, and auc_micro is the half-up integer division
    (2U * 10^6) / (2 n_pos n_neg).

    Plan: one aggregation to the DISTINCT-score frame, a running-count
    window over it (bounded by the score universe), one final 1-row
    fold. The raw rows are never ranked individually. The bounded-
    universe contract is ENFORCED (VERDICT r9 #4): the grouped frame is
    materialized (localCheckpoint — the window reuses it, so the guard
    count is ~free) and more than ``max_score_universe`` distinct
    scores raises instead of silently single-partition-stalling the
    unpartitioned window; quantile-bin a continuous score first, or
    rebase on global_prefix_sum (mannwhitney_u does). Pass None to skip
    when the caller already knows the universe is bounded."""
    g = (
        df.select(
            F.col(score_col).alias("s"),
            F.col(label_col).cast("int").alias("y"),
        )
        .groupBy("s")
        .agg(F.count("*").alias("cnt"), F.sum("y").alias("pos"))
        .localCheckpoint()
    )
    if max_score_universe is not None:
        n_s = g.count()
        if n_s > max_score_universe:
            raise ValueError(
                f"rank_auc: score universe has {n_s} distinct values "
                f"(> {max_score_universe}); the running-count window "
                "would move them all to one partition — quantile-bin "
                "the score first or use stats_tests.mannwhitney_u's "
                "global_prefix_sum formulation"
            )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    two_r = g.select(
        "cnt",
        "pos",
        (
            F.col("pos")
            * (2 * F.coalesce(F.sum("cnt").over(w), F.lit(0)) + F.col("cnt") + 1)
        ).alias("pr"),
    )
    return (
        two_r.agg(
            F.sum("pos").alias("n_pos"),
            (F.sum("cnt") - F.sum("pos")).alias("n_neg"),
            F.sum("pr").alias("two_r"),
        )
        .select(
            "n_pos",
            "n_neg",
            F.expr(
                "(2 * (two_r - n_pos * (n_pos + 1)) * 1000000"
                " + 2 * n_pos * n_neg) div (2 * 2 * n_pos * n_neg)"
            ).alias("auc_micro"),
        )
    )
