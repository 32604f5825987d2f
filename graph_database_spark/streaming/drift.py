"""Streaming distribution-drift monitor: a continuously maintained
fixed-width histogram (the additive-IVM sink, so replay-proof) with a
binned two-sample KS readout against any reference histogram.

The streaming face of the batch ``ks_drift`` query: at 100 TB you do
not re-scan yesterday's corpus to ask "did today's distribution move" —
you maintain one bounded histogram per stream (64 bins of exact
counts) and compare histograms. Binned KS is the standard monitoring
compromise: D over the shared bin grid is exact integer arithmetic
(max |n2*cumA - n1*cumB|), and the bin width is the only approximation
(documented, fixed at build time).

State maintenance delegates to ``streaming/ivm.additive_agg_stream``,
inheriting its exactly-once batch-skip guard (replayed micro-batches
fold as no-ops); parity with the one-shot batch histogram is
pytest-pinned in tests/test_streaming_drift.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from graph_database_spark.sinks.versioned import read_version
from graph_database_spark.streaming.ivm import additive_agg_stream

__all__ = ["histogram_stream", "histogram_of", "ks_readout"]

N_BINS = 64


def _binned(df: DataFrame, value_col: str, width: int) -> DataFrame:
    return df.select(
        F.expr(
            f"least(CAST({N_BINS - 1} AS BIGINT),"
            f" CAST({value_col} AS BIGINT) div {width})"
        ).alias("bin")
    )


def histogram_stream(
    stream: DataFrame,
    path: str,
    value_col: str,
    width: int,
    checkpoint: str,
):
    """Maintain the 64-bin histogram of ``value_col`` at ``path``
    (one version per micro-batch, replay-proof). Returns the query."""
    # additive_agg maintains count(*) AS n_rows itself — the histogram
    # needs no extra sum column.
    return additive_agg_stream(
        _binned(stream, value_col, width),
        path,
        keys=["bin"],
        sums={},
        checkpoint=checkpoint,
    )


def histogram_of(df: DataFrame, value_col: str, width: int) -> DataFrame:
    """The one-shot batch histogram with the same binning — the parity
    reference and the way callers build the comparison baseline."""
    return (
        _binned(df, value_col, width)
        .groupBy("bin")
        .agg(F.count("*").alias("n_rows"))
    )


def ks_readout(
    spark: SparkSession, path: str, reference: DataFrame
) -> DataFrame:
    """Binned two-sample KS between the maintained histogram at
    ``path`` and a ``reference`` histogram frame (bin, n_rows): ONE row
    (n1, n2, d_num, ks_micro) — exact integers over the shared 64-bin
    grid, no rescan of either corpus."""
    live = read_version(spark, path).select(
        "bin", F.col("n_rows").alias("na")
    )
    ref = reference.select("bin", F.col("n_rows").alias("nb"))
    grid = live.join(ref, "bin", "full_outer").select(
        "bin",
        F.coalesce("na", F.lit(0)).cast("long").alias("na"),
        F.coalesce("nb", F.lit(0)).cast("long").alias("nb"),
    )
    tot = grid.agg(F.sum("na").alias("n1"), F.sum("nb").alias("n2"))
    run = (
        grid.crossJoin(F.broadcast(tot))
        .withColumn(
            "cum",
            F.expr(
                "sum(n2 * na - n1 * nb) OVER (ORDER BY bin)"
            ),
        )
    )
    # The 64-row grid is a bounded model frame — the unpartitioned
    # window is over the bin universe, never the data.
    return run.agg(
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
        F.max(F.abs(F.col("cum"))).alias("d_num"),
        F.expr(
            "(1000000 * max(abs(cum))) div (max(n1) * max(n2))"
        ).alias("ks_micro"),
    )
