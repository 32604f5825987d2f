"""Z-order clustered parquet writer — multi-dimensional data skipping.

Directory partitioning (sinks/parquet.py) prunes on ONE low-cardinality
column; bucketing (sources/bucketed.py) co-locates ONE join key. When
scans filter on TWO numeric dimensions at once (time x user, size x
price), neither helps: sorting by dimension A scatters dimension B
across every file. Interleaving the bits of both dimensions into one
Morton (Z-order) key and range-partitioning + sorting on it keeps rows
close in BOTH dimensions inside each file, so parquet row-group min/max
statistics let 2-D predicate scans skip most of a 100 TB table — the
same layout Delta's OPTIMIZE ZORDER BY and Hudi clustering produce.

Everything is JVM-side expressions: per-column min/max from one tiny
aggregate drives a linear normalization into ``bits``-bit rank space,
and the interleave is a SQL ``aggregate`` HOF over bit positions (no
Python UDF in the write path). ``repartitionByRange`` on the z-value
gives balanced output files via sampled range bounds — at 100 TB that
sampling pass is the same cost any global sort pays, and it is the only
shuffle in the writer.

The locality win is pinned by test (tests/test_zorder.py): on a uniform
2-D grid the mean per-file bounding-box area is far smaller than a
1-D-sorted layout of the same file count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

__all__ = ["with_zorder_key", "write_zordered", "file_extents"]


def _scaled_cols(df: DataFrame, cols: list[str], bits: int) -> list[Column]:
    """``__z<i>`` long columns: each input column linearly normalized
    into [0, 2^bits) rank space. Min/max come from one tiny aggregate,
    collected driver-side as a scalar model parameter (the same shape
    as IVF centroids); constant columns normalize to 0."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    stats = df.agg(*aggs).first()
    top = (1 << bits) - 1
    out = []
    for i, c in enumerate(cols):
        lo, hi = float(stats[f"min_{c}"]), float(stats[f"max_{c}"])
        span = (hi - lo) or 1.0
        out.append(
            F.least(
                F.lit(top).cast("long"),
                F.greatest(
                    F.lit(0).cast("long"),
                    (
                        (F.col(c).cast("double") - F.lit(lo))
                        / F.lit(span)
                        * F.lit(top)
                    ).cast("long"),
                ),
            ).alias(f"__z{i}")
        )
    return out


def with_zorder_key(df: DataFrame, cols: list[str], bits: int = 16) -> DataFrame:
    """``df`` plus a ``__zkey`` Morton key interleaving ``cols`` at
    ``bits`` resolution each (column i owns bit positions i, i+n,
    i+2n, ... LSB-first). len(cols) * bits must fit a signed long.

    The SQL-level HOF keeps the shift amounts as expressions; the
    ``__z<i>`` operands are materialized long columns by the time the
    lambda sees them, so per-bit re-evaluation touches a long, not an
    expression tree (the HOF-capture rule in dedup._shingles_from).
    """
    n = len(cols)
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed long")
    with_scaled = df.select("*", *_scaled_cols(df, cols, bits))
    interleave = " | ".join(
        f"aggregate(sequence(0, {bits - 1}), 0L, "
        f"(acc, b) -> acc | (shiftleft(shiftright(__z{i}, b) & 1L, b * {n} + {i})))"
        for i in range(n)
    )
    return with_scaled.withColumn("__zkey", F.expr(interleave)).drop(
        *[f"__z{i}" for i in range(n)]
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    num_files: int = 8,
) -> None:
    """Write ``df`` as parquet clustered by the Z-order of ``cols``:
    one tiny stats aggregate + one range shuffle; the key is dropped
    from the output schema."""
    keyed = with_zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(num_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_extents(spark: SparkSession, path: str, cols: list[str]) -> DataFrame:
    """Per-output-file min/max extent of ``cols`` — the audit view of
    clustering quality (what parquet row-group stats will see). One row
    per file: ``(file, min_<c>, max_<c>, ...)``."""
    df = spark.read.parquet(path).withColumn("__file", F.input_file_name())
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return df.groupBy(F.col("__file").alias("file")).agg(*aggs)
