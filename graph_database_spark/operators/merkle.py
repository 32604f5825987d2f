"""Merkle-style range reconciliation — the anti-entropy primitive.

Comparing two 100 TB replicas row-by-row costs a full shuffle of both;
a range-fingerprint tree costs one aggregation per side and localizes
every divergence to a leaf range with O(fanout * depth) fingerprint
comparisons (the Dynamo/Cassandra repair idea, expressed as two
groupBys). Rows fold into LEAF fingerprints (key-range buckets), leaves
fold into parents; a leaf is inspected only when its PARENT fingerprint
differs — exactly the tree-probe behavior, including its one documented
blind spot: sibling diffs that cancel in the parent fold are invisible
(astronomically unlikely with 40-bit row hashes, deterministic either
way).

Fingerprints are SUMS of 40-bit md5-derived row hashes: associative,
commutative, order- and partition-independent, and int64-safe to
~2^23 rows per leaf (40 + 23 = 63 bits) — the leaf width is the
occupancy knob. Everything is integer; both engines agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["range_fingerprints", "merkle_diff"]


def _row_fp(key_col: str, payload_sql: str) -> F.Column:
    """40-bit integer fingerprint of (key | payload)."""
    return F.expr(
        "cast(conv(substring(md5(concat(cast("
        f"{key_col} as string), '|', {payload_sql})), 1, 10), 16, 10)"
        " as bigint)"
    )


def range_fingerprints(
    df: DataFrame, key_col: str, payload_sql: str, leaf_div: int
) -> DataFrame:
    """``(leaf, n, fp)`` — one row per occupied key range of width
    ``leaf_div``: row count and summed row fingerprint. One map-side-
    combinable shuffle of at most |key space| / leaf_div rows."""
    return (
        df.select(
            F.expr(f"{key_col} div {leaf_div}").alias("leaf"),
            _row_fp(key_col, payload_sql).alias("fp"),
        )
        .groupBy("leaf")
        .agg(F.count("*").alias("n"), F.sum("fp").alias("fp"))
    )


def merkle_diff(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    payload_sql: str,
    leaf_div: int = 1024,
    fanout: int = 16,
) -> DataFrame:
    """Leaf ranges whose fingerprints differ, restricted to leaves whose
    PARENT range also differs (the tree-probe drill): ``(parent, leaf,
    n_left, n_right, fp_left, fp_right)``. A leaf present on one side
    only reads as (0, 0) on the other. The two fingerprint frames are
    tiny (key-space / leaf_div rows), so the reconciliation join is
    broadcast-scale regardless of table size.
    """
    fl = range_fingerprints(left, key_col, payload_sql, leaf_div)
    fr = range_fingerprints(right, key_col, payload_sql, leaf_div)
    j = (
        fl.withColumnRenamed("n", "n_left")
        .withColumnRenamed("fp", "fp_left")
        .join(
            fr.withColumnRenamed("n", "n_right").withColumnRenamed(
                "fp", "fp_right"
            ),
            "leaf",
            "full_outer",
        )
        .select(
            F.expr(f"leaf div {fanout}").alias("parent"),
            "leaf",
            F.coalesce("n_left", F.lit(0)).cast("long").alias("n_left"),
            F.coalesce("n_right", F.lit(0)).cast("long").alias("n_right"),
            F.coalesce("fp_left", F.lit(0)).cast("long").alias("fp_left"),
            F.coalesce("fp_right", F.lit(0)).cast("long").alias("fp_right"),
        )
        .localCheckpoint()  # parent fold + leaf readout both consume it
    )
    parents = (
        j.groupBy("parent")
        .agg(
            (F.sum("fp_left") != F.sum("fp_right")).alias("pdiff")
        )
        .where(F.col("pdiff"))
        .select("parent")
    )
    return j.where(F.col("fp_left") != F.col("fp_right")).join(
        F.broadcast(parents), "parent"
    )
