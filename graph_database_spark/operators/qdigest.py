"""Deterministic q-digest: a mergeable quantile summary.

Variant of Shrivastava et al.'s q-digest (SenSys 2004) over a dyadic
value universe [0, 2^levels): start from the EXACT leaf histogram (one
combinable shuffle — at scale this is the mergeable state: leaf counts
sum across partitions/streams), then compress bottom-up — at each level
a parent absorbs its children when their combined count fits under
n/compression — so the digest keeps at most O(compression * levels)
nodes while any quantile query is answered within n/compression rank
error. Unlike the original's arbitrary-merge-order formulation, the
bottom-up level sweep is a FUNCTION of the exact histogram, hence
deterministic, partition-order-independent, and replayable by an
unrolled SQL oracle (catalog.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graph_database_spark.operators.fixpoint import materialize

__all__ = ["qdigest_build", "qdigest_from_leaves"]


def qdigest_build(
    values: DataFrame,
    value_col: str,
    levels: int = 12,
    compression: int = 32,
) -> DataFrame:
    """``(lvl, idx, cnt, ub)`` digest nodes; ``ub`` = the node interval's
    inclusive upper value bound (idx + 1) * 2^lvl - 1."""
    leaves = (
        values.select(F.col(value_col).cast("long").alias("idx"))
        .groupBy("idx")
        .agg(F.count("*").alias("cnt"))
    )
    return qdigest_from_leaves(leaves, levels=levels, compression=compression)


def qdigest_from_leaves(
    leaves: DataFrame, levels: int = 12, compression: int = 32
) -> DataFrame:
    """Compress an exact leaf histogram ``(idx, cnt)`` into digest
    nodes. The leaf histogram IS the mergeable state (counts add
    cell-wise across partitions, batches, or streams — bounded by the
    value universe, not the data); the compression is a deterministic
    function of it, so stream-merged state rebuilds the identical
    digest a one-shot batch build produces (streaming/quantile.py)."""
    n_thr = leaves.agg(
        F.expr(f"greatest(1, sum(cnt) div {compression})").alias("thr")
    )
    state = leaves.select(
        F.lit(0).cast("int").alias("lvl"),
        "idx",
        F.col("cnt").cast("long").alias("cnt"),
    )
    state = materialize(state.coalesce(8))
    for lvl in range(levels):
        cur = state.where(F.col("lvl") == lvl)
        rest = state.where(F.col("lvl") != lvl)
        fam = (
            cur.groupBy(F.expr("idx div 2").alias("pidx"))
            .agg(F.sum("cnt").alias("fam_cnt"))
            .crossJoin(F.broadcast(n_thr))
        )
        merged = fam.where(F.col("fam_cnt") <= F.col("thr")).select(
            F.lit(lvl + 1).cast("int").alias("lvl"),
            F.col("pidx").alias("idx"),
            F.col("fam_cnt").alias("cnt"),
        )
        kept = cur.join(
            fam.where(F.col("fam_cnt") > F.col("thr")).select(
                F.col("pidx").alias("jp")
            ),
            F.expr("idx div 2") == F.col("jp"),
        ).select("lvl", "idx", "cnt")
        state = materialize(
            rest.unionByName(kept).unionByName(merged).coalesce(8)
        )
    return state.select(
        F.col("lvl").cast("long").alias("lvl"),
        "idx",
        "cnt",
        F.expr("(idx + 1) * CAST(pow(2, lvl) AS BIGINT) - 1").alias("ub"),
    )
