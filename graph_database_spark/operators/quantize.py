"""Embedding scalar quantization (SURVEY.md §2.11 X3 extension).

Per-dimension min/max scalar quantization to 8-bit codes — the standard
compression step before ANN serving (4x smaller than float32, and the
form IVF/LSH indexes ship at scale). The reference has no vector surface
at all (src/main.js is graph-only); this rounds out the similarity stack
(exact top-k, LSH, IVF, PCA) with the storage-side primitive.

Plan: one narrow posexplode to (vec_id, dim, x); per-dimension stats are
a 64-group map-side-combinable aggregation (one tiny shuffle) broadcast
back onto the exploded frame — no driver-side model, no second scan
shuffle. Output is long form (vec_id, i, code): the driver harness
hash-compares scalars (array outputs crash its canonicalizer — r2
lesson), and downstream consumers re-pack per partition anyway.

Cross-engine exactness: min/max are order-independent, and the quantize
expression ``(x - mn) / (mx - mn) * 255`` is a single IEEE tree mirrored
operand-for-operand in the oracle — identical operands, identical bits,
no rounding slop needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graph_database_spark.operators.spread import spread

__all__ = ["scalar_quantize", "standardize_profile"]


def scalar_quantize(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    levels: int = 255,
) -> DataFrame:
    """``(vec_id, i, code)`` — per-dimension min/max quantization of an
    array<float> column to integer codes in [0, levels].

    Constant dimensions (mx == mn) map to code 0. ``i`` is 1-based (the
    SQL subscript convention, matching the oracle's
    ``generate_subscripts``).
    """
    ex = (
        spread(emb)
        .select(
            id_col,
            F.posexplode(vec_col).alias("pos", "xf"),
        )
        .select(
            id_col,
            (F.col("pos") + F.lit(1)).cast("int").alias("i"),
            F.col("xf").cast("double").alias("x"),
        )
        .localCheckpoint()
    )
    stats = ex.groupBy("i").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    code = (
        F.when(F.col("mx") == F.col("mn"), F.lit(0.0))
        .otherwise(
            F.round(
                (F.col("x") - F.col("mn"))
                / (F.col("mx") - F.col("mn"))
                * F.lit(float(levels)),
                0,
            )
        )
        .cast("int")
    )
    return ex.join(F.broadcast(stats), "i").select(
        id_col, "i", code.alias("code")
    )


def standardize_profile(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-dimension z-score standardization, summarized per vector:
    ``(vec_id, z_sum_micro, z_min_micro, z_max_micro)``.

    The feature-normalization step of an embedding training pipeline,
    made hash-exact: elements snap to integer micro-units first, so the
    per-dimension moment sums (sum, sum-of-squares) are BIGINT sums —
    partition-order-exact — and mean/variance/z are then single IEEE
    expression trees over exact integers, mirrored operand-for-operand
    in the oracle. The per-vector roll-up sums the integer z-scores, so
    it too is order-free.

    Plan: one narrow posexplode, one 64-group moment aggregation, tiny
    broadcast back, one groupBy vec_id — two small shuffles total, no
    driver-side model. Overflow bound: sum(xm^2) per dim stays under
    2^63 up to ~9e6 unit-scale vectors per dimension; past that, shard
    the moment aggregation by vector range and merge (the sums are
    mergeable by construction).

    Constant dimensions (variance 0) contribute NULL z-scores, excluded
    from the roll-up on both sides.
    """
    ex = (
        spread(emb)
        .select(id_col, F.posexplode(vec_col).alias("pos", "xf"))
        .select(
            id_col,
            (F.col("pos") + F.lit(1)).cast("int").alias("i"),
            F.round(F.col("xf").cast("double") * F.lit(1000000.0), 0)
            .cast("long")
            .alias("xm"),
        )
        .localCheckpoint()  # feeds the moment agg AND the z projection
    )
    stats = ex.groupBy("i").agg(
        F.count("*").alias("n"),
        F.sum("xm").alias("s"),
        F.sum(F.col("xm") * F.col("xm")).alias("ss"),
    )
    mu = F.col("s").cast("double") / F.col("n").cast("double")
    var = (
        F.col("ss").cast("double")
        - F.col("s").cast("double")
        * F.col("s").cast("double")
        / F.col("n").cast("double")
    ) / (F.col("n") - F.lit(1)).cast("double")
    z = F.when(
        var > F.lit(0.0),
        F.round(
            (F.col("xm").cast("double") - mu) / F.sqrt(var) * F.lit(1000000.0),
            0,
        ),
    ).cast("long")
    return (
        ex.join(F.broadcast(stats), "i")
        .select(id_col, z.alias("z"))
        .groupBy(id_col)
        .agg(
            F.sum("z").alias("z_sum_micro"),
            F.min("z").alias("z_min_micro"),
            F.max("z").alias("z_max_micro"),
        )
    )
