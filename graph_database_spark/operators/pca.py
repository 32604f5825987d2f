"""Embedding PCA — whitening/compression for the similarity stack.

A training-data pipeline compresses or whitens its embedding columns
before ANN indexing (IVF cells and LSH planes both degrade on
anisotropic inputs); PCA is the standard first tool. Spark-first
decomposition of the classic fit/transform split:

  - FIT is one JVM pass: the d x d second-moment matrix accumulates via
    an exploded outer product (map-side combinable into at most d^2
    groups, so the shuffle is O(d^2) regardless of N), the mean vector
    via a d-group pass; the dense d x d eigendecomposition happens
    driver-side in numpy — at d = 64 that is a 4096-float problem, the
    same "small model parameter" shape as IVF centroids and the Z-order
    min/max stats.
  - TRANSFORM is a narrow map: each component is a literal array baked
    into a zip_with dot product — no shuffle, no Python, broadcast-free
    (the model travels in the plan as literals).

Eigenvector signs are normalized (largest-|entry| coordinate made
positive) so fits are deterministic across runs/engines up to
eigenvalue ties. Rows-only surface: no SQL engine exposes eigh, so the
catalog query is pinned by numpy parity + orthonormality +
variance-ordering tests instead of a DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F

from graph_database_spark.operators.spread import spread

__all__ = ["pca_fit", "pca_transform"]


def pca_fit(
    vectors: DataFrame,
    k: int = 16,
    vec_col: str = "embedding",
) -> dict:
    """Fit a PCA model: ``{"mean": [d], "components": [k][d],
    "explained_variance": [k]}`` (components = top-k eigenvectors of the
    sample covariance, descending eigenvalue)."""
    df = spread(vectors).select(F.col(vec_col).alias("x"))

    # Second moments: explode the per-row outer product; at most d^2
    # groups survive the map-side combine.
    moments = (
        df.select(
            F.explode(
                F.expr(
                    "flatten(transform(x, (xi, i) -> "
                    "transform(x, (xj, j) -> "
                    "struct(i AS i, j AS j, CAST(xi * xj AS DOUBLE) AS v))))"
                )
            ).alias("e")
        )
        .groupBy(F.col("e.i").alias("i"), F.col("e.j").alias("j"))
        .agg(F.sum("e.v").alias("s"), F.count("*").alias("n"))
        .collect()
    )
    sums = (
        df.select(F.posexplode("x").alias("i", "xi"))
        .groupBy("i")
        .agg(F.sum("xi").alias("s"), F.count("*").alias("n"))
        .collect()
    )
    d = max(r["i"] for r in sums) + 1
    n = sums[0]["n"]
    mean = np.zeros(d)
    for r in sums:
        mean[r["i"]] = r["s"] / n
    m2 = np.zeros((d, d))
    for r in moments:
        m2[r["i"], r["j"]] = r["s"] / n
    cov = m2 - np.outer(mean, mean)

    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = []
    for idx in order:
        v = vecs[:, idx]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        comps.append(v.tolist())
    return {
        "mean": mean.tolist(),
        "components": comps,
        "explained_variance": [float(vals[i]) for i in order],
    }


def _dot_literal(x: Column, vec: list[float]) -> Column:
    lit = F.array(*[F.lit(float(v)) for v in vec])
    return F.aggregate(
        F.zip_with(x, lit, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )


def pca_transform(
    vectors: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "pca",
) -> DataFrame:
    """``(id_col, out_col ARRAY<DOUBLE>[k])`` — centered projections onto
    the fitted components. Narrow map, no shuffle."""
    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        F.array(*[F.lit(float(m)) for m in model["mean"]]),
        lambda a, b: a - b,
    )
    df = vectors.withColumn("__c", centered)
    proj = F.array(*[_dot_literal(F.col("__c"), c) for c in model["components"]])
    return df.select(F.col(id_col), proj.alias(out_col))
