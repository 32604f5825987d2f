"""Similarity search over embedding columns (SURVEY.md §2.11 X3).

Two paths:
  brute_force_topk   exact cosine top-k — the correctness baseline, and
                     the right plan when the QUERY side is small (the
                     common case: q queries x N candidates, broadcast the
                     queries, one scan of the candidates, per-partition
                     top-k via window).
  lsh_topk           random-hyperplane LSH bucketing — the scale path
                     when both sides are large: 1 shuffle on bucket id,
                     exact re-rank inside buckets, multi-probe for recall.

All vector math is JVM higher-order functions (functions/vectors.py);
no explode of the embedding arrays, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import broadcast

from graph_database_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = ["brute_force_topk", "cosine_pairs_above", "lsh_topk"]


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector:
    ``(query_id, cand_id, sim)``, self-matches excluded.

    Plan: broadcast the (small) query side, crossJoin against candidates
    — a map-only stage, no shuffle for the join — then one shuffle for
    the per-query window top-k. Ties broken by cand_id after rounding so
    ranking is engine-deterministic."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = candidates.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv"))
    sim = cosine_similarity(F.col("qv"), F.col("cv"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = (
        broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", sim.alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "sim", "rank")
    )


def cosine_pairs_above(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
) -> DataFrame:
    """All pairs (a < b) with cosine >= threshold — embedding near-dup
    detection (X2's embedding tier). Exact O(N^2) plan; for large N use
    lsh_topk buckets instead."""
    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    a = v.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    b = v.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    sim = cosine_similarity(F.col("va"), F.col("vb"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("sim"))
        .where(F.col("sim") >= threshold)
    )


def _hyperplane_bits(vec_col, n_bits: int, dim: int):
    """Sign bits of <v, h_j> for n_bits pseudo-random hyperplanes.

    Hyperplane component h_j[i] is a deterministic ±1 derived from
    xxhash64(j, i) — no driver-side randomness, no broadcast of plane
    matrices, reproducible across runs and engines."""
    def bit(j):
        prods = F.zip_with(
            vec_col,
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: (F.xxhash64(F.lit(j), i).bitwiseAND(F.lit(1)) * 2 - 1).cast("double"),
            ),
            lambda x, h: x.cast("double") * h,
        )
        return (F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x) > 0).cast("int")

    return [bit(j) for j in range(n_bits)]


def lsh_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 12,
    dim: int = 64,
    n_tables: int = 4,
) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH:
    ``(query_id, cand_id, sim, rank)``.

    n_tables independent bucketings (bit-slices of a shared sign vector);
    query and candidate meet if they share a bucket in ANY table. One
    shuffle on (table, bucket); exact cosine re-rank on the survivors.
    Recall grows with n_tables; cost stays ~|data| x n_tables."""
    total_bits = n_bits * n_tables

    def with_buckets(df, id_alias):
        bits = _hyperplane_bits(F.col(vec_col), total_bits, dim)
        buckets = []
        for t in range(n_tables):
            acc = F.lit(0)
            for j in range(n_bits):
                acc = acc * 2 + bits[t * n_bits + j]
            buckets.append(F.struct(F.lit(t).alias("table"), acc.alias("bucket")))
        return df.select(
            F.col(id_col).alias(id_alias),
            F.col(vec_col).alias(f"{id_alias}_v"),
            F.explode(F.array(*buckets)).alias("tb"),
        ).select(id_alias, f"{id_alias}_v", "tb.table", "tb.bucket")

    qb = with_buckets(queries, "query_id")
    cb = with_buckets(candidates, "cand_id")
    cand = (
        qb.join(cb, ["table", "bucket"])
        .where(F.col("query_id") != F.col("cand_id"))
        .dropDuplicates(["query_id", "cand_id"])
    )
    sim = F.round(cosine_similarity(F.col("query_id_v"), F.col("cand_id_v")), 6)
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cand_id"))
    return (
        cand.select("query_id", "cand_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
