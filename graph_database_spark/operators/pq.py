"""Product quantization: per-subspace k-means codebooks for ANN serving.

The missing third leg of the serving-compression stack (scalar
quantization in operators/quantize.py, IVF cells in operators/ivf.py):
split each vector into ``n_sub`` contiguous subvectors and learn an
independent k-means codebook per subspace, so a d-dim float vector
compresses to ``n_sub`` byte-sized codes and asymmetric distances are
table lookups. This is the IVF-PQ layout every large-scale vector index
(FAISS-style) ships.

Verification follows kmeans_cells: micro-int subvectors, BIGINT squared
distances, (d2, c) argmin, floor-exact centroid means, md5-ordered
seeds — the whole training loop replays in DuckDB
(catalog._build_pq_sql) and hash-matches. Seeds are ranked with the
distributed global_rank, not a single-partition window.

Scale: the explode is |V| x d rows once; each round is one broadcast
join (codebooks are n_sub x k x sub_dims cells — constant) plus two
keyed aggregations. State never exceeds the codebook.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graph_database_spark.operators.rank import global_rank
from graph_database_spark.operators.spread import spread


def pq_assign(
    vectors: DataFrame,
    k: int = 16,
    rounds: int = 2,
    sub_dims: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(vec_id, subspace, code, dist2)`` — the PQ code per subspace
    after ``rounds`` Lloyd iterations from md5-ordered seed vectors."""
    ex = (
        spread(vectors)
        .select(
            F.col(id_col).alias("vec_id"),
            F.posexplode(F.col(vec_col)).alias("pos", "x"),
        )
        .select(
            "vec_id",
            (F.col("pos") + 1).cast("int").alias("i"),
            F.expr(f"CAST(pos div {sub_dims} AS INT)").alias("s"),
            F.round(F.col("x").cast("double") * F.lit(1000000.0), 0)
            .cast("long")
            .alias("xm"),
        )
        .localCheckpoint()  # feeds every round's assign AND update
    )
    seeds = (
        global_rank(
            vectors.select(
                F.col(id_col).alias("vec_id"),
                F.md5(F.col(id_col).cast("string")).alias("mk"),
            ),
            ["mk", "vec_id"],
            out_col="c",
        )
        .where(F.col("c") <= k)
        .select("vec_id", F.col("c").cast("int").alias("c"))
    )
    cent = (
        ex.join(seeds, "vec_id")
        .select("c", "i", F.col("xm").alias("cm"))
        .localCheckpoint()
    )
    assign = None
    for r in range(1, rounds + 1):
        assign = (
            ex.join(F.broadcast(cent), "i")
            .groupBy("vec_id", "s", "c")
            .agg(
                F.sum(
                    (F.col("xm") - F.col("cm")) * (F.col("xm") - F.col("cm"))
                ).alias("d2")
            )
            .groupBy("vec_id", "s")
            .agg(
                F.min(
                    F.struct(F.col("d2").alias("d2"), F.col("c").alias("c"))
                ).alias("best")
            )
            .select(
                "vec_id",
                "s",
                F.col("best.c").alias("code"),
                F.col("best.d2").alias("dist2"),
            )
            .localCheckpoint()
        )
        if r == rounds:
            break
        means = (
            ex.join(
                assign.select("vec_id", "s", F.col("code").alias("c")),
                ["vec_id", "s"],
            )
            .groupBy("c", "i")
            .agg(
                F.floor(
                    F.sum("xm").cast("double") / F.count("*").cast("double")
                )
                .cast("long")
                .alias("cm_new")
            )
        )
        cent = (
            cent.join(means, ["c", "i"], "left")
            .select("c", "i", F.coalesce("cm_new", F.col("cm")).alias("cm"))
            .localCheckpoint()
        )
    return assign.select(
        "vec_id",
        F.col("s").alias("subspace"),
        "code",
        "dist2",
    )
