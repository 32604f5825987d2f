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

from pyspark.sql import DataFrame, Window, functions as F

from graph_database_spark.operators.rank import global_rank
from graph_database_spark.operators.spread import spread


def pq_train(
    vectors: DataFrame,
    k: int = 16,
    rounds: int = 2,
    sub_dims: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """``(assign, codebook)`` — the PQ codes per subspace after
    ``rounds`` Lloyd iterations from md5-ordered seed vectors, PLUS the
    codebook ``(c, i, cm)`` those final codes were assigned against
    (micro-int centroid value per dimension). The codebook is what an
    ADC search (ivfpq_topk_md5) builds its per-query lookup tables
    from; returning it here keeps codes and codebook consistent by
    construction (recomputing the training loop twice could not
    drift, but would double the cost)."""
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
    return (
        assign.select(
            "vec_id",
            F.col("s").alias("subspace"),
            "code",
            "dist2",
        ),
        cent,
    )


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
    return pq_train(vectors, k, rounds, sub_dims, id_col, vec_col)[0]


def ivfpq_topk_md5(
    vectors: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    pq_k: int = 64,
    rounds: int = 2,
    sub_dims: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_mod: int = 50,
) -> DataFrame:
    """IVF-PQ asymmetric-distance search (r13): the FAISS-style serving
    layout this module's docstring names, now as an actual search —
    coarse IVF cells prune the candidate set, then candidates are
    ranked by ADC: dist(q, cand) ~ sum_s qtab[q][s][code_s(cand)],
    where qtab holds the query's exact squared distance to every
    codebook centroid per subspace. The candidate side is touched ONLY
    through its n_sub byte-sized codes — at rest that is the compressed
    index (d floats -> n_sub codes per vector), which is the reason
    this layout scales to 100 TB vector corpora.

    Returns ``(query_id, cand_id, adc_d2, rank)`` for the deterministic
    query sample ``vec_id % query_mod == 0`` — every quantity an exact
    integer (micro-unit squared distances), so the whole pipeline
    (IVF draw + PQ training + ADC ranking) hash-verifies against the
    composed DuckDB oracle (catalog._build_ann_ivfpq_sql), extending
    the md5-twin chain that already pins ivf cells (ann_ivf_md5) and
    PQ training (pq_codes) to their composition.

    Plan: PQ codebook and IVF centroids are bounded model parameters
    (broadcast / literal); per-query ADC tables are |Q| x n_sub x pq_k
    rows (broadcastable); the only corpus-scale shuffles are the cell
    meet (probe cells x candidate cells) and the per-query top-k
    window, both keyed. n_probe/n_centroids keep per-query candidate
    counts at ~n_probe/n_centroids of the corpus — the same occupancy
    knob discipline as LSH auto_bits."""
    from graph_database_spark.operators.ivf import _unit_centroid_micro
    from graph_database_spark.operators.spread import spread

    assign, cent = pq_train(
        vectors, pq_k, rounds, sub_dims, id_col, vec_col
    )
    codes = assign.select(
        F.col("vec_id").alias("cand_id"), F.col("subspace").alias("s"), "code"
    ).localCheckpoint()

    # ---- IVF coarse cells (the ivf_topk_md5 integer cell machinery) ----
    cents = _unit_centroid_micro(vectors, id_col, vec_col, n_centroids)
    cent_lits = [
        F.expr("array(" + ",".join(f"{x}L" for x in c) + ")") for c in cents
    ]
    ex = (
        spread(vectors)
        .select(
            F.col(id_col).alias("vid"),
            F.transform(
                F.col(vec_col),
                lambda x: F.round(x.cast("double") * 1_000_000.0, 0).cast(
                    "long"
                ),
            ).alias("xm"),
        )
        .localCheckpoint()
    )
    sims = F.array(
        *[
            F.aggregate(
                F.zip_with(F.col("xm"), lit, lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            for lit in cent_lits
        ]
    )
    simmed = ex.select("vid", sims.alias("sims"))
    # candidate cell: argmax sim, first-index tiebreak (s DESC, c ASC)
    best = F.expr(
        "array_position(sims, array_max(sims))"
    ).cast("int")
    cand_cell = simmed.select(
        F.col("vid").alias("cand_id"), (best - 1).alias("cell")
    )
    # probe cells: top-n_probe by (s DESC, c DESC) — mirror the
    # ann_ivf_md5 oracle's reverse(array_sort(struct(s, c))) order.
    probe = (
        simmed.where(F.col("vid") % query_mod == 0)
        .select(
            F.col("vid").alias("query_id"),
            F.explode(
                F.slice(
                    F.reverse(
                        F.expr(
                            "array_sort(transform(sims,"
                            " (s, c) -> struct(s AS s, c AS c)))"
                        )
                    ),
                    1,
                    n_probe,
                )
            ).alias("pc"),
        )
        .select("query_id", F.col("pc.c").cast("int").alias("cell"))
    )

    # ---- ADC tables: exact squared distance query-subvector -> centroid
    q_ex = (
        vectors.where(F.col(id_col) % query_mod == 0)
        .select(
            F.col(id_col).alias("query_id"),
            F.posexplode(F.col(vec_col)).alias("pos", "x"),
        )
        .select(
            "query_id",
            (F.col("pos") + 1).cast("int").alias("i"),
            F.expr(f"CAST(pos div {sub_dims} AS INT)").alias("s"),
            F.round(F.col("x").cast("double") * 1_000_000.0, 0)
            .cast("long")
            .alias("xm"),
        )
    )
    qtab = (
        q_ex.join(F.broadcast(cent), "i")
        .groupBy("query_id", "s", F.col("c").alias("code"))
        .agg(
            F.sum(
                (F.col("xm") - F.col("cm")) * (F.col("xm") - F.col("cm"))
            ).alias("qd2")
        )
        .localCheckpoint()
    )

    # ---- probe-pruned ADC ranking --------------------------------------
    cand = (
        probe.join(cand_cell, "cell")
        .where(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id")
        .distinct()
    )
    adc = (
        cand.join(codes, "cand_id")
        .join(qtab, ["query_id", "s", "code"])
        .groupBy("query_id", "cand_id")
        .agg(F.sum("qd2").alias("adc_d2"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_d2", "cand_id")
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "cand_id",
            F.col("adc_d2").cast("long").alias("adc_d2"),
            F.col("rank").cast("int").alias("rank"),
        )
    )
