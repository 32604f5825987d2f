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


def _explode_micro(
    vectors: DataFrame, sub_dims: int, id_col: str, vec_col: str
) -> DataFrame:
    """``(vec_id, i, s, xm)`` — 1-based dim index, subspace id, and the
    micro-int value per dimension (the shared input shape of PQ
    training and the ADC query tables)."""
    return (
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
    )


def _pq_train_micro(
    ex: DataFrame, ids: DataFrame, k: int, rounds: int
) -> tuple[DataFrame, DataFrame]:
    """Core PQ Lloyd loop over pre-exploded micro rows ``ex``
    ``(vec_id, i, s, xm)`` (MUST be materialized — it feeds every
    round's assign AND update) with seeds drawn md5-ordered from
    ``ids`` ``(vec_id)``. Factored out of ``pq_train`` (r14) so the
    residual-encoded IVF-PQ path can train on residual rows with the
    identical, oracle-replayable loop."""
    seeds = (
        global_rank(
            ids.select(
                F.col("vec_id"),
                F.md5(F.col("vec_id").cast("string")).alias("mk"),
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
    ex = _explode_micro(vectors, sub_dims, id_col, vec_col).localCheckpoint()
    ids = vectors.select(F.col(id_col).alias("vec_id"))
    return _pq_train_micro(ex, ids, k, rounds)


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
    pq_k: int = 256,
    rounds: int = 2,
    sub_dims: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_mod: int = 50,
) -> DataFrame:
    """IVF-PQ asymmetric-distance search (r13; residual-encoded r14):
    the FAISS-style serving layout this module's docstring names, now
    as an actual search — coarse IVF cells prune the candidate set,
    then candidates are ranked by ADC: dist(q, cand) ~ sum_s
    qtab[q][cell][s][code_s(cand)], where qtab holds the query
    RESIDUAL's exact squared distance to every codebook centroid per
    subspace. The candidate side is touched ONLY through its n_sub
    byte-sized codes — at rest that is the compressed index (d floats
    -> n_sub codes per vector), which is the reason this layout scales
    to 100 TB vector corpora.

    Residual encoding (r14, VERDICT r13 #6 — standard FAISS IVF-ADC):
    PQ trains on each vector's residual to its cell's MEAN vector
    (micro-int xm - cm[cell][i], cm = sum(xm) div count per (cell, i))
    instead of the raw vector. The mean — not the md5-drawn unit
    coarse centroid — is the right base: it is what k-means-trained
    coarse centroids converge to, and residuals to it center on 0 so
    the byte budget spends its codebook resolution on within-cell
    geometry (residual-to-the-UNIT-centroid was measured to HURT:
    0.31 -> 0.21, because a unit direction is not where the cell
    lives). ADC stays exact over residuals because
    ||q - cand||^2 = ||(q - mean_cell) - (cand - mean_cell)||^2 with
    both sides living in the SAME probed cell's frame — hence the
    query table is keyed per (query, probed cell) and the ADC join
    matches the candidate's cell. Second r14 lever: pq_k 64 -> 256 —
    the codes were always stored as bytes, so 8-bit codebooks are the
    same at-rest budget. Measured recall@10 at sf0.01 (16 cells /
    4 probes, 0.50 probe-set ceiling): raw 64x8 0.31 (r13 ship) ->
    residual 64x8 0.35 -> residual 256x8 0.45 (numpy replica sweep;
    tests/test_ivf.py pins the 0.3 floor; ivfpq_recall_audit reports
    it per query).

    Returns ``(query_id, cand_id, adc_d2, rank)`` for the deterministic
    query sample ``vec_id % query_mod == 0`` — every quantity an exact
    integer (micro-unit squared distances), so the whole pipeline
    (IVF draw + residual + PQ training + ADC ranking) hash-verifies
    against the composed DuckDB oracle (catalog._build_ann_ivfpq_sql),
    extending the md5-twin chain that already pins ivf cells
    (ann_ivf_md5) and PQ training (pq_codes) to their composition.

    Plan: PQ codebook and IVF centroids are bounded model parameters
    (broadcast / literal); per-query ADC tables are
    |Q| x n_probe x n_sub x pq_k rows (broadcastable); the only
    corpus-scale shuffles are the residual join (keyed by vec_id), the
    cell meet (probe cells x candidate cells) and the per-query top-k
    window, all keyed. n_probe/n_centroids keep per-query candidate
    counts at ~n_probe/n_centroids of the corpus — the same occupancy
    knob discipline as LSH auto_bits."""
    model = ivfpq_fit(
        vectors, n_centroids, pq_k, rounds, sub_dims, id_col, vec_col
    )
    probe = _probe_cells(
        model["simmed"].where(F.col("vid") % query_mod == 0), n_probe
    )
    q_pex = model["pex"]
    pairs = (
        probe.join(model["cand_cell"], "cell")
        .where(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", "cell")
        .distinct()
        .join(model["codes"], "cand_id")
    )
    qtab = _adc_qtab(probe, q_pex, model["cmn"], model["codebook"])
    return _adc_rank(pairs, qtab, k)


def _micro_sims(
    vectors: DataFrame, cents: list, id_col: str, vec_col: str
) -> DataFrame:
    """``(vid, sims)`` — exact integer micro dot products of every
    vector against the (driver-side) unit centroid micro list, as ONE
    array column (the ivf_topk_md5 integer cell machinery; centroid
    literals built as single expr strings per the literal-array rule).
    Checkpointed: cand/probe cells both derive from it."""
    from graph_database_spark.operators.spread import spread

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
    return ex.select("vid", sims.alias("sims"))


def _probe_cells(simmed: DataFrame, n_probe: int) -> DataFrame:
    """``(query_id, cell)`` — top-``n_probe`` cells by (sim DESC,
    cell DESC), 1-based, mirroring the ann_ivf_md5 oracle's
    reverse(array_sort(struct(s, c))) order."""
    return (
        simmed.select(
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
        .select(
            "query_id", (F.col("pc.c") + 1).cast("int").alias("cell")
        )
        .localCheckpoint()
    )


def ivfpq_fit(
    vectors: DataFrame,
    n_centroids: int = 16,
    pq_k: int = 256,
    rounds: int = 2,
    sub_dims: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Train the full IVF-PQ model over ``vectors`` and return every
    piece the serving paths need (r14; factored out of ivfpq_topk_md5
    so sinks/ann.build_ivfpq_index persists the SAME model the inline
    search uses — probe==inline parity is by construction):

    - ``cents``: driver-side unit coarse centroid micro list
    - ``simmed``: (vid, sims) corpus cell sims (for inline queries)
    - ``cand_cell``: (cand_id, cell) argmax assignment, 1-based
    - ``pex``: (vec_id, i, s, xm) corpus micro explode
    - ``cmn``: (cell, i, cm) integer cell-mean base vectors
    - ``codes``: (cand_id, s, code) residual PQ codes
    - ``codebook``: (c, i, cm) residual codebook
    """
    from graph_database_spark.operators.ivf import _unit_centroid_micro

    # ---- IVF coarse cells (the ivf_topk_md5 integer cell machinery) ----
    cents = _unit_centroid_micro(vectors, id_col, vec_col, n_centroids)
    simmed = _micro_sims(vectors, cents, id_col, vec_col)
    # candidate cell: argmax sim, first-index tiebreak (s DESC, c ASC).
    # 1-BASED (r14): cells now join against the cell-mean table (and
    # the oracle's row_number cells); the r13 0-based labels were only
    # ever compared with each other, which hid the off-by-one until
    # residual encoding brought the centroid values back into the plan.
    best = F.expr("array_position(sims, array_max(sims))").cast("int")
    cand_cell = simmed.select(
        F.col("vid").alias("cand_id"), best.alias("cell")
    ).localCheckpoint()

    # ---- residual PQ training ------------------------------------------
    # Cell-mean base vectors (cell, i, cm): n_centroids x d rows of
    # exact integer micro means (div truncates toward zero in BOTH
    # engines — the signed-micro rule). Checkpointed because cmn feeds
    # both the training residuals and the query residuals; broadcast
    # at each use (bounded model parameters).
    pex = _explode_micro(vectors, sub_dims, id_col, vec_col).localCheckpoint()
    pcell = pex.join(
        cand_cell.select(F.col("cand_id").alias("vec_id"), "cell"),
        "vec_id",
    ).localCheckpoint()
    cmn = (
        pcell.groupBy("cell", "i")
        .agg(F.expr("sum(xm) div count(*)").alias("cm"))
        .localCheckpoint()
    )
    rex = (
        pcell.join(F.broadcast(cmn), ["cell", "i"])
        .select(
            "vec_id", "i", "s", (F.col("xm") - F.col("cm")).alias("xm")
        )
        .localCheckpoint()
    )
    assign, cent = _pq_train_micro(
        rex, vectors.select(F.col(id_col).alias("vec_id")), pq_k, rounds
    )
    codes = assign.select(
        F.col("vec_id").alias("cand_id"), F.col("subspace").alias("s"), "code"
    ).localCheckpoint()
    return {
        "cents": cents,
        "simmed": simmed,
        "cand_cell": cand_cell,
        "pex": pex,
        "cmn": cmn,
        "codes": codes,
        "codebook": cent,
    }


def pq_encode(ex: DataFrame, codebook: DataFrame) -> DataFrame:
    """``(vec_id, s, code)`` — assign pre-exploded (residual) micro
    rows to a FROZEN codebook: the Lloyd assign step without training,
    same (d2, c) tie-break. This is how an append encodes arrivals
    against a persisted model (sinks/ann.append_ivfpq_index)."""
    return (
        ex.join(F.broadcast(codebook), "i")
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
        .select("vec_id", "s", F.col("best.c").alias("code"))
    )


def _adc_qtab(
    probe: DataFrame, q_pex: DataFrame, cmn: DataFrame, codebook: DataFrame
) -> DataFrame:
    """``(query_id, cell, s, code, qd2)`` — exact squared distance from
    the query's residual IN EACH PROBED CELL to every codebook centroid
    per subspace (the ADC lookup tables; |Q| x n_probe x n_sub x pq_k
    rows, broadcastable)."""
    qres = (
        q_pex.join(
            probe.select(F.col("query_id").alias("vec_id"), "cell"),
            "vec_id",
        )
        .join(F.broadcast(cmn), ["cell", "i"])
        .select(
            F.col("vec_id").alias("query_id"),
            "cell",
            "i",
            "s",
            (F.col("xm") - F.col("cm")).alias("rm"),
        )
    )
    return (
        qres.join(F.broadcast(codebook.withColumnRenamed("cm", "pcm")), "i")
        .groupBy("query_id", "cell", "s", F.col("c").alias("code"))
        .agg(
            F.sum(
                (F.col("rm") - F.col("pcm")) * (F.col("rm") - F.col("pcm"))
            ).alias("qd2")
        )
        .localCheckpoint()
    )


def _adc_rank(pairs: DataFrame, qtab: DataFrame, k: int) -> DataFrame:
    """``(query_id, cand_id, adc_d2, rank)`` — sum the candidate's code
    lookups per query and keep the top-``k`` by (adc_d2, cand_id).
    ``pairs``: (query_id, cand_id, cell, s, code) candidate codes in
    probed cells."""
    adc = (
        pairs.join(qtab, ["query_id", "cell", "s", "code"])
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
