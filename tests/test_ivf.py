"""IVF ANN: recall floor vs brute force + determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_database_spark.operators import similarity as S
from graph_database_spark.operators.ivf import ivf_topk
from graph_database_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings").cache()


def test_ivf_recall_vs_brute_force(spark, emb):
    queries = emb.where(F.col("vec_id") % 50 == 0)
    truth = {(r["query_id"], r["cand_id"])
             for r in S.brute_force_topk(queries, emb, k=10).collect()}
    approx = {(r["query_id"], r["cand_id"])
              for r in ivf_topk(queries, emb, k=10, n_centroids=16, n_probe=8).collect()}
    recall = len(truth & approx) / len(truth)
    # Synthetic near-noise embeddings are the worst case for IVF (no
    # cluster structure to adapt to); the floor documents that regime.
    assert recall >= 0.35, f"recall@10 = {recall:.3f}"


def test_ivf_more_probes_more_recall(spark, emb):
    queries = emb.where(F.col("vec_id") % 100 == 0)
    truth = {(r["query_id"], r["cand_id"])
             for r in S.brute_force_topk(queries, emb, k=10).collect()}

    def recall(n_probe):
        got = {(r["query_id"], r["cand_id"])
               for r in ivf_topk(queries, emb, k=10, n_centroids=16,
                                 n_probe=n_probe).collect()}
        return len(truth & got) / len(truth)

    r_all = recall(16)
    assert r_all == 1.0  # probing every cell is exhaustive => exact
    assert recall(2) <= r_all


def test_ivf_md5_twin_recall_and_determinism(spark, emb):
    """The md5 twin is real IVF machinery: probing all cells is exact
    (recall 1.0, like ivf_topk), and repeated runs are bit-identical
    (integer cell sims + rounded re-rank)."""
    from graph_database_spark.operators.ivf import ivf_topk_md5

    queries = emb.where(F.col("vec_id") % 100 == 0)
    truth = {(r["query_id"], r["cand_id"])
             for r in S.brute_force_topk(queries, emb, k=10).collect()}
    exhaustive = {(r["query_id"], r["cand_id"])
                  for r in ivf_topk_md5(queries, emb, k=10, n_centroids=16,
                                        n_probe=16).collect()}
    assert len(truth & exhaustive) / len(truth) == 1.0
    a = sorted(map(tuple, ivf_topk_md5(queries, emb, k=5).collect()))
    b = sorted(map(tuple, ivf_topk_md5(queries, emb, k=5).collect()))
    assert a == b


def test_ivf_deterministic(spark, emb):
    queries = emb.where(F.col("vec_id") % 100 == 0)
    a = sorted(map(tuple, ivf_topk(queries, emb, k=5).collect()))
    b = sorted(map(tuple, ivf_topk(queries, emb, k=5).collect()))
    assert a == b


def test_scalar_quantize_codes(spark):
    from graph_database_spark.operators.quantize import scalar_quantize

    emb = spark.createDataFrame(
        [(1, [0.0, 10.0]), (2, [1.0, 20.0]), (3, [2.0, 20.0])],
        "vec_id long, embedding array<float>",
    )
    out = {(r["vec_id"], r["i"]): r["code"] for r in scalar_quantize(emb).collect()}
    # dim 1: range [0,2] -> 0, 128 (round(127.5) half-up), 255
    assert out[(1, 1)] == 0 and out[(3, 1)] == 255
    assert out[(2, 1)] == 128
    # dim 2: range [10,20] -> 0, 255, 255
    assert out[(1, 2)] == 0 and out[(2, 2)] == 255 and out[(3, 2)] == 255


def test_scalar_quantize_constant_dim_is_zero(spark):
    from graph_database_spark.operators.quantize import scalar_quantize

    emb = spark.createDataFrame(
        [(1, [5.0]), (2, [5.0])], "vec_id long, embedding array<float>"
    )
    assert {r["code"] for r in scalar_quantize(emb).collect()} == {0}


def test_standardize_profile_matches_numpy(spark):
    import numpy as np

    from graph_database_spark.operators.quantize import standardize_profile

    rng = np.random.default_rng(7)
    mat = rng.normal(size=(40, 5)).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["vec_id"]: (r["z_sum_micro"], r["z_min_micro"], r["z_max_micro"])
        for r in standardize_profile(emb).collect()
    }
    xm = np.round(mat.astype("float64") * 1e6)
    mu = xm.mean(axis=0)
    sd = xm.std(axis=0, ddof=1)
    z = np.round((xm - mu) / sd * 1e6).astype("int64")
    for i in range(mat.shape[0]):
        want = (int(z[i].sum()), int(z[i].min()), int(z[i].max()))
        assert got[i] == want


def test_standardize_profile_constant_dim_excluded(spark):
    from graph_database_spark.operators.quantize import standardize_profile

    emb = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [1.0, 4.0]), (2, [1.0, 6.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in standardize_profile(emb).collect()}
    # dim 1 is constant -> only dim 2 contributes; z over {2,4,6} std 2e6.
    assert rows[0]["z_sum_micro"] == rows[0]["z_min_micro"] == -1_000_000
    assert rows[2]["z_max_micro"] == 1_000_000
    assert rows[1]["z_sum_micro"] == 0


def test_ivfpq_adc_recall_floor(spark, emb):
    # IVF-PQ ADC search (r13; residual-encoded r14): ranking by
    # quantized asymmetric distance must land a usable fraction of the
    # exact-L2 top-10 inside the probed cells. This corpus is
    # near-random (no cluster structure — the regime the 0.35 IVF floor
    # above documents); the PQ layer adds quantization error on top.
    # r13 raw-vector PQ measured mean recall 0.31 at the shipped
    # 64-codes x 8-dim-subspace setting (0.15 at 16x16, which is why
    # that is not the default); r14 residual encoding (FAISS IVF-ADC,
    # VERDICT r13 #6) lifted it to ~0.40 vs the ~0.44 probe-set
    # ceiling. Floor at 0.3 mean.
    import numpy as np

    from graph_database_spark.operators.pq import ivfpq_topk_md5

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r[0] for r in rows])
    V = np.array([r[1] for r in rows], dtype=float)
    got = ivfpq_topk_md5(emb).collect()
    by_q: dict[int, set] = {}
    for r in got:
        by_q.setdefault(r["query_id"], set()).add(r["cand_id"])
    recalls = []
    for q, approx in by_q.items():
        qi = int(np.where(ids == q)[0][0])
        d = ((V - V[qi]) ** 2).sum(axis=1)
        order = [int(ids[j]) for j in np.argsort(d) if ids[j] != q]
        truth = set(order[:10])
        recalls.append(len(approx & truth) / 10)
    mean = sum(recalls) / len(recalls)
    assert mean >= 0.3, f"ADC mean recall@10 = {mean:.3f}"


def test_ivfpq_refined_recall_floor_and_dominance(spark, emb):
    # ADC-then-exact refine (r14, FAISS IndexRefineFlat): reranking the
    # ADC top-30 by exact micro-L2 must recover (essentially) the
    # probed-cell ceiling — measured 0.50 == ceiling at sf0.01 — and in
    # particular beat the raw ADC ordering's floor. Floor at 0.4 mean.
    import numpy as np

    from graph_database_spark import catalog

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r[0] for r in rows])
    V = np.array([r[1] for r in rows], dtype=float)
    got = catalog.QUERIES["ann_ivfpq_refined"](spark, SF_DIR).collect()
    by_q: dict[int, set] = {}
    for r in got:
        by_q.setdefault(r["query_id"], set()).add(r["cand_id"])
    recalls = []
    for q, approx in by_q.items():
        qi = int(np.where(ids == q)[0][0])
        d = ((V - V[qi]) ** 2).sum(axis=1)
        order = [int(ids[j]) for j in np.argsort(d) if ids[j] != q]
        truth = set(order[:10])
        recalls.append(len(approx & truth) / 10)
    mean = sum(recalls) / len(recalls)
    assert mean >= 0.4, f"refined mean recall@10 = {mean:.3f}"
