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


def test_ivf_deterministic(spark, emb):
    queries = emb.where(F.col("vec_id") % 100 == 0)
    a = sorted(map(tuple, ivf_topk(queries, emb, k=5).collect()))
    b = sorted(map(tuple, ivf_topk(queries, emb, k=5).collect()))
    assert a == b
