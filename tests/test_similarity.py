"""Similarity-search correctness and recall floors (X3).

The LSH paths are approximate by construction; these tests pin a
measured recall floor against the exact plans at sf0.001 so a bucketing
regression (like the round-1 near-zero-recall defaults) fails loudly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_database_spark.operators import similarity as S
from graph_database_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings").cache()


def test_grid_pairs_match_naive_crossjoin(spark, emb):
    """The grid plan is a pure re-plan of exact all-pairs: identical
    result set to a reference crossJoin at any block count."""
    from graph_database_spark.functions.vectors import cosine_similarity

    v = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v"))
    a = v.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    b = v.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    naive = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cosine_similarity("va", "vb"), 6).alias("sim"))
        .where(F.col("sim") >= 0.35)
        .collect()
    }
    for blocks in (1, 4, 8):
        grid = {
            (r["id_a"], r["id_b"]): r["sim"]
            for r in S.cosine_pairs_above(emb, 0.35, grid_blocks=blocks).collect()
        }
        assert grid == naive, f"grid_blocks={blocks}"


def test_no_broadcast_or_cartesian_in_grid_plan(emb):
    plan = S.cosine_pairs_above(emb, 0.35)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lsh_topk_recall(emb):
    """recall@10 of the LSH path vs exact brute force, over every 50th
    vector as queries (the catalog's sampling)."""
    queries = emb.where(F.col("vec_id") % 50 == 0)
    exact = S.brute_force_topk(queries, emb, k=10)
    truth = {(r["query_id"], r["cand_id"]) for r in exact.collect()}
    approx = {(r["query_id"], r["cand_id"]) for r in S.lsh_topk(queries, emb, k=10).collect()}
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.6, f"recall@10 = {recall:.3f}"


def test_lsh_topk_md5_twin_recall_and_determinism(emb):
    """The md5 twin is real ANN machinery, not a degenerate oracle prop:
    its recall@10 vs brute force clears the same floor as lsh_topk, and
    two runs are bit-identical (integer bucketing + rounded re-rank)."""
    queries = emb.where(F.col("vec_id") % 50 == 0)
    exact = S.brute_force_topk(queries, emb, k=10)
    truth = {(r["query_id"], r["cand_id"]) for r in exact.collect()}
    run = lambda: sorted(
        (r["query_id"], r["cand_id"], r["sim"], r["rank"])
        for r in S.lsh_topk_md5(queries, emb, k=10, n_bits=4, n_tables=8).collect()
    )
    first = run()
    approx = {(q, c) for q, c, _, _ in first}
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.6, f"recall@10 = {recall:.3f}"
    assert first == run()


def test_lsh_pairs_above_recall(emb):
    exact = {(r["id_a"], r["id_b"]) for r in S.cosine_pairs_above(emb, 0.35).collect()}
    approx = {(r["id_a"], r["id_b"]) for r in S.lsh_pairs_above(emb, 0.35).collect()}
    assert approx <= exact  # in-bucket verify is exact: no false positives
    recall = len(approx & exact) / max(len(exact), 1)
    assert recall >= 0.5, f"pair recall = {recall:.3f}"
