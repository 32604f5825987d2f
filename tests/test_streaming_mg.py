"""Streaming Misra-Gries sink: replay-safe, bound-honoring, and exactly
equal to a driver-side fold of the same batch sequence."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_spark.operators.sketches import (
    mg_batch_summary,
    mg_merge,
)
from graph_database_spark.sources.parquet import load_table
from graph_database_spark.streaming.mg import (
    merge_batch_into_mg,
    read_mg,
)

SF_DIR = "/root/testdata/sf0.001"
K = 4


def _batches(spark, n=3):
    docs = load_table(spark, SF_DIR, "documents")
    from graph_database_spark.functions.textnorm import tokens

    tok = docs.select(
        (F.col("doc_id") % n).alias("b"),
        F.explode(tokens(F.col("text"))).alias("token"),
    ).localCheckpoint()
    return [tok.where(F.col("b") == i).select("token") for i in range(n)]


def test_stream_fold_matches_driver_fold_and_bound(spark, tmp_path):
    path = str(tmp_path / "mg")
    batches = _batches(spark)
    state: dict[str, int] = {}
    total = 0
    for i, b in enumerate(batches):
        merge_batch_into_mg(b, i, path, "token", k=K)
        state = mg_merge(state, mg_batch_summary(b, "token", K), K)
        total += b.count()
    streamed = read_mg(spark, path)
    assert streamed == state  # same fold, same counters
    assert 0 < len(streamed) <= K
    # two-sided MG guarantee vs exact counts over the union. (Note: on
    # this near-uniform 31-token vocabulary nothing exceeds n/(K+1), so
    # MG guarantees only the bound, not WHICH tokens hold counters.)
    exact_sum: dict[str, int] = {}
    for b in batches:
        for r in b.groupBy("token").count().collect():
            exact_sum[r["token"]] = exact_sum.get(r["token"], 0) + int(
                r["count"]
            )
    for token, est in streamed.items():
        true = exact_sum[token]
        assert est <= true <= est + total // (K + 1) + 1, (token, est, true)


def test_replayed_batch_is_skipped(spark, tmp_path):
    path = str(tmp_path / "mg")
    batches = _batches(spark)
    for i, b in enumerate(batches):
        merge_batch_into_mg(b, i, path, "token", k=K)
    once = read_mg(spark, path)
    merge_batch_into_mg(batches[-1], len(batches) - 1, path, "token", k=K)
    assert read_mg(spark, path) == once  # at-least-once replay is a no-op
