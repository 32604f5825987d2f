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


def test_empty_state_keeps_replay_idempotent(spark, tmp_path):
    """ADVICE r10: a merge that empties the counter set (K+1 tying
    counters all decrement to zero) must still advance last_batch, or a
    replay of the emptied batch re-merges it into the empty state.

    With K=4: batch 0 gives state {a:2,b:2,c:2} (3 distinct, no
    decrement); batch 1's summary is {d:2,e:2} — the merged total is 5
    equal counters, the (K+1)-th largest is 2, everything decrements to
    zero. An empty version MUST still skip batch 1 on replay."""
    path = str(tmp_path / "mg")
    b0 = spark.createDataFrame(
        [("a",), ("b",), ("c",)] * 2, "token string"
    )
    merge_batch_into_mg(b0, 0, path, "token", k=K)
    assert read_mg(spark, path) == {"a": 2, "b": 2, "c": 2}
    b1 = spark.createDataFrame([("d",), ("e",)] * 2, "token string")
    merge_batch_into_mg(b1, 1, path, "token", k=K)
    assert read_mg(spark, path) == {}  # the tie emptied the state
    # replay batch 1: without the sentinel, last_batch would read -1
    # and the re-merge would resurrect {d:2, e:2}.
    merge_batch_into_mg(b1, 1, path, "token", k=K)
    assert read_mg(spark, path) == {}
    # and the NEXT batch merges from the emptied state
    b2 = spark.createDataFrame([("f",)] * 4, "token string")
    merge_batch_into_mg(b2, 2, path, "token", k=K)
    assert read_mg(spark, path) == {"f": 4}
