"""Idempotent foreachBatch sink: batch-partitioned output, replay
overwrite semantics, incremental pruned reads."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_spark.sources.parquet import load_table
from graph_database_spark.streaming.events import read_events_stream
from graph_database_spark.streaming.sink import read_since, write_idempotent

SF_DIR = "/root/testdata/sf0.001"


def test_sink_writes_all_rows_batch_partitioned(spark, tmp_path):
    stream = read_events_stream(spark, SF_DIR)
    q = write_idempotent(
        stream, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    q.processAllAvailable()
    q.stop()
    out = spark.read.parquet(str(tmp_path / "out"))
    batch_events = load_table(spark, SF_DIR, "events")
    assert out.count() == batch_events.count()
    assert "batch_id" in out.columns
    # Same event ids end-to-end.
    a = {r["event_id"] for r in out.select("event_id").collect()}
    b = {r["event_id"] for r in batch_events.select("event_id").collect()}
    assert a == b


def test_replayed_batch_overwrites_not_duplicates(spark, tmp_path):
    # Simulate the crash-replay contract directly: the same batch_id
    # written twice must leave ONE copy (its directory overwritten),
    # while other batches stay untouched.
    path = str(tmp_path / "out")
    ev = load_table(spark, SF_DIR, "events").limit(100).cache()
    first, second = ev.limit(50), ev.subtract(ev.limit(50))

    def write_batch(df, bid):
        (
            df.withColumn("batch_id", F.lit(bid))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(path)
        )

    write_batch(first, 0)
    write_batch(second, 1)
    write_batch(second, 1)  # replay of batch 1
    out = spark.read.parquet(path)
    assert out.count() == 100
    assert out.where(F.col("batch_id") == 1).count() == second.count()


def test_read_since_prunes_partitions(spark, tmp_path):
    path = str(tmp_path / "out")
    ev = load_table(spark, SF_DIR, "events").limit(60).cache()
    for bid, chunk in enumerate([ev.limit(20), ev.limit(40).subtract(ev.limit(20)), ev.subtract(ev.limit(40))]):
        (
            chunk.withColumn("batch_id", F.lit(bid))
            .write.mode("append")
            .partitionBy("batch_id")
            .parquet(path)
        )
    inc = read_since(spark, path, after_batch=0)
    assert inc.count() == 40
    plan = inc._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "batch_id" in plan.split("PartitionFilters")[1][:200]


def test_streaming_merge_builds_versioned_table(spark, tmp_path):
    from graph_database_spark.sinks.versioned import read_version
    from graph_database_spark.streaming.sink import write_merge

    stream = read_events_stream(spark, SF_DIR).select(
        "event_id", "user_id", "event_type"
    )
    path = str(tmp_path / "tbl")
    q = write_merge(stream, path, ["event_id"], str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()
    out = read_version(spark, path)
    batch_events = load_table(spark, SF_DIR, "events")
    assert out.count() == batch_events.select("event_id").distinct().count()


def test_merge_replay_is_idempotent(spark, tmp_path):
    # Apply the same micro-batch merge twice (the crash-replay
    # contract): content must be identical, no duplicate keys.
    from graph_database_spark.sinks.versioned import merge_upsert, read_version

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    merge_upsert(spark, path, base, ["id"])
    ups = spark.createDataFrame([(2, "B"), (3, "c")], "id long, v string")
    merge_upsert(spark, path, ups, ["id"])
    before = sorted(map(tuple, read_version(spark, path).collect()))
    merge_upsert(spark, path, ups, ["id"])  # replay
    after = sorted(map(tuple, read_version(spark, path).collect()))
    assert before == after == [(1, "a"), (2, "B"), (3, "c")]
