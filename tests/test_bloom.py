"""Bloom filter build/probe: membership guarantees and merge semantics."""

from __future__ import annotations

from graph_database_spark.operators.bloom import bloom_build, bloom_probe_stats


def test_bloom_no_false_negatives_and_counts(spark):
    build = spark.createDataFrame([(i,) for i in range(50)], "k long")
    probe = spark.createDataFrame([(i,) for i in range(100)], "k long")
    row = bloom_probe_stats(build, probe, "k", "k").first()
    assert row["n_probe"] == 100
    assert row["n_exact"] == 50
    # every true member must pass (no false negatives)
    assert row["n_pass"] >= 50
    assert row["n_pass"] - 50 == row["n_false_pos"]
    # 4096 bits / 50 keys: false-positive rate should be tiny
    assert row["n_false_pos"] <= 5


def test_bloom_build_merges_by_bit_or(spark):
    # Filter of A ∪ B == bit_or merge of filter(A) and filter(B).
    a = spark.createDataFrame([(i,) for i in range(25)], "k long")
    b = spark.createDataFrame([(i,) for i in range(25, 50)], "k long")
    union = a.union(b)
    wa = {r["word"]: r["bits"] for r in bloom_build(a, "k").collect()}
    wb = {r["word"]: r["bits"] for r in bloom_build(b, "k").collect()}
    wu = {r["word"]: r["bits"] for r in bloom_build(union, "k").collect()}
    merged = {w: wa.get(w, 0) | wb.get(w, 0) for w in set(wa) | set(wb)}
    assert merged == wu
