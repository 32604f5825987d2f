"""Deterministic sampling / packing operator fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_spark.operators.sampling import (
    hash_sample,
    sample_threshold_hex,
    stratified_cap,
    token_chunks,
)
from graph_database_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_threshold_hex():
    assert sample_threshold_hex(0.0) == "0000"
    assert sample_threshold_hex(0.5) == "8000"


def test_hash_sample_full_fraction_keeps_everything(spark):
    docs = load_table(spark, SF_DIR, "documents")
    assert hash_sample(docs, 1.0).count() == docs.count()


def test_hash_sample_fraction_and_determinism(spark):
    docs = load_table(spark, SF_DIR, "documents")
    n = docs.count()
    kept1 = {r["doc_id"] for r in hash_sample(docs, 0.2).select("doc_id").collect()}
    kept2 = {r["doc_id"] for r in hash_sample(docs, 0.2).select("doc_id").collect()}
    assert kept1 == kept2  # same rows every run
    assert abs(len(kept1) / n - 0.2) < 0.08  # ~fraction (binomial tolerance)
    # Nested property: a smaller fraction keeps a subset of a larger one.
    kept_small = {r["doc_id"] for r in hash_sample(docs, 0.05).select("doc_id").collect()}
    assert kept_small <= kept1


def test_stratified_cap_bounds_every_group(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = stratified_cap(docs, ["lang"], cap=30)
    per_group = {r["lang"]: r["n"] for r in
                 out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    orig = {r["lang"]: r["n"] for r in
            docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert per_group and all(n <= 30 for n in per_group.values())
    for lang, n in orig.items():  # groups under the cap keep everything
        assert per_group[lang] == min(n, 30)


def test_token_chunks_budget_semantics(spark):
    rows = [(i, "en", t) for i, t in enumerate([500, 600, 700, 400, 900, 100])]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    out = {r["doc_id"]: r["chunk_id"] for r in token_chunks(df, budget=1000).collect()}
    # start offsets: 0, 500, 1100, 1800, 2200, 3100 -> chunks 0,0,1,1,2,3
    assert out == {0: 0, 1: 0, 2: 1, 3: 1, 4: 2, 5: 3}


def test_token_chunks_partitioned_by_group(spark):
    rows = [(1, "en", 800), (2, "fr", 800), (3, "en", 800), (4, "fr", 800)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    out = {r["doc_id"]: r["chunk_id"] for r in token_chunks(df, budget=1000).collect()}
    # Each lang packs independently from offset 0.
    assert out == {1: 0, 2: 0, 3: 0, 4: 0}
