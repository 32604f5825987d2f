"""Curation CLI: end-to-end run produces the documented artifacts."""

from __future__ import annotations

import json

from graph_database_spark.curate import curate


def test_curate_end_to_end(spark, tmp_path):
    out = str(tmp_path / "curated")
    summary = curate(spark, "/root/testdata/sf0.001", out, cap=50)
    assert summary["kept_docs"] <= summary["dedup_survivors"] <= summary["input_docs"]
    assert summary["kept_docs"] > 0

    corpus = spark.read.parquet(f"{out}/corpus")
    assert {"doc_id", "text", "quality", "lang_pred"} <= set(corpus.columns)
    # Stratified cap enforced per (lang, source).
    per = corpus.groupBy("lang", "source").count().collect()
    assert all(r["count"] <= 50 for r in per)
    # Partition pruning available on the lang directory layout.
    assert json.load(open(f"{out}/summary.json"))["kept_docs"] == corpus.count()
