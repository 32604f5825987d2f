"""Persisted inverted index (sinks/text_index.py): build-once-probe-many
parity with the refit BM25 path, and probe-side scan economy."""

from __future__ import annotations

from graph_database_spark.operators.retrieval import bm25_search
from graph_database_spark.sinks.text_index import (
    build_text_index,
    probe_text_index,
)
from graph_database_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.001"
QUERY = ["spark", "table", "query"]


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_probe_matches_refit_and_is_reusable(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    try:
        build_text_index(docs, "txt_idx", str(tmp_path / "ti"))
        refit = _rows(bm25_search(docs, QUERY))
        probe1 = _rows(probe_text_index(spark, str(tmp_path / "ti"), QUERY))
        probe2 = _rows(probe_text_index(spark, str(tmp_path / "ti"), QUERY))
        assert probe1 == refit
        assert probe2 == refit
        assert len(refit) > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS txt_idx")


def test_probe_scans_bucketed_postings_without_corpus_shuffle(
    spark, tmp_path
):
    docs = load_table(spark, SF_DIR, "documents")
    try:
        build_text_index(docs, "txt_idx2", str(tmp_path / "ti2"))
        out = probe_text_index(spark, str(tmp_path / "ti2"), QUERY)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # Inherent Exchanges only: the per-doc score aggregation over
        # the MATCHED postings (a handful of terms' buckets, not the
        # corpus) and the final rank window over <= top rows. The
        # postings scan itself must be a bucketed scan with the term
        # filter pushed down — no tokenize, no corpus-wide shuffle.
        assert plan.count("Exchange") <= 2, plan[:3000]
        assert "Bucketed: true" in plan, plan[:3000]
        assert "isin(spark,table,query)" in plan.replace(
            " ", ""
        ) or "term" in plan  # filter pushed to scan
    finally:
        spark.sql("DROP TABLE IF EXISTS txt_idx2")
