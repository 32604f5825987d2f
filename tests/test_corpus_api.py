"""Corpus facade: column remapping + delegation consistency."""

from __future__ import annotations

from graph_database_spark.corpus_api import Corpus
from graph_database_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_remap_and_delegation(spark):
    docs = load_table(spark, SF_DIR, "documents").selectExpr(
        "doc_id AS id", "text AS body", "lang", "source"
    )
    c = Corpus(docs, id_col="id", text_col="body")
    q = c.quality()
    assert "doc_id" in q.columns and q.count() == docs.count()

    # Facade survivors == operator survivors (same plan underneath).
    direct = load_table(spark, SF_DIR, "documents")
    want = {r["doc_id"] for r in Corpus(direct).staged_dedup().collect()}
    got = {r["doc_id"] for r in c.staged_dedup().collect()}
    assert got == want and len(got) > 0


def test_sample_and_stratified(spark):
    c = Corpus(load_table(spark, SF_DIR, "documents"))
    n = c.docs.count()
    s = c.sample(0.2).count()
    assert 0 < s < n
    capped = c.stratified(["lang"], 3)
    per = {r["lang"]: r["n"] for r in
           capped.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    assert per and all(v <= 3 for v in per.values())


def test_snapshot_roundtrip(spark, tmp_path):
    # snapshot -> mutate -> at_version replays the pinned corpus exactly.
    path = str(tmp_path / "corpus")
    c = Corpus(load_table(spark, SF_DIR, "documents"))
    v1 = c.snapshot(path, note="raw")
    kept = Corpus(c.staged_dedup().join(c.docs, "doc_id", "inner"))
    v2 = kept.snapshot(path, note="deduped")
    assert (v1, v2) == (1, 2)
    assert Corpus.at_version(spark, path).docs.count() == kept.docs.count()
    replay = Corpus.at_version(spark, path, version=1)
    assert replay.docs.count() == c.docs.count()
    assert "text" in replay.docs.columns
