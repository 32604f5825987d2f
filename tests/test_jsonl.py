"""JSONL source/sink roundtrip + malformed-record quarantine."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_spark.sources.jsonl import read_jsonl, write_jsonl
from graph_database_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_jsonl_roundtrip(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, path, partitions=2)
    back = read_jsonl(spark, path, docs.schema).cache()
    assert back.where(F.col("_corrupt").isNotNull()).count() == 0
    a = {tuple(r) for r in docs.collect()}
    b = {tuple(r) for r in back.drop("_corrupt").select(*docs.columns).collect()}
    assert a == b


def test_jsonl_quarantines_malformed(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok"}\n'
        "this is not json\n"
        '{"doc_id": 2, "text": "also ok"}\n'
    )
    schema = "doc_id long, text string"
    from pyspark.sql.types import _parse_datatype_string

    back = read_jsonl(spark, str(p), _parse_datatype_string(schema)).cache()
    good = back.where(F.col("_corrupt").isNull())
    bad = back.where(F.col("_corrupt").isNotNull())
    assert {r["doc_id"] for r in good.collect()} == {1, 2}
    assert bad.count() == 1
    assert "not json" in bad.first()["_corrupt"]
