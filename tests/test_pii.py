"""PII scan/redact tests (operators/pii.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_spark.operators import pii


def test_scan_counts_and_redaction(spark):
    docs = spark.createDataFrame(
        [
            (1, "reach me at jo.na+x@sub.example.org or 10.0.0.1 now"),
            (2, "call 555-123-4567 twice: 555-123-4567"),
            (3, "no pii here, just 1.2 numbers and a@b (not an email)"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in pii.pii_scan(docs).collect()}
    assert out[1]["n_emails"] == 1 and out[1]["n_ipv4"] == 1
    assert out[1]["has_pii"] == 1
    assert out[2]["n_phones"] == 2
    assert out[3]["n_emails"] == 0 and out[3]["n_ipv4"] == 0
    assert out[3]["n_phones"] == 0 and out[3]["has_pii"] == 0
    # redaction accounting: doc 3 untouched
    assert out[3]["n_chars_redacted"] == len(
        "no pii here, just 1.2 numbers and a@b (not an email)"
    )


def test_email_redaction_removes_digit_confusion(spark):
    # an email whose local/domain digits could look like an IP must not
    # leak into the IP pass once redacted
    docs = spark.createDataFrame(
        [(1, "x 1.2.3.4@do.main.com y")], "doc_id long, text string"
    )
    r = pii.pii_scan(docs).collect()[0]
    assert r["n_emails"] == 1
    assert r["n_ipv4"] == 0


def test_planted_corpus_is_non_vacuous(spark):
    from graph_database_spark.sources.parquet import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    planted = pii.plant_pii(docs)
    agg = (
        pii.pii_scan(planted)
        .agg(
            F.sum("n_emails").alias("e"),
            F.sum("n_ipv4").alias("i"),
            F.sum("n_phones").alias("p"),
            F.sum("has_pii").alias("h"),
        )
        .collect()[0]
    )
    assert agg["e"] > 0 and agg["i"] > 0 and agg["p"] > 0
    assert agg["h"] > 0


def test_redact_preserves_columns_and_scrubs(spark):
    docs = spark.createDataFrame(
        [(1, "write to a.b@c.org today", "src0", 24)],
        "doc_id long, text string, source string, n_chars long",
    )
    out = pii.redact(docs).collect()[0]
    assert out["source"] == "src0" and out["n_chars"] == 24
    assert out["has_pii"] == 1
    assert "@" not in out["text"] and "<EMAIL>" in out["text"]
