"""PII detection and redaction (SURVEY §2.11 X5 extension).

Every production training-data pipeline runs a PII pass before
anything ships (emails, IPs, phone numbers at minimum — the C4 /
RefinedWeb hygiene layer). The reference has no text surface at all
(src/main.js is a graph loader + five Cypher queries); this implements
the scrub as pure JVM regexp expressions — narrow map, no shuffle,
linear at any scale.

Cross-engine parity: the patterns use only constructs Java regex and
DuckDB's RE2 agree on (character classes, ``\\b``, ``\\d``, bounded
quantifiers; ``[.]`` instead of escaped dots so the same string works
in both dialects). Counts are regexp_count / len(regexp_extract_all),
redaction is sequential global regexp_replace (email first — once its
digits are gone, the IP and phone passes cannot be confused by them).

The synthetic corpus contains no '@' at all, so the catalog query
first PLANTS deterministic PII spans (derived from doc_id — the
attach_media philosophy: fake payload, real machinery) and the oracle
replays the plant + scan + redact; non-vacuity is pytest-pinned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["EMAIL_RE", "IPV4_RE", "PHONE_RE", "plant_pii", "pii_scan", "redact"]

EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}[.]\d{1,3}[.]\d{1,3}[.]\d{1,3}\b"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"


def plant_pii(docs: DataFrame) -> DataFrame:
    """``(doc_id, text)`` with deterministic PII spans appended to a
    subset of documents: every 7th gets an email, every 11th an IPv4,
    every 13th a phone number (overlaps yield multi-class docs). Values
    vary with doc_id so the scan can't pass by matching one literal."""
    d = F.col("doc_id")
    email = F.when(
        d % 7 == 0,
        F.concat(
            F.lit(" contact user"), d.cast("string"),
            F.lit("@mail"), (d % 100).cast("string"), F.lit(".com"),
        ),
    ).otherwise(F.lit(""))
    ip = F.when(
        d % 11 == 0,
        F.concat(
            F.lit(" from 10."), (d % 256).cast("string"),
            F.lit(".0."), ((d * 7) % 256).cast("string"),
        ),
    ).otherwise(F.lit(""))
    phone = F.when(
        d % 13 == 0,
        F.concat(
            F.lit(" call "), (F.lit(100) + d % 900).cast("string"),
            F.lit("-"), (F.lit(100) + (d * 3) % 900).cast("string"),
            F.lit("-"), (F.lit(1000) + d % 9000).cast("string"),
        ),
    ).otherwise(F.lit(""))
    return docs.select(
        "doc_id", F.concat(F.col("text"), email, ip, phone).alias("text")
    )


def redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The curation-pipeline form: every column preserved, ``text_col``
    replaced by its staged redaction (email -> IP -> phone), plus a
    ``has_pii`` flag. Narrow map — composes before quality/language
    annotation in the curate chain so no downstream signal ever sees
    raw PII."""
    t = F.col(text_col)
    after_email = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, IPV4_RE, "<IP>")
    redacted = F.regexp_replace(after_ip, PHONE_RE, "<PHONE>")
    n_spans = (
        F.regexp_count(t, F.lit(EMAIL_RE))
        + F.regexp_count(after_email, F.lit(IPV4_RE))
        + F.regexp_count(after_ip, F.lit(PHONE_RE))
    )
    return docs.withColumn("has_pii", (n_spans > 0).cast("int")).withColumn(
        text_col, redacted
    )


def pii_scan(docs: DataFrame) -> DataFrame:
    """Per-document PII census + redaction accounting:
    ``(doc_id, n_emails, n_ipv4, n_phones, has_pii, n_chars_redacted)``
    — all integers. Redaction replaces every match with a fixed tag
    (email pass first: with its digits gone, the IP/phone passes see
    only genuine candidates)."""
    t = F.col("text")
    # Counts follow the staged redaction: each class is counted on the
    # PREVIOUS stage's output, so an email's numeric local/domain parts
    # ("1.2.3.4@host") can't double-count as an IP, and a redacted IP's
    # digits can't resemble a phone (pinned by tests/test_pii.py).
    after_email = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, IPV4_RE, "<IP>")
    redacted = F.regexp_replace(after_ip, PHONE_RE, "<PHONE>")
    n_emails = F.regexp_count(t, F.lit(EMAIL_RE))
    n_ipv4 = F.regexp_count(after_email, F.lit(IPV4_RE))
    n_phones = F.regexp_count(after_ip, F.lit(PHONE_RE))
    return docs.select(
        "doc_id",
        n_emails.cast("long").alias("n_emails"),
        n_ipv4.cast("long").alias("n_ipv4"),
        n_phones.cast("long").alias("n_phones"),
        ((n_emails + n_ipv4 + n_phones) > 0).cast("int").alias("has_pii"),
        F.length(redacted).cast("long").alias("n_chars_redacted"),
    )
