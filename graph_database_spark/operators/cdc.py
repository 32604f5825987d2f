"""Content-defined chunking (CDC) — the shift-resistant dedup primitive
(rsync/LBFS lineage, and the chunk-level cousin of ExactSubstr dedup):
split each document at positions where a rolling polynomial hash of the
trailing W characters hits a boundary mask, so an insertion early in a
doc only re-chunks its local neighborhood instead of shifting every
fixed-width block. Shared chunks across docs then dedupe by content
hash regardless of where they sit.

The rolling hash needs NO recursion: the window hash at position i is
sum(c[i-k] * B^k, k=0..W-1) mod P — a fixed dot product of the last W
character codes against precomputed powers. Spark evaluates it inside
one JVM HOF per document (transform/filter over the code array — a
narrow map, zero shuffle until the cross-doc group); the oracle
evaluates the identical integer expression with W-1 window lags. All
arithmetic is BIGINT mod a 2^20 prime: max term W * 255 * P fits
comfortably, no 64-bit shifts (CLAUDE.md bit-width rule).

Production CDC adds min/max chunk-size clamps; this implementation is
the pure gear for determinism (adjacent boundaries allowed), documented
here so the simplification is explicit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graph_database_spark.functions.textnorm import normalize_text

__all__ = ["cdc_chunks", "cdc_dedup", "BASE", "PRIME", "WINDOW", "MASK", "POWERS"]

BASE = 257
PRIME = 1048573  # largest prime < 2^20
WINDOW = 8
MASK = 64  # boundary when hash % MASK == 0 -> expected chunk ~64 chars

# B^k mod P for k = 0..W-1, embedded as literals on both engines.
POWERS = [pow(BASE, k, PRIME) for k in range(WINDOW)]


def _hash_expr(arr: str, idx: str) -> str:
    """Window-hash expression at 1-based position idx over code array
    arr: sum of the trailing WINDOW codes times POWERS, mod PRIME."""
    terms = " + ".join(
        f"element_at({arr}, {idx} - {k}) * {p}" for k, p in enumerate(POWERS)
    )
    return f"(({terms}) % {PRIME})"


def cdc_chunks(docs: DataFrame) -> DataFrame:
    """Per-document chunk rows: (doc_id, chunk_idx, start, chunk_len,
    chunk_md5) — chunk boundaries where the rolling hash of the trailing
    WINDOW chars of the NORMALIZED text is 0 mod MASK; the final chunk
    always closes at the end of the doc. Empty normalized docs emit no
    chunks."""
    base = docs.select(
        "doc_id", normalize_text(F.col("text")).alias("norm")
    ).where(F.length("norm") > 0)
    coded = base.select(
        "doc_id",
        "norm",
        F.length("norm").cast("int").alias("n"),
        F.expr(
            "transform(sequence(1, length(norm)),"
            " i -> CAST(ascii(substr(norm, i, 1)) AS BIGINT))"
        ).alias("a"),
    )
    h = _hash_expr("a", "i")
    bounds = (
        f"array_distinct(concat("
        f" IF(n >= {WINDOW},"
        f" filter(sequence({WINDOW}, n), i -> {h} % {MASK} = 0),"
        " CAST(array() AS ARRAY<INT>)),"
        " array(n)))"
    )
    chunks = (
        "transform(bnds, (b, j) -> struct("
        " CAST(j AS BIGINT) AS chunk_idx,"
        " CAST(IF(j = 0, 1, element_at(bnds, j) + 1) AS BIGINT) AS start,"
        " CAST(b - IF(j = 0, 1, element_at(bnds, j) + 1) + 1 AS BIGINT)"
        " AS chunk_len,"
        " md5(substr(norm, IF(j = 0, 1, element_at(bnds, j) + 1),"
        " b - IF(j = 0, 1, element_at(bnds, j) + 1) + 1)) AS chunk_md5))"
    )
    return (
        coded.withColumn("bnds", F.expr(bounds))
        .select("doc_id", F.explode(F.expr(chunks)).alias("c"))
        .select(
            "doc_id", "c.chunk_idx", "c.start", "c.chunk_len", "c.chunk_md5"
        )
    )


def cdc_dedup(docs: DataFrame) -> DataFrame:
    """Cross-document chunk-level dedup census: chunks whose content
    recurs (n_copies > 1), with distinct-doc spread — the shift-robust
    shared-boilerplate detector. One shuffle on the content hash; the
    scalar md5 rides the shuffle, never the chunk text (CLAUDE.md
    scalar-rides rule)."""
    ch = cdc_chunks(docs)
    return (
        ch.groupBy("chunk_md5")
        .agg(
            F.count("*").alias("n_copies"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.max("chunk_len").alias("chunk_len"),
        )
        .where(F.col("n_copies") > 1)
    )
