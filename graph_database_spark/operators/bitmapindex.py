"""Bitmap-index set algebra: exact distinct-set intersections without a
row-level join.

The classic warehouse bitmap index: pack each key's member-id set into
31-bit machine words (``word = id div 31``, ``mask |= 1 << (id % 31)``),
then answer |A ∩ B| / |A ∪ B| for every key pair by ANDing masks on the
word axis — the data that moves through the pair join is ONE long per
(key, word), not one row per member. At 100 TB the compression factor
is the member multiplicity per word (up to 31×), and the pair join's
key space is words, which AQE can coalesce safely because compute per
cell is a popcount, not a quadratic comparison.

Bit positions stay in [0, 30] (CLAUDE.md: left shifts keep bit width
<= 31 — bit 63 overflows DuckDB and wraps in Java), so every mask is a
small positive BIGINT and the DuckDB oracle replays the construction
word for word.

No reference analog (src/main.js has no set-algebra surface); this is
the LLM-pipeline / warehouse extension family (SURVEY.md §2.7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

WORD_BITS = 31


def bitmap_index(
    df: DataFrame, key_col: str, id_col: str, word_bits: int = WORD_BITS
) -> DataFrame:
    """(key, word, mask) bitmap index of nonnegative integer ``id_col``
    members per ``key_col``. One shuffle (the groupBy); bit_or is a
    map-side-combinable JVM aggregate."""
    return (
        df.select(
            F.col(key_col).alias("key"),
            F.expr(f"CAST({id_col} AS BIGINT) div {word_bits}").alias("word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT),"
                f" CAST(CAST({id_col} AS BIGINT) % {word_bits} AS INT))"
            ).alias("bit"),
        )
        .groupBy("key", "word")
        .agg(F.expr("bit_or(bit)").alias("mask"))
    )


def merge_bitmaps(state: DataFrame, delta: DataFrame) -> DataFrame:
    """OR-merge two (key, word, mask) bitmap indexes. Bitwise OR is
    idempotent and commutative — bitmap state is a CRDT register, so
    replayed or reordered deltas cannot corrupt it (unlike additive
    counters, which need a batch-skip guard; see streaming/ivm.py)."""
    return (
        state.unionByName(delta)
        .groupBy("key", "word")
        .agg(F.expr("bit_or(mask)").alias("mask"))
    )


def distinct_counts(bitmaps: DataFrame) -> DataFrame:
    """Exact per-key distinct cardinalities from bitmap state: one
    popcount fold, no re-scan of the raw data."""
    return bitmaps.groupBy("key").agg(
        F.expr("CAST(sum(bit_count(mask)) AS BIGINT)").alias("n_distinct")
    )


def bitmap_pair_stats(bitmaps: DataFrame) -> DataFrame:
    """Pairwise exact set cardinalities from a (key, word, mask) index:
    one row per unordered key pair (key_a < key_b) with |A|, |B|,
    |A∩B|, |A∪B| and Jaccard in ppm.

    |A| folds per key from popcounts; the intersection joins masks on
    the word axis only; |A∪B| = |A| + |B| - |A∩B| needs no second
    join. The per-key size frame is broadcast (key universe is small
    by construction — event types, labels, shards).
    """
    sizes = bitmaps.groupBy("key").agg(
        F.expr("CAST(sum(bit_count(mask)) AS BIGINT)").alias("n")
    )
    a = bitmaps.select(
        F.col("key").alias("ka"), "word", F.col("mask").alias("ma")
    )
    b = bitmaps.select(
        F.col("key").alias("kb"), "word", F.col("mask").alias("mb")
    )
    inter = (
        a.join(b, "word")
        .where(F.col("ka") < F.col("kb"))
        .groupBy("ka", "kb")
        .agg(F.expr("CAST(sum(bit_count(ma & mb)) AS BIGINT)").alias("n_and"))
    )
    sa = sizes.select(F.col("key").alias("ka"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("key").alias("kb"), F.col("n").alias("n_b"))
    pairs = sa.join(F.broadcast(sb), sa.ka < sb.kb)
    out = pairs.join(F.broadcast(inter), ["ka", "kb"], "left").select(
        F.col("ka").alias("type_a"),
        F.col("kb").alias("type_b"),
        "n_a",
        "n_b",
        F.coalesce("n_and", F.lit(0).cast("long")).alias("n_and"),
    )
    return out.select(
        "type_a",
        "type_b",
        "n_a",
        "n_b",
        "n_and",
        (F.col("n_a") + F.col("n_b") - F.col("n_and")).alias("n_or"),
        F.expr(
            "(n_and * 1000000) div (n_a + n_b - n_and)"
        ).alias("jaccard_ppm"),
    )
