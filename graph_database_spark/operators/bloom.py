"""Mergeable Bloom-filter build/probe — the runtime-filter primitive.

At 100 TB the cheapest join is the one that never shuffles: a Bloom
filter built from the small side's keys and broadcast to the big side's
scan discards non-matching rows BEFORE any exchange (Spark's own
`spark.sql.optimizer.runtimeFilter.bloomFilter.enabled` applies the same
idea inside Catalyst; this operator makes it a declared, verifiable
surface with an explicitly mergeable build).

Build: each key sets ``n_hash`` md5-derived bit positions in an
``m_bits``-wide bitmap stored as ``m_bits/32`` words (32 bits per word: bit 63 of a signed 64-bit shift overflows DuckDB and wraps in Java — 32-bit words keep every shift exact in both engines); per-word ``bit_or``
aggregation is associative/commutative, so partial filters from any
partitioning (or any cluster) merge losslessly — one map-side-combinable
shuffle of at most ``m_bits/32`` rows. Probe: the dense word array
becomes ONE driver-side literal (the constant-folded-literal pattern —
CLAUDE.md / SCALE.md's LSH sign matrix lesson), so membership is a pure
narrow projection: ``n_hash`` AND-tests per row, zero joins, zero
shuffles of the probe side.

Everything is integer arithmetic on md5-derived values — bit-identical
in any engine, which is why the catalog query can hash-verify a Bloom
filter (the classic "approximate" structure is fully deterministic once
the hash family is pinned; only its false-positive SET varies with m/k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["bloom_build", "bloom_probe_stats"]


def _pos_sql(key_sql: str, j: int, m_bits: int) -> str:
    """SQL text for bit position j of a key expression: md5(j|key) mod m
    on the first 15 hex chars (60 bits, positive — ``%`` agrees across
    engines on non-negative operands)."""
    return (
        f"(cast(conv(substring(md5(concat('{j}|', {key_sql})), 1, 15), 16, 10)"
        f" as bigint) % {m_bits})"
    )


def bloom_build(
    keys: DataFrame, key_col: str, n_hash: int = 3, m_bits: int = 4096
) -> DataFrame:
    """``(word, bits)`` — the filter as bit_or-merged 64-bit words
    (sparse: only words with a set bit appear)."""
    pos_exprs = ", ".join(
        _pos_sql(f"cast({key_col} as string)", j, m_bits) for j in range(n_hash)
    )
    return (
        keys.select(F.expr(f"explode(array({pos_exprs}))").alias("p"))
        .select(
            F.expr("p div 32").alias("word"),
            F.expr("shiftleft(1L, cast(p % 32 as int))").alias("b"),
        )
        .groupBy("word")
        .agg(F.bit_or("b").alias("bits"))
    )


def bloom_probe_stats(
    build_keys: DataFrame,
    probe: DataFrame,
    build_col: str,
    probe_col: str,
    n_hash: int = 3,
    m_bits: int = 4096,
) -> DataFrame:
    """One-row summary of a Bloom semi-join:
    ``(n_probe, n_exact, n_pass, n_false_pos)``.

    ``n_pass`` counts probe rows whose every hash position is set;
    ``n_false_pos`` = passed but not an exact member — the quantity you
    monitor to size ``m_bits`` at scale. The filter words collapse to a
    driver-side literal array (<= m_bits/32 longs, here 128); the exact
    member set rides a broadcast join used ONLY to verify the filter —
    a production probe would stop at the projection.
    """
    n_words = m_bits // 32
    words = {
        r["word"]: r["bits"]
        for r in bloom_build(build_keys, build_col, n_hash, m_bits).collect()
    }
    arr = ", ".join(f"{words.get(w, 0)}L" for w in range(n_words))
    bloom_lit = f"array({arr})"
    # Materialize each hash position as a column ONCE, then derive
    # word/bit from the column — the hit test would otherwise embed the
    # md5/conv chain twice per probe (CLAUDE.md materialize-expensive-
    # expressions rule, applied consistently).
    pos_cols = {
        f"p{j}": F.expr(_pos_sql("cast(k as string)", j, m_bits))
        for j in range(n_hash)
    }
    pass_expr = " AND ".join(
        f"(element_at({bloom_lit}, cast(p{j} div 32 as int) + 1)"
        f" & shiftleft(1L, cast(p{j} % 32 as int))) != 0L"
        for j in range(n_hash)
    )
    members = (
        build_keys.select(F.col(build_col).alias("k"))
        .distinct()
        .withColumn("member", F.lit(True))
    )
    flagged = (
        probe.select(F.col(probe_col).alias("k"))
        .withColumns(pos_cols)
        .withColumn("pass", F.expr(pass_expr))
        .join(F.broadcast(members), "k", "left")
    )
    return flagged.agg(
        F.count("*").alias("n_probe"),
        F.count(F.when(F.col("member"), 1)).alias("n_exact"),
        F.count(F.when(F.col("pass"), 1)).alias("n_pass"),
        F.count(F.when(F.col("pass") & F.col("member").isNull(), 1)).alias(
            "n_false_pos"
        ),
    )
