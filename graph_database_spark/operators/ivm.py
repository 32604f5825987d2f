"""Incremental view maintenance for additive aggregates.

A 100 TB warehouse does not recompute its aggregate tables per load; it
folds each delta batch into the standing aggregate. For the additive
family (count / sum — and anything derivable from them: mean, totals,
rates) the refresh is exact: aggregate the DELTA alone (small), union
with the standing aggregate rows, and re-aggregate by key — one shuffle
over |delta| + |groups| rows instead of a full-table pass. min/max and
distinct counts are NOT additive under deletes and need either full
recompute or auxiliary structures (sketches for approximate distinct);
this module refuses them by design.

The catalog's ``incremental_agg`` query proves the contract: a
base/delta split of orders refreshed through ``refresh_additive``
hash-matches an oracle that aggregates the FULL table directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "additive_agg",
    "refresh_additive",
    "delta_join",
    "hll_state",
    "refresh_hll",
    "hll_estimate",
]


def additive_agg(
    df: DataFrame, keys: list[str], sums: dict[str, str]
) -> DataFrame:
    """Grouped additive state: ``count(*) AS n_rows`` plus one
    ``sum(expr) AS name`` per entry of ``sums``."""
    aggs = [F.count("*").alias("n_rows")] + [
        F.sum(F.expr(expr)).alias(name) for name, expr in sums.items()
    ]
    return df.groupBy(*keys).agg(*aggs)


def refresh_additive(
    state: DataFrame, delta: DataFrame, keys: list[str], sums: dict[str, str]
) -> DataFrame:
    """Fold a delta batch into standing additive state — exact, and
    O(|delta| + |groups|): aggregate the delta, union the two state
    frames, re-aggregate by key. New keys appear, untouched keys pass
    through with their old values (sums of one row)."""
    delta_state = additive_agg(delta, keys, sums)
    merged = state.unionByName(delta_state)
    aggs = [F.sum("n_rows").alias("n_rows")] + [
        F.sum(name).alias(name) for name in sums
    ]
    return merged.groupBy(*keys).agg(*aggs)


def delta_join(
    a: DataFrame,
    delta_a: DataFrame,
    b: DataFrame,
    delta_b: DataFrame,
    on,
) -> DataFrame:
    """Insert-delta of the join view ``J = A |><| B``: with ``A' = A u
    dA`` and ``B' = B u dB`` (bag union of inserts),

        dJ = (dA |><| B)  u  (A |><| dB)  u  (dA |><| dB)

    and ``J' = J u dJ`` EXACTLY — the textbook incremental join
    maintenance identity (each new pair has its a-row, its b-row, or
    both in the delta; the three terms partition those cases, so no
    pair is produced twice). ``a`` and ``b`` are the PRE-delta tables.

    Cost shape: two delta-sized probes into the standing tables plus a
    delta-x-delta join — never a full A |><| B recompute. At 100 TB the
    standing sides are stored bucketed on the join key
    (sources/bucketed), so the probes shuffle only the delta; the
    catalog's ``incremental_join`` hash-pass proves exactness."""
    return (
        delta_a.join(b, on)
        .unionByName(a.join(delta_b, on))
        .unionByName(delta_a.join(delta_b, on))
    )


# --- distinct counts: NOT additive; maintained via mergeable HLL
# registers instead (register-wise max over any input split equals the
# registers of the union — the sketch form of incremental maintenance).

def hll_state(
    df: DataFrame, keys: list[str], key: str, m: int = 32
) -> DataFrame:
    """``(keys..., _b, _reg)`` — per-group HLL register state over the
    md5-60-bit hash (operators/sketches.hll_distinct's decomposition)."""
    from graph_database_spark.operators.sketches import md5_hash60

    w = F.expr(f"_h div {m}")
    rho = F.when(w == 0, F.lit(55)).otherwise(
        F.bit_count((w.bitwiseAND(-w)) - 1) + 1
    )
    return (
        df.select(*keys, md5_hash60(F.col(key)).alias("_h"))
        .select(*keys, (F.col("_h") % m).alias("_b"), rho.alias("_rho"))
        .groupBy(*keys, "_b")
        .agg(F.max("_rho").alias("_reg"))
    )


def refresh_hll(
    state: DataFrame, delta: DataFrame, keys: list[str], key: str, m: int = 32
) -> DataFrame:
    """Fold a delta batch into standing register state: register-wise
    max — associative, commutative, idempotent (re-folding the same
    rows changes nothing, unlike the additive path)."""
    delta_state = hll_state(delta, keys, key, m)
    return (
        state.unionByName(delta_state)
        .groupBy(*keys, "_b")
        .agg(F.max("_reg").alias("_reg"))
    )


def hll_estimate(
    state: DataFrame, keys: list[str], m: int = 32, alpha: float = 0.697
) -> DataFrame:
    """``(keys..., est_distinct)`` from register state — the integer
    register sum + one IEEE division estimator hll_distinct
    hash-verifies (same expression, so the same oracle applies)."""
    ssum = (
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 55 - _reg)"))
        + (F.lit(m) - F.count("*")) * F.lit(1 << 55)
    ).alias("_s")
    return (
        state.groupBy(*keys)
        .agg(ssum)
        .select(
            *keys,
            F.round(
                F.lit(alpha * m * m * 2.0**55) / F.col("_s").cast("double"), 4
            ).alias("est_distinct"),
        )
    )
