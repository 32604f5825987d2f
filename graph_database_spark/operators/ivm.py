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

__all__ = ["additive_agg", "refresh_additive"]


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
