"""Skew-mitigation join helpers.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized partitions; ``salted_join`` is the static
fallback for the pathological case AQE can't fix — a single join key so
hot that even a split partition's build side overflows — and for engines
or modes where AQE is off.

Mechanics: the big (probe) side gets a deterministic salt derived from a
row-unique column, widening each hot key into ``n_salts`` shuffle keys;
the small (build) side is replicated once per salt via a range explode.
Cost: build-side volume x n_salts — use only when the build side is
small or pre-filtered to the hot keys (the usual production pattern:
salt ONLY the keys above a frequency threshold and union the rest
through a plain join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["salted_join"]


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_from: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``left`` (big, skewed) with ``right`` (small) on ``on``,
    spreading each left key over ``n_salts`` sub-keys.

    ``salt_from``: a left column that is distinct-ish per row (an id);
    the salt is xxhash64-derived from it, so the plan stays deterministic
    (no rand(), reproducible across retries — important because shuffle
    retries with nondeterministic salts can duplicate or drop rows).
    """
    l = left.withColumn("_salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts)).cast("int"))
    salts = left.sparkSession.range(n_salts).select(F.col("id").cast("int").alias("_salt"))
    r = right.crossJoin(F.broadcast(salts))
    out = l.join(r, [on, "_salt"], how)
    return out.drop("_salt")
