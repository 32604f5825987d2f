"""Differentially-private releases: Laplace-noised counts and clipped
sums — the privacy layer a training-data pipeline puts in front of any
per-group statistic it publishes (Dwork et al.'s eps-DP: noise scale =
sensitivity / eps; count sensitivity 1, a sum clipped to [0, C] has
sensitivity C).

md5-twin determinism: the Laplace draw uses the inverse-CDF transform
``lap = -b * sign(u - 1/2) * ln(1 - 2|u - 1/2|)`` over a uniform u
derived from the seed-prefixed md5 of the GROUP KEY — deterministic,
retry-stable, and SQL-expressible, so the whole release is
hash-verified cross-engine (the repo's standard strategy: verify the
MACHINERY on a deterministic hash family; a production deployment swaps
the md5 for a CSPRNG draw, changing one expression). The ln lands in
integer micro-units per the micro-unit rule (CLAUDE.md); everything
else is integer or exactly-specified IEEE.

The released frame carries ONLY noised values — emitting true counts
next to noised ones would defeat the release's purpose.

The reference has no privacy surface (src/main.js); this extends the
mandated LLM-pipeline hygiene family (pii_scan is detection; this is
release).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from graph_database_spark.operators.sketches import md5_hash60

__all__ = ["laplace_micro", "dp_count", "dp_sum_cents"]

_SPAN60 = float(2**60)
_FLOOR = 2.0**-60  # ln-argument floor: u exactly 0 or 1 would hit ln(0)


def laplace_micro(key: Column, scale: float, salt: str) -> Column:
    """Integer-micro Laplace(scale) draw, keyed deterministically on
    (salt, key): inverse-CDF over the md5-60 uniform."""
    u = md5_hash60(F.concat_ws("|", F.lit(salt), key.cast("string"))).cast(
        "double"
    ) / F.lit(_SPAN60)
    x = u - F.lit(0.5)
    lap = (
        F.lit(-scale)
        * F.signum(x)
        * F.log(F.greatest(F.lit(1.0) - F.lit(2.0) * F.abs(x), F.lit(_FLOOR)))
    )
    return F.round(lap * F.lit(1_000_000.0), 0).cast("long")


def dp_count(
    df: DataFrame, keys: list[str], epsilon: float = 1.0, salt: str = "dpc"
) -> DataFrame:
    """``(keys..., n_noisy_micro)`` — eps-DP group counts in integer
    micro-units (count sensitivity 1 => scale 1/eps)."""
    key = F.concat_ws("|", *[F.col(k).cast("string") for k in keys])
    return (
        df.groupBy(*keys)
        .agg(F.count("*").alias("_n"))
        .select(
            *keys,
            (F.col("_n") * 1_000_000 + laplace_micro(key, 1.0 / epsilon, salt))
            .alias("n_noisy_micro"),
        )
    )


def dp_sum_cents(
    df: DataFrame,
    keys: list[str],
    cents_col: str,
    clip_cents: int,
    epsilon: float = 1.0,
    salt: str = "dps",
) -> DataFrame:
    """``(keys..., sum_noisy_cents_micro)`` — eps-DP group sums of a
    per-row integer-cents contribution clipped to [0, clip_cents]
    (sensitivity clip_cents => scale clip_cents/eps). The clipped sum
    is an integer (partition-order-exact, the prerequisite for an exact
    noise add)."""
    key = F.concat_ws("|", *[F.col(k).cast("string") for k in keys])
    clipped = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col(cents_col).cast("long"), F.lit(int(clip_cents))),
    )
    return (
        df.groupBy(*keys)
        .agg(F.sum(clipped).alias("_s"))
        .select(
            *keys,
            (
                F.col("_s") * 1_000_000
                + laplace_micro(key, clip_cents / epsilon, salt)
            ).alias("sum_noisy_cents_micro"),
        )
    )
