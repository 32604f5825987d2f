"""Population Stability Index — the production feature-drift metric.

PSI between a reference and a comparison window is THE number model
monitoring dashboards page on: bin the reference into deciles, compare
the two windows' bin occupancies, sum (pA - pB) * ln(pA / pB). Here the
windows are the first and second half of each event type's time-ordered
value stream (ntile(2) over (ts, event_id) — identical semantics in
Spark and DuckDB), so the catalog query needs no external config.

Cross-engine exactness, per the CLAUDE.md float rules:

- values snap to integer micro-units once; decile EDGES are exact
  order statistics of the reference half (value at rank
  ``(nA*k + 9) // 10`` — the value is deterministic under ties even
  though row numbers are not, the events_anomaly_mad argument);
- bin assignment is ``1 + count(edges < value)`` via a broadcast join
  against the 9-edge frame — integer comparisons only;
- occupancies get Laplace smoothing ``(cnt + 1) / (total + 10)`` so
  empty bins stay finite without an epsilon constant;
- each bin's ln-term is snapped to micro BEFORE the per-type sum
  (libm ln is the one last-ulp-risky ingredient; 10 bounded terms per
  type, the link_scores aa_unit precedent).

Scale posture: two window passes per type (split + edge ranks over the
reference half), one broadcast bin join, map-side-combinable counts —
a per-key shuffle pipeline, nothing quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["psi_drift"]


def psi_drift(events: DataFrame, bins: int = 10) -> DataFrame:
    """``(event_type, n_a, n_b, psi_micro)`` — PSI between the first
    and second half of each event type's value stream, in integer
    micro-units (PSI > 0.2 ~ psi_micro > 200000 is the classic
    retrain-alarm threshold)."""
    ev = events.where(F.col("value").isNotNull()).select(
        "event_type",
        "event_id",
        "ts",
        F.round(F.col("value") * F.lit(1000000.0), 0).cast("long").alias("xm"),
    )
    wt = Window.partitionBy("event_type").orderBy("ts", "event_id")
    halves = ev.withColumn("half", F.ntile(2).over(wt)).localCheckpoint()

    ref = halves.where(F.col("half") == 1)
    wv = Window.partitionBy("event_type").orderBy("xm")
    ranked = ref.withColumn("rn", F.row_number().over(wv)).join(
        F.broadcast(
            ref.groupBy("event_type").agg(F.count("*").alias("n_ref"))
        ),
        "event_type",
    )
    # decile-edge rank: (n*k + bins-1) div bins — pure integer, floor
    # semantics agree cross-engine on positive operands
    edges = (
        ranked.selectExpr("event_type", "rn", "xm", "n_ref")
        .join(
            F.broadcast(
                halves.sparkSession.range(1, bins).select(
                    F.col("id").cast("int").alias("k")
                )
            )
        )
        .where(
            F.col("rn")
            == F.expr(f"(n_ref * k + {bins - 1}) div {bins}").cast("int")
        )
        .select("event_type", "k", F.col("xm").alias("edge"))
        .localCheckpoint()
    )

    binned = (
        halves.join(F.broadcast(edges), "event_type")
        .groupBy("event_type", "event_id", "half")
        .agg(
            (
                F.lit(1) + F.sum((F.col("edge") < F.col("xm")).cast("int"))
            ).alias("bin")
        )
    )
    grid = (
        halves.select("event_type")
        .distinct()
        .crossJoin(
            F.broadcast(
                halves.sparkSession.range(1, bins + 1).select(
                    F.col("id").cast("int").alias("bin")
                )
            )
        )
    )
    counts = (
        grid.join(
            binned.groupBy("event_type", "bin").agg(
                F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("ca"),
                F.sum(F.when(F.col("half") == 2, 1).otherwise(0)).alias("cb"),
            ),
            ["event_type", "bin"],
            "left",
        )
        .select(
            "event_type",
            "bin",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    totals = halves.groupBy("event_type").agg(
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("half") == 2, 1).otherwise(0)).alias("n_b"),
    )
    pa = (F.col("ca") + 1).cast("double") / (F.col("n_a") + bins).cast("double")
    pb = (F.col("cb") + 1).cast("double") / (F.col("n_b") + bins).cast("double")
    term = F.round((pa - pb) * F.log(pa / pb) * F.lit(1000000.0), 0).cast("long")
    return (
        counts.join(F.broadcast(totals), "event_type")
        .select("event_type", "n_a", "n_b", term.alias("t"))
        .groupBy("event_type")
        .agg(
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
            F.sum("t").alias("psi_micro"),
        )
    )
