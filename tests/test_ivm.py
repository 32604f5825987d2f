"""Incremental view maintenance (operators/ivm.py): any base/delta
split of the fact table refreshed through refresh_additive must equal
the full recompute — including chained multi-batch refreshes."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_spark.operators.ivm import additive_agg, refresh_additive
from graph_database_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.001"
SUMS = {"total_cents": "cents"}
KEYS = ["o_orderpriority"]


def _orders(spark):
    return load_table(spark, SF_DIR, "orders").withColumn(
        "cents", F.round(F.col("o_totalprice") * 100, 0).cast("long")
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_single_refresh_matches_full(spark):
    o = _orders(spark)
    full = _rows(additive_agg(o, KEYS, SUMS))
    for cut in ["1993-06-15", "1996-01-01", "1998-12-31"]:
        base = o.where(F.col("o_orderdate") < F.lit(cut))
        delta = o.where(F.col("o_orderdate") >= F.lit(cut))
        state = additive_agg(base, KEYS, SUMS)
        got = _rows(refresh_additive(state, delta, KEYS, SUMS))
        assert got == full, cut


def test_chained_batches_match_full(spark):
    o = _orders(spark)
    full = _rows(additive_agg(o, KEYS, SUMS))
    cuts = ["1993-01-01", "1995-01-01", "1997-01-01"]
    state = additive_agg(o.where(F.col("o_orderdate") < F.lit(cuts[0])), KEYS, SUMS)
    bounds = cuts + ["9999-12-31"]
    for lo, hi in zip(bounds, bounds[1:]):
        delta = o.where(
            (F.col("o_orderdate") >= F.lit(lo)) & (F.col("o_orderdate") < F.lit(hi))
        )
        state = refresh_additive(state, delta, KEYS, SUMS)
    assert _rows(state) == full


def test_empty_delta_is_identity(spark):
    o = _orders(spark)
    state = additive_agg(o, KEYS, SUMS)
    empty = o.where(F.lit(False))
    assert _rows(refresh_additive(state, empty, KEYS, SUMS)) == _rows(state)


def test_new_key_appears(spark):
    o = _orders(spark)
    state = additive_agg(o.where(F.col("o_orderpriority") != "1-URGENT"), KEYS, SUMS)
    delta = o.where(F.col("o_orderpriority") == "1-URGENT")
    got = _rows(refresh_additive(state, delta, KEYS, SUMS))
    assert got == _rows(additive_agg(o, KEYS, SUMS))


def test_hll_refresh_split_invariant_and_idempotent(spark):
    from graph_database_spark.operators.ivm import (
        hll_estimate,
        hll_state,
        refresh_hll,
    )

    ev = load_table(spark, SF_DIR, "events")
    full = _rows(hll_estimate(hll_state(ev, ["event_type"], "user_id"), ["event_type"]))
    base = ev.limit(300)
    delta = ev.subtract(base)
    state = hll_state(base, ["event_type"], "user_id")
    refreshed = refresh_hll(state, delta, ["event_type"], "user_id")
    assert _rows(hll_estimate(refreshed, ["event_type"])) == full
    # idempotent: folding the SAME delta again changes nothing
    twice = refresh_hll(refreshed, delta, ["event_type"], "user_id")
    assert _rows(hll_estimate(twice, ["event_type"])) == full
