"""Streaming drift monitor (streaming/drift.py): the maintained
histogram equals the one-shot batch histogram, self-KS is zero, and a
shifted reference produces positive drift."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_spark.sources.parquet import load_table
from graph_database_spark.streaming.drift import (
    histogram_of,
    histogram_stream,
    ks_readout,
)
from graph_database_spark.streaming.events import read_events_stream

SF_DIR = "/root/testdata/sf0.001"
WIDTH = 20  # value in [0, ~1000) -> cents-scale bins


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _value_col():
    return "CAST(round(value * 100) AS BIGINT)"


def test_stream_histogram_matches_batch_and_self_ks_is_zero(
    spark, tmp_path
):
    stream = read_events_stream(spark, SF_DIR).select(
        F.expr(_value_col()).alias("v")
    )
    q = histogram_stream(
        stream, str(tmp_path / "h"), "v", WIDTH, str(tmp_path / "ck")
    )
    q.processAllAvailable()
    q.stop()
    ev = load_table(spark, SF_DIR, "events").select(
        F.expr(_value_col()).alias("v")
    )
    ref = histogram_of(ev, "v", WIDTH)
    from graph_database_spark.sinks.versioned import read_version

    got = _rows(read_version(spark, str(tmp_path / "h")))
    want = _rows(ref)
    assert got == want
    ks = ks_readout(spark, str(tmp_path / "h"), ref).collect()[0]
    assert ks["d_num"] == 0 and ks["ks_micro"] == 0


def test_shifted_reference_shows_drift(spark, tmp_path):
    stream = read_events_stream(spark, SF_DIR).select(
        F.expr(_value_col()).alias("v")
    )
    q = histogram_stream(
        stream, str(tmp_path / "h2"), "v", WIDTH, str(tmp_path / "ck2")
    )
    q.processAllAvailable()
    q.stop()
    ev = load_table(spark, SF_DIR, "events").select(
        (F.expr(_value_col()) + 200).alias("v")  # shift 10 bins
    )
    shifted = histogram_of(ev, "v", WIDTH)
    ks = ks_readout(spark, str(tmp_path / "h2"), shifted).collect()[0]
    assert ks["d_num"] > 0 and ks["ks_micro"] > 0
    # both sides saw the same row count
    assert ks["n1"] == ks["n2"]
