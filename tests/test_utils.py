"""Utility-level fixtures: spread row preservation, JS number formatting."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from graph_database_spark.operators.spread import spread
from graph_database_spark.sinks.text import js_num


def test_spread_preserves_rows(spark):
    df = spark.range(1000).coalesce(1)
    assert df.rdd.getNumPartitions() == 1
    out = spread(df)
    assert out.rdd.getNumPartitions() > 1
    assert out.count() == 1000
    assert out.agg(F.sum("id")).first()[0] == 999 * 1000 // 2


def test_spread_noop_when_wide(spark):
    p = spark.sparkContext.defaultParallelism
    df = spark.range(1000).repartition(p)
    assert spread(df) is df  # no extra shuffle injected


def test_js_num_formatting():
    # Golden-file parity depends on these exact behaviors (sinks/text.py).
    assert js_num(1.0) == "1"                      # integral double, no '.0'
    assert js_num(0.9333333333333333) == "0.9333333333333333"
    assert js_num(float("nan")) == "NaN"
    assert js_num(41.830065359477125) == "41.830065359477125"
    assert js_num(7) == "7"
    assert js_num(math.inf) == "Infinity"
