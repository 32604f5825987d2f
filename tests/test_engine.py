"""SQL entry point: views over driver tables + derived graph."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_spark.engine import register_tables, sql
from graph_database_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_register_exposes_all_tables(spark):
    names = register_tables(spark, SF_DIR)
    assert "lineitem" in names and "edges" in names
    for n in names:
        assert spark.table(n).columns  # resolvable view


def test_sql_matches_dataframe_result(spark):
    got = sql(
        spark,
        SF_DIR,
        """
        SELECT o.o_orderpriority, count(*) AS n
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = 'BUILDING'
        GROUP BY o.o_orderpriority
        """,
    )
    o = load_table(spark, SF_DIR, "orders")
    c = load_table(spark, SF_DIR, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    want = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}


def test_sql_graph_view_is_canonical(spark):
    e = sql(spark, SF_DIR, "SELECT count(*) AS bad FROM edges WHERE src >= dst")
    assert e.first()["bad"] == 0


def test_sql_pushdown_reaches_scan(spark):
    register_tables(spark, SF_DIR)
    df = spark.sql("SELECT l_orderkey FROM lineitem WHERE l_quantity > 49")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "l_quantity" in plan.split("PushedFilters")[1][:300]


def test_plan_audit_shapes(spark):
    from graph_database_spark import catalog, engine

    a = engine.plan_audit(catalog.QUERIES["banded_revenue"](spark, SF_DIR))
    assert a["exchanges"] == 1          # single-partition final agg only
    assert not a["has_cartesian"]
    assert len(a["scans"]) == 1 and "l_discount" in a["scans"][0]
    assert any("l_shipdate" in p for p in a["pushed_filters"])
