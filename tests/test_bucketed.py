"""Co-located bucketed join: correct results and NO shuffle in the plan."""

from __future__ import annotations

from graph_database_spark.sources.bucketed import bucketed_join, write_bucketed
from graph_database_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_bucketed_join_is_shuffle_free_and_correct(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    lineitem = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey")
    li = lineitem.withColumnRenamed("l_orderkey", "o_orderkey")

    write_bucketed(orders, "orders_b", str(tmp_path / "orders_b"), "o_orderkey", 8)
    write_bucketed(li, "lineitem_b", str(tmp_path / "lineitem_b"), "o_orderkey", 8)
    try:
        joined = bucketed_join(spark, "orders_b", "lineitem_b", "o_orderkey")
        # Exact same rows as the plain (shuffling) join.
        plain = orders.join(li, "o_orderkey")
        assert joined.count() == plain.count()
        assert joined.subtract(plain).isEmpty() and plain.subtract(joined).isEmpty()

        plan = joined._jdf.queryExecution().executedPlan().toString()
        # Disable broadcast to force the merge-join path for the plan check.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = bucketed_join(spark, "orders_b", "lineitem_b", "o_orderkey")._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan[:2000]
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
