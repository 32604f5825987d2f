"""ORC source/sink: roundtrip, partition pruning, schema contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import _parse_datatype_string

from graph_database_spark.sources.orc import read_orc, write_orc
from graph_database_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_orc_roundtrip_customer(spark, tmp_path):
    c = load_table(spark, SF_DIR, "customer")
    path = str(tmp_path / "customer_orc")
    write_orc(c, path, partitions=2)
    back = read_orc(spark, path, c.schema)
    assert back.schema == c.schema
    a = {tuple(r) for r in c.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b


def test_orc_partitioned_layout_prunes(spark, tmp_path):
    c = load_table(spark, SF_DIR, "customer")
    path = str(tmp_path / "customer_by_seg")
    write_orc(c, path, partition_by=["c_mktsegment"])
    back = spark.read.orc(path).where(F.col("c_mktsegment") == "BUILDING")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # Directory-level pruning: the segment filter must appear as a
    # partition filter on the scan, not a post-scan row filter.
    assert "PartitionFilters" in plan and "c_mktsegment" in plan.split("PartitionFilters")[1][:200]
    want = c.where(F.col("c_mktsegment") == "BUILDING").count()
    assert back.count() == want


def test_orc_schema_prunes_and_casts(spark, tmp_path):
    c = load_table(spark, SF_DIR, "customer")
    path = str(tmp_path / "customer_full")
    write_orc(c, path, partitions=1)
    narrow = _parse_datatype_string("c_custkey int, c_name string")
    back = read_orc(spark, path, narrow)
    assert [f.name for f in back.schema.fields] == ["c_custkey", "c_name"]
    assert dict(back.dtypes)["c_custkey"] == "int"
    assert back.count() == c.count()


def test_orc_missing_column_is_hard_error(spark, tmp_path):
    c = load_table(spark, SF_DIR, "customer")
    path = str(tmp_path / "customer_err")
    write_orc(c, path, partitions=1)
    with pytest.raises(ValueError, match="no_such_col"):
        read_orc(spark, path, _parse_datatype_string("no_such_col string"))
