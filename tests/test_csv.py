"""CSV source/sink roundtrip + malformed-record quarantine."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import _parse_datatype_string

from graph_database_spark.sources.csv import read_csv, write_csv
from graph_database_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_csv_roundtrip_customer(spark, tmp_path):
    c = load_table(spark, SF_DIR, "customer")
    path = str(tmp_path / "customer_csv")
    write_csv(c, path, partitions=2)
    back = read_csv(spark, path, c.schema).cache()
    assert back.where(F.col("_corrupt").isNotNull()).count() == 0
    a = {tuple(r) for r in c.collect()}
    b = {tuple(r) for r in back.select(*c.columns).collect()}
    assert a == b


def test_csv_roundtrip_orders_timestamps(spark, tmp_path):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    o = load_table(spark, SF_DIR, "orders")
    path = str(tmp_path / "orders_csv")
    write_csv(o, path, delimiter="\t", partitions=2)
    back = read_csv(spark, path, o.schema, delimiter="\t").cache()
    assert back.where(F.col("_corrupt").isNotNull()).count() == 0
    assert back.count() == o.count()
    got = {r["o_orderkey"]: r["o_orderdate"] for r in back.collect()}
    want = {r["o_orderkey"]: r["o_orderdate"] for r in o.collect()}
    assert got == want


def test_csv_quarantines_malformed(spark, tmp_path):
    p = tmp_path / "mixed.csv"
    p.write_text("id,qty\n1,10\nnot,a,number,row\n2,20\n")
    schema = _parse_datatype_string("id long, qty long")
    back = read_csv(spark, str(p), schema).cache()
    good = back.where(F.col("_corrupt").isNull())
    bad = back.where(F.col("_corrupt").isNotNull())
    assert {(r["id"], r["qty"]) for r in good.collect()} == {(1, 10), (2, 20)}
    assert bad.count() == 1
