"""2-D skyline (catalog.q_parts_skyline): the window formulation must
equal the O(n^2) dominance definition."""

from __future__ import annotations

from graph_database_spark.catalog import q_parts_skyline
from graph_database_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_skyline_equals_dominance_definition(spark):
    pts = [
        (r["p_partkey"], float(r["p_retailprice"]), int(r["p_size"]))
        for r in load_table(spark, SF_DIR, "part")
        .select("p_partkey", "p_retailprice", "p_size")
        .collect()
    ]

    def dominated(b):
        return any(
            a[1] <= b[1] and a[2] <= b[2] and (a[1] < b[1] or a[2] < b[2])
            for a in pts
            if a[0] != b[0]
        )

    want = sorted(k for k, _, _ in (p for p in pts if not dominated(p)))
    got = sorted(r["p_partkey"] for r in q_parts_skyline(spark, SF_DIR).collect())
    assert got == want
    assert got
