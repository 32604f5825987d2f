"""Maximal matching (operators/matching.py): matching + maximality
invariants on the sf0.001 co-purchase graph."""

from __future__ import annotations

from graph_database_spark.catalog import _edges
from graph_database_spark.operators.matching import greedy_matching


def test_matching_is_maximal(spark):
    edges = _edges(spark, "/root/testdata/sf0.001").cache()
    got = greedy_matching(edges).collect()
    assert got
    # matching: no vertex appears twice
    verts = [v for r in got for v in (r["src"], r["dst"])]
    assert len(verts) == len(set(verts))
    # maximal: every remaining edge touches a matched vertex
    matched = set(verts)
    leftover = [
        (r["src"], r["dst"])
        for r in edges.collect()
        if r["src"] not in matched and r["dst"] not in matched
    ]
    assert leftover == []
    assert max(r["round"] for r in got) <= 16
