"""Motif finder: cross-checked against the oracle-verified triangle and
degree operators on the derived co-purchase graph, plus a hand graph."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_database_spark.operators.graph import triangle_count
from graph_database_spark.operators.motif import find_motif

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def hand_edges(spark):
    # Triangle 1-2-3 plus a pendant 3-4: 1 triangle, wedges at 3.
    return spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "src long, dst long"
    ).cache()


def test_triangle_motif_matches_triangle_count(spark, hand_edges):
    tri = find_motif(hand_edges, "a-b; b-c; a-c")
    # Ordered bindings: each triangle appears 3! = 6 times.
    assert tri.count() == 6 * triangle_count(hand_edges).first()["n_triangles"]


def test_open_wedge_negation(spark, hand_edges):
    wedges = find_motif(hand_edges, "a-b; b-c")
    open_wedges = find_motif(hand_edges, "a-b; b-c; !a-c")
    closed = wedges.count() - open_wedges.count()
    # Closed ordered wedges = 6 per triangle.
    assert closed == 6
    # Open ordered wedges through vertex 3: centers 3 with (1,4),(2,4) ±order = 4;
    # plus centers 1,2? 1's neighbors {2,3} are adjacent (closed). So 4.
    assert open_wedges.count() == 4


def test_path3_chain(spark, hand_edges):
    # Ordered simple 3-paths a-b-c-d with all-distinct vertices.
    p3 = find_motif(hand_edges, "a-b; b-c; c-d")
    rows = {tuple(r) for r in p3.collect()}
    # Hand enumeration: paths 1-2-3-4, 2-1-3-4, 4-3-1-2, 4-3-2-1.
    assert rows == {(1, 2, 3, 4), (2, 1, 3, 4), (4, 3, 1, 2), (4, 3, 2, 1)}


def test_triangle_motif_on_copurchase_graph(spark):
    from graph_database_spark.plans.copurchase import copurchase_edges

    edges = copurchase_edges(spark, SF_DIR).localCheckpoint()
    got = find_motif(edges, "a-b; b-c; a-c").count()
    want = 6 * triangle_count(edges).first()["n_triangles"]
    assert got == want


def test_bad_patterns_raise(spark, hand_edges):
    with pytest.raises(ValueError, match="self-loop"):
        find_motif(hand_edges, "a-a")
    with pytest.raises(ValueError, match="disconnected"):
        find_motif(hand_edges, "a-b; c-d")
    with pytest.raises(ValueError, match="bound first"):
        find_motif(hand_edges, "a-b; !b-c")
