"""k-truss: hand-built peel geometry (kernel kept, fringe cascaded)."""

from __future__ import annotations

import pytest

from graph_database_spark.operators.ktruss import edge_support, k_truss


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs], "src long, dst long"
    )


K4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]


def test_k4_is_its_own_4truss(spark):
    out = {
        (r["src"], r["dst"]): r["support"]
        for r in k_truss(_edges(spark, K4), k=4).collect()
    }
    assert out == {(a, b): 2 for a, b in K4}


def test_pendant_triangle_and_bridge_peeled(spark):
    # A triangle hanging off vertex 4 (support 1 each) and a bridge
    # (support 0) must peel away, leaving exactly the K4 kernel.
    g = K4 + [(4, 5), (4, 6), (5, 6), (1, 7)]
    out = {
        (r["src"], r["dst"]) for r in k_truss(_edges(spark, g), k=4).collect()
    }
    assert out == set(K4)


def test_peel_cascades(spark):
    # Vertex 5 closes a triangle with the K4 edge (3,4): edges (3,5)
    # and (4,5) have support 1 and peel in round one; (3,4) keeps
    # support 2 from the kernel and must NOT be dragged out by the
    # cascade re-count.
    g = K4 + [(3, 5), (4, 5)]
    out = {
        (r["src"], r["dst"]): r["support"]
        for r in k_truss(_edges(spark, g), k=4).collect()
    }
    assert out == {(a, b): 2 for a, b in K4}


def test_support_counts_each_triangle_once(spark):
    sup = {
        (r["src"], r["dst"]): r["support"]
        for r in edge_support(_edges(spark, K4)).collect()
    }
    assert sup == {(a, b): 2 for a, b in K4}


def test_k_below_3_raises(spark):
    with pytest.raises(ValueError, match="k >= 3"):
        k_truss(_edges(spark, K4), k=2)
