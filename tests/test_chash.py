"""Consistent-hash ring: successor correctness vs a Python replay and
the minimal-movement property of the rebalance matrix."""

from __future__ import annotations

import bisect

from pyspark.sql import functions as F

from graph_database_spark.operators.chash import (
    _pos,
    build_ring,
    rebalance_matrix,
)


def py_assign(ring, kp):
    positions = [p for p, _ in ring]
    i = bisect.bisect_right(positions, kp)
    return ring[i % len(ring)][1]


def test_rebalance_matrix_matches_python_and_moves_minimally(spark):
    docs = spark.range(500).select(F.col("id").alias("doc_id"))
    n_before, n_after = 5, 6
    out = rebalance_matrix(docs, n_before, n_after).collect()
    assert sum(r["n_docs"] for r in out) == 500

    ra, rb = build_ring(n_before), build_ring(n_after)
    expect = {}
    for i in range(500):
        kp = _pos(str(i))
        key = (py_assign(ra, kp), py_assign(rb, kp))
        expect[key] = expect.get(key, 0) + 1
    got = {(r["node_before"], r["node_after"]): r["n_docs"] for r in out}
    assert got == expect

    # Minimal movement: a doc either stays put or moves TO the new node.
    for nb, na in got:
        assert na == nb or na == n_after - 1, (nb, na)
    moved = sum(n for (nb, na), n in got.items() if nb != na)
    # The new node owns ~1/(N+1) of the keys; allow generous slack.
    assert moved < 500 * 2 / (n_after)
