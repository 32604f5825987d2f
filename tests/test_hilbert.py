"""Hilbert layout key: reference-replay equality + the adjacency
property that distinguishes Hilbert from Z-order (consecutive curve
positions are Manhattan-adjacent — Morton violates this at every
quadrant seam, which is exactly why Hilbert buckets have tighter
per-dimension spans)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_spark.operators.layout import (
    hilbert_expr_spark,
    hilbert_stats,
)


def xy2d(bits: int, x: int, y: int) -> int:
    # Public-domain per-bit quadrant walk (the algorithm the SQL fold
    # mirrors), kept independent of the generated expression.
    n1 = (1 << bits) - 1
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n1 - x
                y = n1 - y
            x, y = y, x
        s //= 2
    return d


def _grid(spark, bits):
    n = 1 << bits
    rows = [(x, y) for x in range(n) for y in range(n)]
    return spark.createDataFrame(rows, "x long, y long")


def test_hilbert_matches_reference_walk(spark):
    bits = 5
    got = (
        _grid(spark, bits)
        .select(
            "x",
            "y",
            F.expr(hilbert_expr_spark("x", "y", bits)).alias("d"),
        )
        .collect()
    )
    for r in got:
        assert r["d"] == xy2d(bits, r["x"], r["y"]), (r["x"], r["y"])


def test_hilbert_is_a_manhattan_adjacent_tour(spark):
    bits = 5
    n = 1 << bits
    got = (
        _grid(spark, bits)
        .select(
            "x",
            "y",
            F.expr(hilbert_expr_spark("x", "y", bits)).alias("d"),
        )
        .collect()
    )
    by_d = sorted(got, key=lambda r: r["d"])
    # A bijection onto [0, 4^bits) ...
    assert [r["d"] for r in by_d] == list(range(n * n))
    # ... where every step moves to a 4-neighborhood cell.
    for a, b in zip(by_d, by_d[1:]):
        assert abs(a["x"] - b["x"]) + abs(a["y"] - b["y"]) == 1, (
            a,
            b,
        )


def test_hilbert_buckets_tighter_than_naive_rowmajor(spark):
    # Locality evidence at test scale: per-64-cell Hilbert buckets on a
    # 32x32 grid must span at most 16 in each dimension (true Hilbert
    # buckets are ~8x8 tiles), where row-major buckets span the full
    # 32 on x.
    bits = 5
    stats = hilbert_stats(
        _grid(spark, bits), "x", "y", bits=bits, bucket_shift=6
    ).collect()
    assert len(stats) == 16
    for r in stats:
        assert r["n_rows"] == 64
        assert r["x_span"] <= 15 and r["y_span"] <= 15, r
