"""Bitmap-index set algebra: hand-computed pair cardinalities."""

from __future__ import annotations

from graph_database_spark.operators.bitmapindex import (
    bitmap_index,
    bitmap_pair_stats,
)


def test_bitmap_pair_stats_exact(spark):
    rows = (
        [("A", i) for i in (0, 1, 31, 62)]
        + [("B", i) for i in (1, 31, 100)]
        + [("C", 5)]
        + [("A", 1)]  # duplicate membership must not double-count
    )
    df = spark.createDataFrame(rows, "k string, uid long")
    bm = bitmap_index(df, "k", "uid")
    # id 31 lands in word 1 bit 0; id 62 in word 2 bit 0.
    words = {(r["key"], r["word"]): r["mask"] for r in bm.collect()}
    assert words[("A", 0)] == (1 << 0) | (1 << 1)
    assert words[("A", 1)] == 1 << 0
    assert words[("A", 2)] == 1 << 0
    out = {
        (r["type_a"], r["type_b"]): r.asDict()
        for r in bitmap_pair_stats(bm).collect()
    }
    ab = out[("A", "B")]
    assert (ab["n_a"], ab["n_b"], ab["n_and"], ab["n_or"]) == (4, 3, 2, 5)
    assert ab["jaccard_ppm"] == 2 * 1000000 // 5
    ac = out[("A", "C")]
    assert (ac["n_and"], ac["n_or"], ac["jaccard_ppm"]) == (0, 5, 0)
    assert out[("B", "C")]["n_and"] == 0
    assert len(out) == 3
