"""Bipartite one-mode projection (operators/bipartite.py).

The hot-group grid decomposition must count every co-occurrence exactly
once — pinned by comparing against the unguarded plain self-join on a
frame whose hottest group exceeds the threshold.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_spark.operators.bipartite import project_counts


def _plain(df, group_col, item_col, min_count=1):
    a = df.select(group_col, F.col(item_col).alias("item_a"))
    b = df.select(group_col, F.col(item_col).alias("item_b"))
    out = (
        a.join(b, group_col)
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("co"))
    )
    return out.where(F.col("co") >= min_count) if min_count > 1 else out


def _synthetic(spark):
    # group g0: 60 items (hot under threshold 16); g1..g9: overlapping
    # small baskets so co-counts exceed 1 for some pairs.
    rows = [(0, i) for i in range(60)]
    for g in range(1, 10):
        rows += [(g, i) for i in range(g, g + 5)]
    return spark.createDataFrame(rows, "g long, item long")


def test_grid_matches_plain(spark):
    df = _synthetic(spark)
    got = sorted(
        project_counts(df, "g", "item", hot_threshold=16, n_groups=4)
        .collect(),
        key=lambda r: (r["item_a"], r["item_b"]),
    )
    want = sorted(
        _plain(df, "g", "item").collect(),
        key=lambda r: (r["item_a"], r["item_b"]),
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    # sanity: the hot group really took the grid path
    assert len(got) >= 60 * 59 // 2


def test_min_count_cut(spark):
    df = _synthetic(spark)
    got = {
        (r["item_a"], r["item_b"]): r["co"]
        for r in project_counts(
            df, "g", "item", hot_threshold=16, n_groups=4, min_count=2
        ).collect()
    }
    want = {
        (r["item_a"], r["item_b"]): r["co"]
        for r in _plain(df, "g", "item", min_count=2).collect()
    }
    assert got == want
    assert got  # the overlapping small baskets produce co >= 2 pairs
    assert all(v >= 2 for v in got.values())


def test_all_cold_path(spark):
    # threshold above every group size: grid path empty, plain result
    df = _synthetic(spark)
    got = sorted(
        project_counts(df, "g", "item", hot_threshold=1000).collect(),
        key=lambda r: (r["item_a"], r["item_b"]),
    )
    want = sorted(
        _plain(df, "g", "item").collect(),
        key=lambda r: (r["item_a"], r["item_b"]),
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_weighted_combines_match_plain(spark):
    import pyspark.sql.functions as SF

    rows = [(g, i, (g * 7 + i * 3) % 5 + 1) for g in range(6) for i in range(g, g + 8)]
    df = spark.createDataFrame(rows, "g long, item long, w long")

    def plain(agg):
        a = df.select("g", SF.col("item").alias("item_a"), SF.col("w").alias("_wa"))
        b = df.select("g", SF.col("item").alias("item_b"), SF.col("w").alias("_wb"))
        return {
            (r["item_a"], r["item_b"]): r["co"]
            for r in a.join(b, "g")
            .where(SF.col("item_a") < SF.col("item_b"))
            .groupBy("item_a", "item_b")
            .agg(agg.alias("co"))
            .collect()
        }

    for combine, agg in [
        ("least", SF.sum(SF.least("_wa", "_wb"))),
        ("product", SF.sum(SF.col("_wa") * SF.col("_wb"))),
    ]:
        got = {
            (r["item_a"], r["item_b"]): r["co"]
            for r in project_counts(
                df, "g", "item", hot_threshold=4, n_groups=3,
                weight_col="w", combine=combine,
            ).collect()
        }
        assert got == plain(agg), combine


def test_custom_out_cols(spark):
    df = _synthetic(spark)
    out = project_counts(df, "g", "item", out_cols=("pa", "pb", "n_shared"))
    assert out.columns == ["pa", "pb", "n_shared"]
