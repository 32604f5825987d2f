"""Skew-guarded blocked self-join (operators/linkage.py): the grid
decomposition must produce the byte-identical pair set as the plain
self-join, and spread a hot block over many composite keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_spark.operators.linkage import block_self_pairs


def _names(spark):
    rows = [(f"alpha {i:03d} widget", "widget") for i in range(12)]
    rows += [(f"beta {i} gizmo", "gizmo") for i in range(3)]
    rows += [("solo thing", "thing")]
    return spark.createDataFrame(rows, "name string, blk string")


def _pairs(df):
    return sorted(
        (r["a"]["name"], r["b"]["name"]) for r in df.collect()
    )


def test_grid_path_matches_plain_path(spark):
    names = _names(spark)
    plain = _pairs(block_self_pairs(names, "blk", "name", hot_threshold=10**9))
    # threshold 4 forces the 12-row block through the grid; 3 groups do
    # not divide it evenly, exercising ragged cells.
    grid = _pairs(
        block_self_pairs(names, "blk", "name", hot_threshold=4, n_groups=3)
    )
    assert grid == plain
    # hand-check: 12C2 + 3C2 + 0 pairs
    assert len(plain) == 66 + 3


def test_all_blocks_hot_still_exact(spark):
    names = _names(spark)
    grid = _pairs(
        block_self_pairs(names, "blk", "name", hot_threshold=0, n_groups=4)
    )
    plain = _pairs(block_self_pairs(names, "blk", "name", hot_threshold=10**9))
    assert grid == plain


def test_hot_block_spreads_over_composite_keys(spark):
    # The pair space of the hot block must be keyed by (blk, ga, gb) —
    # count the distinct grid cells actually populated.
    names = _names(spark)
    cols = names.columns
    sizes = names.groupBy("blk").agg(F.count("*").alias("_bn"))
    hot = (
        names.join(sizes, "blk")
        .where(F.col("_bn") > 4)
        .select("blk", F.struct(*cols).alias("s"))
    )
    grp = F.pmod(F.xxhash64(F.col("s")["name"].cast("string")), F.lit(3)).cast("int")
    cells = hot.select(grp.alias("g")).distinct().count()
    assert cells >= 2  # the 12 rows hash into >=2 of 3 groups
