"""Layout planning operators: Morton parity, bucket-span invariant,
range-partition balance."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_spark.operators.layout import (
    morton_expr_spark,
    range_partition_plan,
    zorder_stats,
)


def morton2(x: int, y: int, bits: int = 10) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_morton_expr_matches_reference(spark):
    rows = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, "zx long, zy long")
    got = df.withColumn(
        "z", F.expr(morton_expr_spark("zx", "zy")).cast("long")
    ).collect()
    for r in got:
        assert r["z"] == morton2(r["zx"], r["zy"]), (r["zx"], r["zy"])


def test_zorder_bucket_spans_bounded(spark):
    # Dropping the low 10 Morton bits fixes the top 5 bits of each
    # dimension, so inside one z_bucket each dim varies over at most
    # its low 5 bits: span <= 31. That bound IS the pruning property.
    rows = [(x * 7 % 1024, x * 13 % 1024) for x in range(5000)]
    df = spark.createDataFrame(rows, "zx long, zy long")
    stats = zorder_stats(df, "zx", "zy").collect()
    assert sum(r["n_rows"] for r in stats) == 5000
    for r in stats:
        assert 0 <= r["x_span"] <= 31, r
        assert 0 <= r["y_span"] <= 31, r


def test_range_partition_plan_balanced(spark):
    n, nb = 1001, 8
    df = spark.range(n).select(
        (F.col("id") * 37 % 500).alias("v"), F.col("id").alias("k")
    )
    plan = {r["bucket"]: r.asDict() for r in range_partition_plan(df, "v", "k", nb).collect()}
    assert len(plan) == nb
    assert sum(r["n_rows"] for r in plan.values()) == n
    # Balanced within one row.
    sizes = [r["n_rows"] for r in plan.values()]
    assert max(sizes) - min(sizes) <= 1
    # Upper bounds are nondecreasing in (value, key) order.
    bounds = [(plan[b]["hi_value"], plan[b]["hi_key"]) for b in sorted(plan)]
    assert bounds == sorted(bounds)
    # The last boundary is the global maximum of the total order.
    top = df.select(F.max(F.struct("v", "k")).alias("m")).first()["m"]
    assert bounds[-1] == (top["v"], top["k"])


def ffd_reference(sizes, cap_mult=2):
    files = sorted(((s, i) for i, s in enumerate(sizes)), key=lambda t: (-t[0], t[1]))
    cap = cap_mult * max(s for s, _ in files)
    bins, asg = [], {}
    for s, fid in files:
        for i, b in enumerate(bins):
            if b + s <= cap:
                bins[i] += s
                asg[fid] = i + 1
                break
        else:
            bins.append(s)
            asg[fid] = len(bins)
    return cap, bins, asg


def test_compaction_plan_matches_python_ffd(spark):
    from graph_database_spark.operators.layout import compaction_plan

    sizes = [9, 7, 6, 5, 4, 3, 2, 9, 1, 8, 8, 8, 2, 2, 2]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sizes)], "fid long, s long"
    )
    cap, bins, asg = ffd_reference(sizes)
    got = {r["file_id"]: r for r in compaction_plan(df, "fid", "s").collect()}
    assert len(got) == len(sizes)
    for fid, r in got.items():
        assert r["bin"] == asg[fid], (fid, r["bin"], asg[fid])
        assert r["size_bytes"] == sizes[fid]
    # No bin exceeds capacity and loads match the reference packing.
    loads = {}
    for r in got.values():
        loads[r["bin"]] = loads.get(r["bin"], 0) + r["size_bytes"]
    assert all(v <= cap for v in loads.values())
    assert sorted(loads.values()) == sorted(bins)
