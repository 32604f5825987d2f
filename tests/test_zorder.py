"""Z-order writer: key correctness + measured 2-D locality win."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_spark.sinks.zorder import (
    file_extents,
    with_zorder_key,
    write_zordered,
)


def morton2(x: int, y: int, bits: int) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zkey_matches_reference_interleave(spark):
    # 4-bit grid covering every (x, y) in [0,16)^2: ranks are the values
    # themselves, so the key must equal the textbook Morton number.
    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = with_zorder_key(df, ["x", "y"], bits=4).collect()
    for r in got:
        assert r["__zkey"] == morton2(r["x"], r["y"], 4), (r["x"], r["y"])


def test_zkey_rejects_overflow(spark):
    df = spark.createDataFrame([(1, 1)], "x long, y long")
    try:
        with_zorder_key(df, ["x", "y"], bits=32)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def _mean_bbox_area(spark, path):
    ext = file_extents(spark, path, ["x", "y"]).collect()
    areas = [
        (r["max_x"] - r["min_x"] + 1) * (r["max_y"] - r["min_y"] + 1) for r in ext
    ]
    return sum(areas) / len(areas), len(ext)


def test_zorder_locality_beats_linear_sort(spark, tmp_path):
    # 64x64 uniform grid into 16 files. A 1-D sort on x gives each file
    # a 4x64 stripe (area 256); Z-order gives ~16x16 tiles (area ~256?
    # no: 4096/16 = 256 rows/file in a near-square => area ~256 but
    # BOTH dims bounded ~16-32, so a 2-D predicate touches ~1-4 files
    # instead of all 16). Assert the max per-file extent of y shrinks
    # by >= 2x and mean bbox area does not regress.
    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "x long, y long")

    z_path = str(tmp_path / "zorder")
    lin_path = str(tmp_path / "linear")
    write_zordered(df, z_path, ["x", "y"], bits=6, num_files=16)
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(lin_path)
    )

    z_ext = file_extents(spark, z_path, ["x", "y"]).collect()
    lin_ext = file_extents(spark, lin_path, ["x", "y"]).collect()
    assert len(z_ext) >= 8 and len(lin_ext) >= 8

    z_worst_y = max(r["max_y"] - r["min_y"] for r in z_ext)
    lin_worst_y = max(r["max_y"] - r["min_y"] for r in lin_ext)
    # Linear layout: every file spans the full y range (63).
    assert lin_worst_y == 63
    assert z_worst_y <= 31, z_worst_y

    # 2-D range predicate selectivity: files whose bbox intersects a
    # 8x8 query window — the row-group-skipping proxy.
    def touched(ext):
        return sum(
            1
            for r in ext
            if r["min_x"] <= 24 and r["max_x"] >= 17 and r["min_y"] <= 24 and r["max_y"] >= 17
        )

    assert touched(z_ext) < touched(lin_ext), (touched(z_ext), touched(lin_ext))
