"""DBSCAN: hand geometry — two separated dense squares, one border
point reachable from exactly one core, one isolated noise point."""

from __future__ import annotations

from graph_database_spark.operators.dbscan import dbscan_grid

POINTS = [
    # cluster A: unit square, every point core at eps=2/min_pts=3
    (1, 0, 0), (2, 1, 0), (3, 0, 1), (4, 1, 1),
    # border: within eps of core 2 only (dist^2 to (1,0) = 4 = eps^2)
    (5, 3, 0),
    # noise
    (6, 10, 10),
    # cluster B: triangle
    (7, 20, 20), (8, 21, 20), (9, 20, 21),
]


def test_two_clusters_border_and_noise(spark):
    df = spark.createDataFrame(POINTS, "id long, x long, y long")
    out = {
        r["id"]: (r["role"], r["cluster"], r["n_eps"])
        for r in dbscan_grid(df, eps=2, min_pts=3).collect()
    }
    for i in (1, 2, 3, 4):
        assert out[i][0] == "core" and out[i][1] == 1, out[i]
    assert out[5] == ("border", 1, 2)
    assert out[6] == ("noise", -1, 1)
    for i in (7, 8, 9):
        assert out[i][0] == "core" and out[i][1] == 7, out[i]


def test_min_pts_flips_cluster_to_noise(spark):
    df = spark.createDataFrame(POINTS, "id long, x long, y long")
    out = {
        r["id"]: r["role"]
        for r in dbscan_grid(df, eps=2, min_pts=4).collect()
    }
    # triangle B has n_eps=3 < 4: all its points lose core status and,
    # with no core anywhere near, degrade to noise.
    for i in (7, 8, 9):
        assert out[i] == "noise"
    # square A keeps n_eps=4 cores.
    for i in (1, 2, 3, 4):
        assert out[i] == "core"
