"""Lloyd k-means tests (operators/kmeans.py)."""

from __future__ import annotations

from graph_database_spark.operators.kmeans import kmeans_assign


def test_two_clear_clusters_separate(spark):
    # 2 tight clusters on orthogonal axes; k=2 must split them exactly
    # after 3 rounds regardless of which points seed the centroids.
    rows = []
    for i in range(10):
        rows.append((i, [1.0 + 0.01 * i, 0.0]))
        rows.append((100 + i, [0.0, 1.0 + 0.01 * i]))
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_assign(vecs, k=2, rounds=3).collect()
    cells = {r["vec_id"]: r["cell"] for r in out}
    a = {cells[i] for i in range(10)}
    b = {cells[100 + i] for i in range(10)}
    assert len(a) == 1 and len(b) == 1 and a != b
    # distances are integer micro-units, tight within clusters
    assert all(r["dist2"] >= 0 for r in out)


def test_assignment_total_and_deterministic(spark):
    from graph_database_spark.sources.parquet import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    out1 = kmeans_assign(emb, k=8, rounds=2)
    assert out1.count() == emb.count()  # every vector assigned
    r1 = sorted(map(tuple, out1.collect()))
    r2 = sorted(map(tuple, kmeans_assign(emb, k=8, rounds=2).collect()))
    assert r1 == r2  # md5 seeds + integer argmin => retry-stable
