"""LOF: hand geometry — a tight directional cluster plus one
near-orthogonal stray must get the top (and clearly elevated) score."""

from __future__ import annotations

from graph_database_spark.operators.lof import lof_scores


def _vecs(spark):
    rows = []
    # 10 inliers: direction ~e1 with small deterministic jitter.
    for i in range(10):
        v = [1.0, 0.01 * (i % 3), 0.005 * i, 0.0]
        rows.append((i, v))
    # the stray: near-orthogonal direction.
    rows.append((99, [0.05, 1.0, 0.0, 0.2]))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def test_stray_direction_gets_top_lof(spark):
    out = {
        r["vec_id"]: r["lof_micro"]
        for r in lof_scores(
            _vecs(spark), k=5, n_bits=1, n_tables=8
        ).collect()
    }
    assert 99 in out, "stray never met the cluster in any bucket"
    stray = out.pop(99)
    assert stray > max(out.values())
    # inliers sit in a uniform-density cluster: ratio ~ 1.
    assert all(v < 1_500_000 for v in out.values()), out
    assert stray > 1_500_000, stray
