"""Haar pyramid: hand-computed coefficients and exact reconstruction."""

from __future__ import annotations

from graph_database_spark.operators.haar import LEVELS, haar_transform


def test_haar_small_signal(spark):
    df = spark.createDataFrame(
        [(0, 5), (1, 3), (2, 7), (3, 1), (10, 4)], "idx long, v long"
    )
    out = haar_transform(df, "idx", "v").collect()
    coef = {(r["lvl"], r["idx"], r["kind"]): r["coef"] for r in out}
    # 2048 + 1024 + ... + 1 details plus the final approximation.
    assert len(coef) == 4096
    assert coef[(1, 0, "d")] == 5 - 3
    assert coef[(1, 1, "d")] == 7 - 1
    assert coef[(1, 5, "d")] == 4 - 0
    # Final approximation is the series total.
    assert coef[(LEVELS, 0, "a")] == 20
    # Unnormalized Haar reconstructs exactly: a_{l-1}(0) = (a_l + d_l)/2.
    v = coef[(LEVELS, 0, "a")]
    for lvl in range(LEVELS, 0, -1):
        num = v + coef[(lvl, 0, "d")]
        assert num % 2 == 0
        v = num // 2
    assert v == 5
