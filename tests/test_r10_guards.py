"""Runtime guards on distinct-score-universe windows (VERDICT r9 #4).

rank_auc and isotonic_fit window over the DISTINCT-score frame — fine
while the universe is bounded (document lengths, hour-of-day), a silent
single-partition stall (plus, for isotonic, an O(B^2) interval-join
blowup) when a caller feeds a continuous 100x-cardinality score. Both
now count the checkpointed grouped frame and raise loudly above a
documented threshold (the similarity.brute_force_topk guard pattern).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_database_spark.operators.evalmetrics import isotonic_fit
from graph_database_spark.operators.rank import rank_auc


@pytest.fixture(scope="module")
def wide_scores(spark):
    # 200 distinct scores, alternating labels
    return spark.range(200).select(
        F.col("id").alias("score"), (F.col("id") % 2 == 0).alias("y")
    )


def test_rank_auc_raises_on_high_cardinality_scores(wide_scores):
    with pytest.raises(ValueError, match="score universe has 200"):
        rank_auc(wide_scores, "score", "y", max_score_universe=50)


def test_isotonic_fit_raises_on_high_cardinality_scores(wide_scores):
    with pytest.raises(ValueError, match="score universe has 200"):
        isotonic_fit(wide_scores, "score", "y", max_score_universe=50)


def test_guards_pass_below_threshold(wide_scores):
    # same inputs under the threshold still compute (and None skips)
    out = rank_auc(wide_scores, "score", "y", max_score_universe=200)
    row = out.collect()[0]
    assert row["n_pos"] == 100 and row["n_neg"] == 100
    fit = isotonic_fit(wide_scores, "score", "y", max_score_universe=None)
    assert fit.count() == 200
