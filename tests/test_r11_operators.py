"""Structural invariants of the r11 selection/testing operators —
properties the hash gate can't express (it pins one corpus; these pin
the algorithm)."""

from __future__ import annotations

from graph_database_spark import catalog

SF_DIR = "/root/testdata/sf0.001"


def test_kcenter_cover_radius_monotone(spark):
    """Greedy k-center's defining invariant: each pick's coverage
    radius (its distance to the already-selected set) is non-increasing
    — pick t was the farthest point, so pick t+1's min-dist can't
    exceed it."""
    rows = sorted(
        catalog.q_kcenter_coreset(spark, SF_DIR).collect(),
        key=lambda r: r["sel_rank"],
    )
    assert [r["sel_rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert len({r["vec_id"] for r in rows}) == len(rows)  # distinct picks
    covers = [r["cover_micro"] for r in rows[1:]]  # skip the seed sentinel
    assert all(a >= b for a, b in zip(covers, covers[1:])), covers


def test_mmr_scores_monotone_and_distinct(spark):
    """MMR's greedy marginal score is non-increasing: the penalty term
    max-sim only grows and the candidate set only shrinks."""
    rows = sorted(
        catalog.q_mmr_diversify(spark, SF_DIR).collect(),
        key=lambda r: r["sel_rank"],
    )
    assert len({r["cand_id"] for r in rows}) == len(rows)
    scores = [r["score_micro"] for r in rows]
    assert all(a >= b for a, b in zip(scores, scores[1:])), scores
    # rank 1 is the pure-relevance argmax: score == 7 * rel
    assert rows[0]["score_micro"] == 7 * rows[0]["rel_micro"]


def test_priority_sample_estimator_weights(spark):
    """DLT invariants: every kept priority > tau would be wrong (tau is
    the (k+1)-th, so kept priorities are >= tau by construction) and
    w_hat = max(w, tau) >= w."""
    rows = catalog.q_priority_sample(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 64
    for r in rows:
        assert r["w_hat"] >= r["w"]
        assert r["w_hat"] >= min(x["w_hat"] for x in rows)  # tau floor


def test_bh_fdr_stepup_shape(spark):
    """BH rejections are a prefix of the p-value ordering (the step-up
    property), and every p is a valid probability in micro units."""
    rows = sorted(
        catalog.q_bh_fdr(spark, SF_DIR).collect(),
        key=lambda r: r["bh_rank"],
    )
    assert all(0 <= r["p_micro"] <= 10**6 for r in rows)
    flags = [r["rejected"] for r in rows]
    # once a 0 appears, no later 1 (prefix property)
    assert all(not (a == 0 and b == 1) for a, b in zip(flags, flags[1:]))
