"""UCB1 replay structural properties (the bootstrap-order invariant
queued in the r9 continuation notes).

The fold gives unseen arms a sentinel-max UCB and breaks ties toward
the lexicographically smaller arm, so any correct replay MUST spend its
first |arms| days picking each arm exactly once in alphabetical order
with no finite UCB score; afterwards every day carries a finite score.
This pins the control flow of the HOF fold independently of the
recursive-CTE oracle (which shares no code with it).
"""

from __future__ import annotations


def test_ucb_bootstrap_order_and_scores(spark):
    from graph_database_spark import catalog

    rows = (
        catalog.QUERIES["ucb_replay"](spark, "/root/testdata/sf0.001")
        .orderBy("day")
        .collect()
    )
    assert rows, "replay produced no picks"
    arms = sorted({r["arm"] for r in rows})
    k = len(arms)
    assert k >= 2, "need multiple arms for the property to bite"
    # Bootstrap phase: alphabetical, one pick per arm, sentinel scores.
    assert [r["arm"] for r in rows[:k]] == arms
    assert all(r["ucb_micro"] is None for r in rows[:k])
    # Steady state: every pick scored, days contiguous from 1.
    assert all(r["ucb_micro"] is not None for r in rows[k:])
    assert [r["day"] for r in rows] == list(range(1, len(rows) + 1))
    # Rewards are the exact micro means the chosen arm earned that day:
    # non-negative by construction (event values are non-negative).
    assert all(r["reward_micro"] >= 0 for r in rows)
