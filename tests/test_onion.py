"""Onion decomposition on a hand graph: a path tail must peel one layer
per round (fringe structure) while the K4 center peels as one deep
layer — the distinction coreness alone cannot express."""

from __future__ import annotations

from graph_database_spark.operators.kcore import onion_layers


def test_path_into_clique_layers(spark):
    # a - b - c - d, with {d, e, f, g} a K4.
    edges = spark.createDataFrame(
        [
            (1, 2), (2, 3), (3, 4),
            (4, 5), (4, 6), (4, 7), (5, 6), (5, 7), (6, 7),
        ],
        "src long, dst long",
    )
    got = {
        r["id"]: (r["layer"], r["core"])
        for r in onion_layers(edges).collect()
    }
    # Path tail: one vertex per round at threshold 1.
    assert got[1] == (1, 1)
    assert got[2] == (2, 1)
    assert got[3] == (3, 1)
    # K4: all four peel together in round 4 at threshold 3.
    assert got[4] == got[5] == got[6] == got[7] == (4, 3)


def test_exact_budget_finish_is_success(spark):
    # ADVICE r12: a peel that completes in exactly max_rounds rounds
    # must return normally (the old for-else only broke on the NEXT
    # round's empty probe, so it raised and discarded a correct
    # result). The path graph peels the path tail one vertex per
    # round: a-b-c-d-e peels in exactly 3 rounds (1|2 then 3|4... the
    # measured round count is asserted first so the budget pin stays
    # honest).
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    rounds = max(r["layer"] for r in onion_layers(edges).collect())
    got = onion_layers(edges, max_rounds=rounds).collect()
    assert len(got) == 5


def test_empty_input_returns_empty(spark):
    # ADVICE r12: peeled[0] raised IndexError on an empty edge input.
    edges = spark.createDataFrame([], "src long, dst long")
    out = onion_layers(edges)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == ["id", "layer", "core"]
