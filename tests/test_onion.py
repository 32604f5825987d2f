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
