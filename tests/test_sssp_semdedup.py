"""Known-answer fixtures for sssp_weighted and semdedup_md5.

Complements the catalog hash gate (which verifies both against DuckDB at
sf0.01) with tiny graphs/vector sets whose answers are computable by
hand — the SURVEY.md §5 test model.
"""

from __future__ import annotations

import math

from graph_database_spark.operators.semdedup import semdedup_md5
from graph_database_spark.operators.sssp import sssp_weighted


def test_sssp_prefers_cheap_two_hop_path(spark):
    # Graph: 1-2 weight 1 (cost 1_000_000), 1-3 weight 10 (cost 100_000),
    # 3-2 weight 10 (cost 100_000). Cheapest 1->2 is via 3: 200_000.
    edges = spark.createDataFrame(
        [(1, 2, 1), (1, 3, 10), (3, 2, 10)],
        "src bigint, dst bigint, weight bigint",
    )
    out = {
        (r.source, r.id): r.dist_micro
        for r in sssp_weighted(edges, num_sources=1, rounds=4).collect()
    }
    assert out == {(1, 1): 0, (1, 2): 200_000, (1, 3): 100_000}


def test_sssp_round_budget_bounds_hops(spark):
    # Path graph 1-2-3-4, all weight 1. One relax round reaches only the
    # 1-hop neighbourhood; the state is the R-hop-bounded recurrence.
    edges = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1), (3, 4, 1)],
        "src bigint, dst bigint, weight bigint",
    )
    one = sssp_weighted(edges, num_sources=1, rounds=1)
    assert {r.id for r in one.collect()} == {1, 2}
    three = sssp_weighted(edges, num_sources=1, rounds=3)
    assert {(r.id, r.dist_micro) for r in three.collect()} == {
        (1, 0),
        (2, 1_000_000),
        (3, 2_000_000),
        (4, 3_000_000),
    }


def test_sssp_symmetrizes_directed_input(spark):
    # Edge stored one way only must be traversable both ways.
    edges = spark.createDataFrame(
        [(2, 1, 1)], "src bigint, dst bigint, weight bigint"
    )
    out = {
        (r.source, r.id): r.dist_micro
        for r in sssp_weighted(edges, num_sources=2, rounds=2).collect()
    }
    assert out == {(1, 1): 0, (1, 2): 1_000_000, (2, 1): 1_000_000, (2, 2): 0}


def _vec(angle_deg: float) -> list[float]:
    a = math.radians(angle_deg)
    return [math.cos(a), math.sin(a), 0.0, 0.0]


def test_semdedup_flags_near_parallel_vectors(spark):
    # 0° and 5° are near-duplicates (cos ~0.996); 90° is not a dup of
    # either. One cell so the threshold logic alone decides; tau = 0.95
    # in micro² units.
    emb = spark.createDataFrame(
        [(1, _vec(0.0)), (2, _vec(5.0)), (3, _vec(90.0))],
        "vec_id bigint, embedding array<float>",
    )
    rows = {
        r.vec_id: r
        for r in semdedup_md5(
            emb, n_centroids=1, tau_micro2=950_000_000_000
        ).collect()
    }
    assert rows[1].is_dup == 0 and rows[1].dup_of is None
    assert rows[3].is_dup == 0
    assert rows[2].is_dup == 1 and rows[2].dup_of == 1
    # integer micro² dot of unit vectors ~ cos * 1e12
    assert abs(rows[2].best_sim - round(math.cos(math.radians(5.0)) * 1e12)) < 1e7


def test_semdedup_cross_cell_pairs_never_compared(spark):
    # Antipodal clusters land in different cells with 2 centroids, so
    # even a tau of -1 (everything qualifies) only pairs WITHIN a cell.
    emb = spark.createDataFrame(
        [(1, _vec(0.0)), (2, _vec(1.0)), (3, _vec(180.0)), (4, _vec(181.0))],
        "vec_id bigint, embedding array<float>",
    )
    out = semdedup_md5(emb, n_centroids=2, tau_micro2=-2_000_000_000_000)
    rows = {r.vec_id: r for r in out.collect()}
    cells = {v: rows[v].cell for v in rows}
    assert cells[1] == cells[2] and cells[3] == cells[4]
    assert cells[1] != cells[3]
    # dup_of only ever points at a cluster-mate
    for v, r in rows.items():
        if r.dup_of is not None:
            assert cells[r.dup_of] == cells[v]
