"""Connected components vs a pure-Python union-find oracle."""

from __future__ import annotations

import random

from graph_database_spark.operators.components import connected_components, dedup_groups


def union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # Component label = min member id.
    comp = {}
    for x in parent:
        root = find(x)
        comp.setdefault(root, []).append(x)
    out = {}
    for members in comp.values():
        m = min(members)
        for x in members:
            out[x] = m
    return out


def test_components_match_union_find(spark):
    rng = random.Random(7)
    nodes = list(range(200))
    edges = {(min(a, b), max(a, b)) for a, b in
             ((rng.choice(nodes), rng.choice(nodes)) for _ in range(150)) if a != b}
    edges = sorted(edges)
    df = spark.createDataFrame(edges, "src long, dst long")
    ours = {r["id"]: r["component"] for r in connected_components(df).collect()}
    assert ours == union_find_components(edges)


def test_components_long_chain(spark):
    # Worst-case diameter: a path graph — label must walk the whole chain.
    edges = [(i, i + 1) for i in range(30)]
    df = spark.createDataFrame(edges, "src long, dst long")
    ours = {r["id"]: r["component"] for r in connected_components(df).collect()}
    assert set(ours.values()) == {0}


def test_dedup_groups_keeper(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 5), (7, 9)], "id_a long, id_b long"
    )
    rows = {r["id"]: (r["keep_id"], r["is_keeper"]) for r in dedup_groups(pairs).collect()}
    assert rows == {
        1: (1, True), 2: (1, False), 5: (1, False),
        7: (7, True), 9: (7, False),
    }
