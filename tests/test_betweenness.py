"""Betweenness (stress centrality) vs an independent brute-force oracle.

The operator is the only one with no SQL oracle and no reference golden
(the reference's query never completed, src/main.js:108-125) — this
fixture is its correctness evidence. The oracle enumerates every
shortest path explicitly (predecessor-DAG DFS) and counts interior
occurrences, per the reference's semantics: over all ordered (s, t)
pairs, count shortest paths in which x is interior.
"""

from __future__ import annotations

from collections import defaultdict, deque

from graph_database_spark.operators.betweenness import betweenness

EDGES = [
    # Two communities bridged by 4-5; multiple equal-length paths exist.
    (1, 2), (1, 3), (2, 3), (3, 4),
    (4, 5),
    (5, 6), (6, 7), (5, 7), (7, 8),
]


def brute_force_stress(edges, sources=None):
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    nodes = sorted(adj)
    score = dict.fromkeys(nodes, 0)
    for s in sources or nodes:
        dist = {s: 0}
        order = deque([s])
        preds = defaultdict(list)
        while order:
            v = order.popleft()
            for n in sorted(adj[v]):
                if n not in dist:
                    dist[n] = dist[v] + 1
                    order.append(n)
                if dist.get(n) == dist[v] + 1:
                    preds[n].append(v)

        def paths_to(v):
            if v == s:
                return [[s]]
            return [p + [v] for u in preds[v] for p in paths_to(u)]

        for t in nodes:
            if t == s or t not in dist or dist[t] < 2:
                continue
            for path in paths_to(t):
                for x in path[1:-1]:
                    score[x] += 1
    return score


def test_betweenness_matches_brute_force(spark):
    edges_df = spark.createDataFrame(EDGES, "src long, dst long")
    ours = {r["id"]: r["betweenness"] for r in betweenness(edges_df).collect()}
    oracle = brute_force_stress(EDGES)
    assert ours == oracle


def test_betweenness_sampled_sources_subset(spark):
    """num_sources takes the N smallest ids — the deterministic sample."""
    edges_df = spark.createDataFrame(EDGES, "src long, dst long")
    ours = {r["id"]: r["betweenness"] for r in betweenness(edges_df, num_sources=3).collect()}
    oracle = brute_force_stress(EDGES, sources=[1, 2, 3])
    assert ours == oracle
