"""Deterministic random walks: validity, determinism, coverage."""

from __future__ import annotations

from graph_database_spark.operators.walks import random_walks

EDGES = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (2, 5)]


def test_walks_follow_edges_and_are_deterministic(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    adj = {}
    for a, b in EDGES:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    rows = random_walks(df, num_walks=3, steps=5).collect()
    walks = {}
    for r in rows:
        walks.setdefault(r["walk_id"], {})[r["step"]] = r["node"]
    assert set(walks) == {1, 2, 3}  # three smallest vertex ids
    for wid, path in walks.items():
        assert path[0] == wid and len(path) == 6
        for t in range(1, 6):
            assert path[t] in adj[path[t - 1]]  # every hop is a real edge
    # determinism: a second run yields the identical walk set
    again = random_walks(df, num_walks=3, steps=5).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_node2vec_walks_follow_edges_and_replay_python(spark):
    """Pin the biased walk against an independent pure-Python replay of
    the same weighted md5 inverse-CDF recipe."""
    import hashlib

    from graph_database_spark.operators.walks import node2vec_walks

    df = spark.createDataFrame(EDGES, "src long, dst long")
    adj = {}
    for a, b in EDGES:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nbrs = {v: sorted(ns) for v, ns in adj.items()}

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def replay(wid, steps):
        path = [wid]
        node = wid
        node = nbrs[node][h60(f"{wid}|1|{node}") % len(nbrs[node])]
        path.append(node)
        for t in range(2, steps + 1):
            prev = path[-2]
            wl = [
                4 if x == prev else (2 if x in adj[prev] else 1)
                for x in nbrs[node]
            ]
            r = h60(f"{wid}|{t}|{node}") % sum(wl)
            acc = 0
            for x, w in zip(nbrs[node], wl):
                acc += w
                if acc > r:
                    node = x
                    break
            path.append(node)
        return path

    rows = node2vec_walks(df, num_walks=3, steps=5).collect()
    walks = {}
    for r in rows:
        walks.setdefault(r["walk_id"], {})[r["step"]] = r["node"]
    assert set(walks) == {1, 2, 3}
    for wid, path in walks.items():
        got = [path[t] for t in range(6)]
        assert got == replay(wid, 5), wid
        for t in range(1, 6):
            assert path[t] in adj[path[t - 1]]


def test_max_cover_greedy_hand_case(spark):
    from graph_database_spark.operators.cover import max_cover_seeds

    df = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (5, 6)], "src long, dst long"
    )
    rows = sorted(
        (r["seed_rank"], r["seed"], r["gain"])
        for r in max_cover_seeds(df, k=3).collect()
    )
    # Round 1: N[1] covers {1,2,3,4} (gain 4). Round 2: tie between 5
    # and 6 (gain 2) -> smallest id. Round 3: nothing left uncovered.
    assert rows == [(1, 1, 4), (2, 5, 2)]


def test_temporal_reachability_respects_time_ordering(spark):
    from graph_database_spark.operators.treach import temporal_reachability

    # Edge 1-2 active at month 5, edge 2-3 active at month 3: from 1 you
    # arrive at 2 at t=5, too late for the 2-3 edge — but from 3 the
    # path 3 -(3)-> 2 -(5)-> 1 is time-respecting. Asymmetric
    # reachability on an undirected graph is the temporal signature a
    # static BFS cannot produce.
    df = spark.createDataFrame(
        [(1, 2, 5), (2, 3, 3)], "src long, dst long, t long"
    )
    got = {
        (r["source"], r["id"]): r["arrival"]
        for r in temporal_reachability(df, num_sources=3, rounds=4).collect()
    }
    assert got[(1, 2)] == 5
    assert (1, 3) not in got          # 1 cannot reach 3
    assert got[(3, 2)] == 3 and got[(3, 1)] == 5
    assert got[(2, 1)] == 5 and got[(2, 3)] == 3


def test_luby_mis_independent_and_maximal(spark):
    from graph_database_spark.operators.mis import luby_mis

    df = spark.createDataFrame(EDGES, "src long, dst long")
    mis = {r["id"] for r in luby_mis(df).collect()}
    adj = {}
    for a, b in EDGES:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    # independence: no two MIS members adjacent
    for v in mis:
        assert not (adj[v] & mis)
    # maximality: every non-member has a member neighbor
    for v in set(adj) - mis:
        assert adj[v] & mis


def test_walk_fusion_is_value_invariant(spark):
    """r15: materialization frequency (fuse) must never change the walk
    set — per-hop (fuse=1), the shipped fuse=4, and fully-lazy all
    yield bit-identical corpora on both walk kinds."""
    from graph_database_spark.operators.walks import node2vec_walks

    df = spark.createDataFrame(EDGES, "src long, dst long")
    for op in (random_walks, node2vec_walks):
        ref = sorted(
            map(tuple, op(df, num_walks=3, steps=5, fuse=1).collect())
        )
        for k in (4, 99):
            got = sorted(
                map(tuple, op(df, num_walks=3, steps=5, fuse=k).collect())
            )
            assert got == ref, (op.__name__, k)
