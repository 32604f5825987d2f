"""Round-7b operator tests: distributed global rank, sliding-window HLL
merge semantics, and the new catalog queries' local invariants."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Window, functions as F

from graph_database_spark.operators.rank import global_rank
from graph_database_spark.operators.sketches import hll_sliding


def test_global_rank_matches_window_rank(spark):
    # 10k shuffled keys: the range-partitioned rank must equal the
    # single-partition window rank exactly (total order on (key, id)).
    df = (
        spark.range(10000)
        .select(
            F.col("id"),
            F.md5(F.col("id").cast("string")).alias("key"),
        )
    )
    got = {
        (r["id"], r["r"])
        for r in global_rank(df, ["key", "id"]).collect()
    }
    w = Window.orderBy("key", "id")
    want = {
        (r["id"], r["r"])
        for r in df.select(
            "id", F.row_number().over(w).cast("long").alias("r")
        ).collect()
    }
    assert got == want


def test_global_rank_empty_frame(spark):
    df = spark.range(0).select(
        F.col("id"), F.col("id").cast("string").alias("key")
    )
    assert global_rank(df, ["key", "id"]).count() == 0


def _events(spark, rows):
    return spark.createDataFrame(
        [(dt.datetime(2024, 1, d, h), u) for d, h, u in rows],
        "ts timestamp, user_id long",
    )


def test_hll_sliding_window_carries_quiet_days(spark):
    # users 1..40 on day 1; a single repeat user on day 5 (inside the
    # 7-day window) must NOT change the merged registers, so day-5's
    # estimate equals day-1's.
    rows = [(1, 0, u) for u in range(1, 41)] + [(5, 0, 1)]
    out = {
        r["day"].day: (r["reg_sum"], r["est_distinct"])
        for r in hll_sliding(_events(spark, rows), "user_id").collect()
    }
    assert set(out) == {1, 5}
    assert out[1] == out[5]


def test_hll_sliding_window_expires_old_days(spark):
    # disjoint user sets 8+ days apart: each day's window sees only its
    # own users, so both days report the same register sum (same set
    # size, same hash multiset only if sets identical — instead check
    # day 9 differs from the MERGED sum it would have had in-window).
    rows = [(1, 0, u) for u in range(1, 41)] + [
        (9, 0, u) for u in range(1001, 1041)
    ]
    out = {
        r["day"].day: r["reg_sum"]
        for r in hll_sliding(_events(spark, rows), "user_id").collect()
    }
    both = [(1, 0, u) for u in range(1, 41)] + [
        (5, 0, u) for u in range(1001, 1041)
    ]
    merged = {
        r["day"].day: r["reg_sum"]
        for r in hll_sliding(_events(spark, both), "user_id").collect()
    }
    # day 9 (expired) keeps only its own 40 users; day 5 in the merged
    # variant unions 80 users -> strictly smaller register sum
    assert merged[5] < out[9] or merged[5] < out[1]
    assert out[9] != merged[5]


def test_hll_sliding_estimate_accuracy(spark):
    # raw-regime sanity: 500 distinct users in-window -> estimate
    # within the ~18% worst-case band of m=32.
    rows = [(1 + (u % 3), u % 24, u) for u in range(1, 501)]
    out = hll_sliding(_events(spark, rows), "user_id").collect()
    last = max(out, key=lambda r: r["day"])
    assert 350 <= last["est_distinct"] <= 700


def _kruskal_max(edges):
    """Pure-Python reference: Kruskal under (w DESC, src, dst) order."""
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    forest = set()
    for w, s, d in sorted(
        ((w, s, d) for s, d, w in edges), key=lambda t: (-t[0], t[1], t[2])
    ):
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[rs] = rd
            forest.add((s, d, w))
    return forest


def test_max_spanning_forest_matches_kruskal(spark):
    from graph_database_spark.operators.msf import max_spanning_forest

    # deterministic pseudo-random weighted graph with duplicate weights
    # (exercises the composite tie-break), several components, chains
    raw = []
    for i in range(300):
        s = (i * 7) % 97
        d = (i * i + 3) % 97
        if s == d:
            continue
        s, d = (s, d) if s < d else (d, s)
        raw.append((s, d, (i * 13) % 11 + 1))
    edges = sorted(set(raw))
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = {
        (r["src"], r["dst"], r["w"])
        for r in max_spanning_forest(df).collect()
    }
    want = _kruskal_max(edges)
    assert got == want


def test_max_spanning_forest_on_testdata(spark):
    # catalog-level smoke at sf0.001: a spanning forest has exactly
    # |V| - |components| edges and total weight >= any other forest's
    # (checked against Kruskal exactly).
    from graph_database_spark.catalog import QUERIES

    out = QUERIES["max_spanning_forest"](spark, "/root/testdata/sf0.001")
    rows = [(r["src"], r["dst"], r["w"]) for r in out.collect()]
    want = _kruskal_max(rows)  # forest of a forest is itself
    assert set(rows) == want
    assert len(rows) == len(set(rows))


def test_hyper_anf_star_graph(spark):
    # star: center 0, leaves 1..20. At t=1 every vertex's ball is
    # {v, neighbors}: center sees all 21, each leaf sees {leaf, 0}.
    # Replicate the md5 register math in Python and compare reg_sum.
    import hashlib

    from graph_database_spark.operators.sketches import hll_neighborhood

    m = 16

    def h60(v):
        return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)

    def reg_sum(members):
        regs = {}
        for v in members:
            h = h60(v)
            b, w = h % m, h // m
            rho = 55 if w == 0 else (w & -w).bit_length()
            regs[b] = max(regs.get(b, 0), rho)
        return sum(1 << (55 - r) for r in regs.values()) + (
            m - len(regs)
        ) * (1 << 55)

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 21)], "src long, dst long"
    )
    out = {
        (r["id"], r["t"]): r["reg_sum"]
        for r in hll_neighborhood(edges, hops=2).collect()
    }
    allv = set(range(21))
    assert out[(0, 1)] == reg_sum(allv)
    assert out[(5, 1)] == reg_sum({5, 0})
    # t=2: every leaf reaches everything through the center
    assert out[(5, 2)] == reg_sum(allv)
    # monotone: merging registers can only grow coverage
    for v in range(21):
        assert out[(v, 2)] <= out[(v, 1)]


def test_global_prefix_sum_matches_window(spark):
    from graph_database_spark.operators.rank import global_prefix_sum

    df = spark.range(5000).select(
        F.col("id"),
        F.md5(F.col("id").cast("string")).alias("key"),
        ((F.col("id") % 7) - 3).alias("delta"),
    )
    got = {
        (r["id"], r["running"])
        for r in global_prefix_sum(df, ["key", "id"], "delta").collect()
    }
    w = (
        Window.orderBy("key", "id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = {
        (r["id"], r["running"])
        for r in df.select(
            "id", F.sum("delta").over(w).cast("long").alias("running")
        ).collect()
    }
    assert got == want


def test_pq_degenerates_to_kmeans_on_single_subspace(spark):
    # With sub_dims >= dim there is exactly one subspace, and pq_assign
    # must reproduce kmeans_assign bit-for-bit (same md5 seed order,
    # same floor-mean updates, same argmin tiebreak).
    from graph_database_spark.operators.kmeans import kmeans_assign
    from graph_database_spark.operators.pq import pq_assign
    from graph_database_spark.sources.parquet import load_table

    vecs = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    pq = {
        (r["vec_id"], r["code"], r["dist2"])
        for r in pq_assign(vecs, k=8, rounds=3, sub_dims=1024).collect()
    }
    km = {
        (r["vec_id"], r["cell"], r["dist2"])
        for r in kmeans_assign(vecs, k=8, rounds=3).collect()
    }
    assert pq == km


def test_bootstrap_replicates_poisson_mass(spark):
    # Poisson(1) multiplicities: every replicate's effective sample
    # size concentrates around N, and replicates differ (the draws are
    # keyed per (event_id, rep), not constant).
    from graph_database_spark.catalog import QUERIES

    rows = QUERIES["bootstrap_replicates"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(
            (r["n_eff"], r["sum_milli"])
        )
    for t, reps in by_type.items():
        assert len(reps) == 32
        ns = [n for n, _ in reps]
        mean_n = sum(ns) / len(ns)
        assert len(set(s for _, s in reps)) > 1
        # N per type at sf0.001 is ~200; Poisson keeps n_eff near N
        assert 0.5 * mean_n <= min(ns) and max(ns) <= 1.6 * mean_n
