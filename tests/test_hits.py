"""HITS fixtures: numpy parity on a small bipartite graph + invariants."""

from __future__ import annotations

import numpy as np

from graph_database_spark.operators.hits import hits_quantized

# Bipartite (hub, auth): hub 0 buys everything, auth 10 is bought by
# everyone — the expected top hub / top authority.
BIP = [
    (0, 10), (0, 11), (0, 12), (0, 13),
    (1, 10), (1, 11),
    (2, 10), (2, 12),
    (3, 10),
]


def numpy_hits_l1(bip, iters):
    """Quantization-free L1-normalized HITS — the reference iterate."""
    hubs = sorted({h for h, _ in bip})
    auths = sorted({a for _, a in bip})
    hi = {v: i for i, v in enumerate(hubs)}
    ai = {v: i for i, v in enumerate(auths)}
    m = np.zeros((len(hubs), len(auths)))
    for h_, a_ in bip:
        m[hi[h_], ai[a_]] = 1.0
    h = np.ones(len(hubs))
    for _ in range(iters):
        a = m.T @ h
        a /= a.sum()
        h = m @ a
        h /= h.sum()
    return {v: h[hi[v]] for v in hubs}, {v: a[ai[v]] for v in auths}


def test_hits_matches_numpy(spark):
    df = spark.createDataFrame(BIP, "hub long, auth long")
    rows = {(r.kind, r.id): r.score_nano for r in hits_quantized(df, 6).collect()}
    h_exp, a_exp = numpy_hits_l1(BIP, 6)
    for v, s in h_exp.items():
        assert abs(rows[("hub", v)] / 1e9 - s) < 1e-6
    for v, s in a_exp.items():
        assert abs(rows[("auth", v)] / 1e9 - s) < 1e-6


def test_hits_top_nodes_and_mass(spark):
    df = spark.createDataFrame(BIP, "hub long, auth long")
    out = hits_quantized(df, 4).collect()
    hubs = {r.id: r.score_nano for r in out if r.kind == "hub"}
    auths = {r.id: r.score_nano for r in out if r.kind == "auth"}
    assert max(hubs, key=hubs.get) == 0
    assert max(auths, key=auths.get) == 10
    # L1 normalization: each side sums to ~1e9 (rounding slack per node).
    assert abs(sum(hubs.values()) - 1_000_000_000) <= len(hubs)
    assert abs(sum(auths.values()) - 1_000_000_000) <= len(auths)


def test_hits_deterministic_across_runs(spark):
    df = spark.createDataFrame(BIP, "hub long, auth long")
    a = sorted(map(tuple, hits_quantized(df, 5).collect()))
    b = sorted(map(tuple, hits_quantized(df.repartition(7), 5).collect()))
    assert a == b
