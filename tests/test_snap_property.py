"""Randomized property tests for SNAP decode (SURVEY §5.3): a pure-
Python 25-line reference decode vs the Spark loader on random bit
matrices + edge lists. The handcrafted fixtures (test_snap_decode.py)
pin each quirk once; these pin them under composition.

Examples are capped low: every example is a full Spark ingest.
"""

from __future__ import annotations

import tempfile
from pathlib import Path

from hypothesis import HealthCheck, given, settings, strategies as st

from graph_database_spark.sources import snap

EGO = 99


@st.composite
def networks(draw):
    n_feats = draw(st.integers(2, 6))
    n_nodes = draw(st.integers(2, 5))
    bits = [
        [draw(st.integers(0, 1)) for _ in range(n_feats)] for _ in range(n_nodes)
    ]
    ego_bits = [draw(st.integers(0, 1)) for _ in range(n_feats)]
    # Random directed pairs among alters 1..n_nodes; may repeat/reverse.
    pairs = draw(
        st.lists(
            st.tuples(st.integers(1, n_nodes), st.integers(1, n_nodes)),
            min_size=1,
            max_size=8,
        ).filter(lambda ps: any(a != b for a, b in ps))
    )
    return n_feats, bits, ego_bits, [(a, b) for a, b in pairs if a != b]


def ref_decode(n_feats, row):
    """Reference property-bag decode: featname i maps to property
    'p<i % 2>;id' (two names so last-bit-wins has collisions); the
    highest set index per name wins (src/main.js:185-197 semantics)."""
    out = {}
    for i in range(n_feats):
        if row[i]:
            out[f"p{i % 2};id"] = f"anonymized feature {i}"
    return out


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(networks())
def test_random_network_decode(spark, net):
    n_feats, bits, ego_bits, pairs = net
    d = Path(tempfile.mkdtemp())
    (d / f"{EGO}.featnames").write_text(
        "".join(f"{i} p{i % 2};id;anonymized feature {i}\n" for i in range(n_feats))
    )
    (d / f"{EGO}.feat").write_text(
        "".join(
            f"{node + 1} " + " ".join(map(str, row)) + "\n"
            for node, row in enumerate(bits)
        )
    )
    (d / f"{EGO}.egofeat").write_text(" ".join(map(str, ego_bits)) + "\n")
    (d / f"{EGO}.edges").write_text("".join(f"{a} {b}\n" for a, b in pairs))
    (d / f"{EGO}.circles").write_text("")

    v, e, _ = snap.load_ego_network(spark, str(d), str(EGO))

    in_edges = {x for p in pairs for x in p}
    # Vertex set: alters appearing in the edge list, plus the ego.
    got_ids = {r["id"] for r in v.collect()}
    assert got_ids == in_edges | {EGO}

    # Edge set: canonical undirected alter pairs + ego spokes.
    want_edges = {(min(a, b), max(a, b)) for a, b in pairs} | {
        (x, EGO) for x in in_edges
    }
    got_edges = {(r["src"], r["dst"]) for r in e.collect()}
    assert got_edges == want_edges

    # Property bags: last-bit-wins per property name, for every vertex.
    props = {r["id"]: dict(r["props"] or {}) for r in v.collect()}
    for node in in_edges:
        assert props[node] == ref_decode(n_feats, bits[node - 1]), node
    assert props[EGO] == ref_decode(n_feats, ego_bits)
