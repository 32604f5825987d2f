"""Property/fixture tests for the SNAP decode semantics (SURVEY §5.3) —
the quirks golden replication proved matter: last-bit-wins, isolated-alter
drop, either-direction edge dedup + ego spokes, empty property bags.
"""

from __future__ import annotations

import pytest

from graph_database_spark.sources import snap


@pytest.fixture(scope="module")
def tiny_net(spark, tmp_path_factory):
    """Handcrafted ego network '9' exercising every decode quirk:
      - node 1: two bits on the SAME property (idx 0 and 2) -> idx 2 wins;
      - node 2: zero bits -> empty/null props, still a vertex (in edges);
      - node 3: isolated (in .feat, absent from .edges) -> dropped;
      - edges listed in both directions -> one canonical edge;
      - ego 9 gets spokes to 1 and 2.
    """
    d = tmp_path_factory.mktemp("snapdata")
    (d / "9.featnames").write_text(
        "0 hometown;id;anonymized feature 10\n"
        "1 education;school;id;anonymized feature 20\n"
        "2 hometown;id;anonymized feature 30\n"
    )
    (d / "9.feat").write_text(
        "1 1 1 1\n"   # hometown bits 0 AND 2 set -> feature 30 wins
        "2 0 0 0\n"
        "3 1 1 1\n"   # isolated: never appears in .edges
    )
    (d / "9.egofeat").write_text("0 1 0\n")
    (d / "9.edges").write_text("1 2\n2 1\n")
    (d / "9.circles").write_text("circle0\t1\t3\t9\n")
    return snap.load_ego_network(spark, str(d), "9")


def test_last_bit_wins(tiny_net):
    v, _, _ = tiny_net
    props = {r["id"]: r["props"] for r in v.collect()}
    assert props[1]["hometown;id"] == "anonymized feature 30"
    assert props[1]["education;school;id"] == "anonymized feature 20"


def test_isolated_alter_dropped_and_empty_bag_kept(tiny_net):
    v, _, _ = tiny_net
    ids = {r["id"] for r in v.collect()}
    assert ids == {1, 2, 9}  # 3 dropped; 2 kept with empty bag
    props = {r["id"]: r["props"] for r in v.collect()}
    assert not props[2]  # None or {}


def test_edge_dedup_and_spokes(tiny_net):
    _, e, _ = tiny_net
    edges = {(r["src"], r["dst"]) for r in e.collect()}
    assert edges == {(1, 2), (1, 9), (2, 9)}  # canonical src < dst


def test_ego_props_decoded(tiny_net):
    v, _, _ = tiny_net
    props = {r["id"]: r["props"] for r in v.collect()}
    assert props[9] == {"education;school;id": "anonymized feature 20"}


def test_circle_members_filtered(tiny_net):
    _, _, c = tiny_net
    rows = {(r["circle"], r["member"]) for r in c.collect()}
    assert rows == {("circle0", 1)}  # 3 unknown, 9 is the ego
