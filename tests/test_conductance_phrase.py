"""Known-answer fixtures for conductance and phrase_search."""

from __future__ import annotations

from graph_database_spark.operators.graph import conductance
from graph_database_spark.operators.retrieval import phrase_search


def test_conductance_two_blocks_one_bridge(spark):
    # Communities {1,2} and {3,4}; one internal edge each, one bridge
    # 2-3. vol = 3 per block, cut = 1 -> phi = 1/3 both sides.
    edges = spark.createDataFrame(
        [(1, 2), (3, 4), (2, 3)], "src bigint, dst bigint"
    )
    comm = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20), (4, 20)], "id bigint, community bigint"
    )
    rows = {r.community: r for r in conductance(edges, comm).collect()}
    assert rows[10].n_nodes == 2 and rows[10].vol == 3 and rows[10].cut == 1
    assert rows[20].n_nodes == 2 and rows[20].vol == 3 and rows[20].cut == 1
    assert rows[10].conductance == round(1 / 3, 6)


def test_conductance_whole_graph_community_is_null(spark):
    # A community holding every vertex has denominator min(vol, 2m-vol)=0
    # -> NULL, never a divide-by-zero (ANSI mode) or inf.
    edges = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
    comm = spark.createDataFrame([(1, 7), (2, 7)], "id bigint, community bigint")
    [r] = conductance(edges, comm).collect()
    assert r.cut == 0 and r.conductance is None


def test_phrase_search_counts_and_positions(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b x"), (3, "c d")],
        "doc_id bigint, text string",
    )
    out = {
        (r.phrase, r.doc_id): (r.matches, r.first_pos)
        for r in phrase_search(docs, n_phrases=3).collect()
    }
    # top-3 phrases by (count desc, phrase asc): "a b"(3), "b a", "b c"
    assert out == {
        ("a b", 1): (2, 1),
        ("a b", 2): (1, 1),
        ("b a", 1): (1, 2),
        ("b c", 1): (1, 4),
    }


def test_phrase_search_ignores_single_token_docs(spark):
    docs = spark.createDataFrame(
        [(1, "solo"), (2, "pair here"), (3, "")],
        "doc_id bigint, text string",
    )
    rows = phrase_search(docs, n_phrases=2).collect()
    assert {(r.phrase, r.doc_id) for r in rows} == {("pair here", 2)}
