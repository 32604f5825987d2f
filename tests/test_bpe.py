"""BPE merge-induction tests (operators/bpe.py)."""

from __future__ import annotations

from graph_database_spark.operators.bpe import bpe_merge_table


def test_merge_rounds_on_fixture(spark):
    # corpus: 'aaab' x3, 'ab' x2 -> round 1 pairs: (a,a)x2 per 'aaab'
    # word... pair counts weighted by word frequency:
    #   (a,a): 2 occurrences in 'aaab' * 3 = 6
    #   (a,b): 1 in 'aaab' * 3 + 1 in 'ab' * 2 = 5
    # round 1 merges (a,a); greedy on 'aaab' -> [aa, a, b]
    # round 2 pairs: (aa,a) 3, (a,b) 3+2=5 -> merges (a,b)
    docs = spark.createDataFrame(
        [(i, "aaab") for i in range(3)] + [(10 + i, "ab") for i in range(2)],
        "doc_id long, text string",
    )
    rows = [tuple(r) for r in bpe_merge_table(docs, n_merges=2).collect()]
    assert rows[0] == (1, "a", "a", 6)
    assert rows[1] == (2, "a", "b", 5)


def test_greedy_run_parity(spark):
    # 'aaaa': greedy left-to-right on pair (a,a) merges positions (0,1)
    # and (2,3) -> round 2's top pair becomes (aa,aa)
    docs = spark.createDataFrame([(1, "aaaa aaaa")], "doc_id long, text string")
    rows = [tuple(r) for r in bpe_merge_table(docs, n_merges=2).collect()]
    # 'aaaa' has adjacent pairs (a,a) at i=1,2,3 and the word occurs
    # twice in the corpus -> pair count 6 (counts are PRE-merge raw
    # adjacency, weighted by word frequency)
    assert rows[0] == (1, "a", "a", 6)
    assert rows[1][:3] == (2, "aa", "aa")
