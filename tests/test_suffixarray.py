"""Suffix-array ExactSubstr: hand-built duplicate geometry + the
fixed-n blind-spot the operator exists to close."""

from __future__ import annotations

from graph_database_spark.operators.suffixarray import suffix_lcp_dedup

SHARED = "the quick brown fox jumps over the lazy dog near the river bank"
UNIQUE_A = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
UNIQUE_B = "one two three four five six seven eight nine ten eleven"


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: (r["n_dup_starts"], r["max_lcp"], r["n_cross_doc"])
        for r in suffix_lcp_dedup(df, **kw).collect()
    }


def test_cross_doc_shared_sentence_detected(spark):
    got = _run(
        spark,
        [
            (1, f"{UNIQUE_A} {SHARED}"),
            (2, f"{SHARED} {UNIQUE_B}"),
            (3, UNIQUE_B + " twelve"),
        ],
        min_match=30,
        ext_cap=64,
    )
    # Docs 1 and 2 share a 63-char sentence: every token-start suffix
    # inside it with >= 30 chars remaining matches across docs.
    assert 1 in got and 2 in got
    n1, m1, x1 = got[1]
    n2, m2, x2 = got[2]
    assert m1 >= 60 and m2 >= 60  # full shared sentence, under the cap
    assert x1 == n1 and x2 == n2  # every dup start is cross-doc
    assert n1 >= 5 and n2 >= 5
    # Doc 3 shares only ~55 chars with doc 2's tail... which is also a
    # genuine >= 30-char duplicate — it must be flagged too, and doc 2
    # must see it (UNIQUE_B prefix).
    assert 3 in got


def test_within_doc_repetition_not_cross(spark):
    got = _run(
        spark,
        [(7, f"{SHARED} {UNIQUE_A} {SHARED}"), (8, UNIQUE_B)],
        min_match=30,
        ext_cap=64,
    )
    assert 7 in got and 8 not in got
    n, m, x = got[7]
    assert n >= 5 and m >= 60
    assert x == 0  # self-repetition only — no cross-doc starts


def test_below_threshold_invisible(spark):
    # 20-char overlap < min_match=30: the fixed-n=8-token span detector
    # would still need tuning to see it; the suffix array simply
    # reports nothing at this threshold.
    got = _run(
        spark,
        [(1, "shared twenty chars " + UNIQUE_A),
         (2, "shared twenty chars " + UNIQUE_B)],
        min_match=30,
        ext_cap=64,
    )
    assert got == {}


def test_max_lcp_capped_at_ext_cap(spark):
    long_shared = " ".join(["commonword"] * 12)  # 131 chars shared
    got = _run(
        spark,
        [(1, long_shared + " tailone"), (2, long_shared + " tailtwo")],
        min_match=30,
        ext_cap=64,
    )
    assert got[1][1] == 64 and got[2][1] == 64


def test_cross_doc_exact_beats_two_neighbor_lower_bound(spark):
    # The sandwiched case (ADVICE r10 / VERDICT r11 #6): doc 9 repeats
    # SHARED three times, doc 10 once. The identical 64-char suffixes
    # cluster in sort order with doc 9's copies adjacent to each other
    # (ties break by doc_id, pos), so a middle doc-9 start has BOTH
    # sort-neighbors same-doc — invisible to the two-neighbor lower
    # bound — while its exact nearest-other-doc scan reaches doc 10's
    # identical suffix (cross LCP = 64).
    from graph_database_spark.operators.suffixarray import suffix_cross_doc

    df = spark.createDataFrame(
        [
            (9, f"{SHARED} {UNIQUE_A} {SHARED} {UNIQUE_B} {SHARED}"),
            (10, f"{SHARED} {UNIQUE_B}"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in suffix_cross_doc(df, min_match=30, ext_cap=64).collect()
    }
    assert set(got) == {9, 10}
    for d in got.values():  # exact dominates the lower bound everywhere
        assert d["n_cross_exact"] >= d["n_cross_lb"]
    assert got[9]["n_cross_exact"] > got[9]["n_cross_lb"]
    assert got[9]["max_cross_lcp"] >= 60
    assert got[10]["n_cross_exact"] >= 1
