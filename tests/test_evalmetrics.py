"""Pairwise eval metrics: BLEU-4 and exact isotonic regression.

The isotonic operator's distributed minimax formulation is pinned
against an independent sequential pool-adjacent-violators (PAV)
implementation over exact Fractions — the two agree bit-for-bit after
half-up micro rounding because rounding is monotone and the L2 isotonic
solution is unique.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import functions as F

from graph_database_spark.operators.evalmetrics import bleu_pairs, isotonic_fit


def _pav(points):
    """Sequential PAV over (score, n, pos) sorted by score; returns
    {score: Fraction fit}."""
    blocks = []  # [sum_pos, sum_n, [scores]]
    for score, n, pos in sorted(points):
        blocks.append([pos, n, [score]])
        while len(blocks) >= 2 and (
            Fraction(blocks[-2][0], blocks[-2][1])
            >= Fraction(blocks[-1][0], blocks[-1][1])
        ):
            b = blocks.pop()
            blocks[-1][0] += b[0]
            blocks[-1][1] += b[1]
            blocks[-1][2].extend(b[2])
    out = {}
    for pos, n, scores in blocks:
        for s in scores:
            out[s] = Fraction(pos, n)
    return out


def _micro_half_up(fr: Fraction) -> int:
    return (2 * fr.numerator * 1000000 + fr.denominator) // (
        2 * fr.denominator
    )


def test_isotonic_matches_sequential_pav(spark):
    # A deliberately violating sequence: dips and plateaus force pooling.
    pts = [
        (1, 4, 3),
        (2, 2, 0),
        (3, 5, 1),
        (4, 3, 3),
        (5, 1, 0),
        (6, 6, 5),
        (7, 2, 2),
        (8, 4, 1),
    ]
    rows = []
    for score, n, pos in pts:
        rows += [(score, True)] * pos + [(score, False)] * (n - pos)
    df = spark.createDataFrame(rows, "score int, label boolean")
    got = {
        r["score"]: (r["n"], r["pos"], r["fit_micro"])
        for r in isotonic_fit(df, "score", "label").collect()
    }
    want = _pav(pts)
    assert set(got) == {s for s, _, _ in pts}
    for score, n, pos in pts:
        assert got[score][0] == n and got[score][1] == pos
        assert got[score][2] == _micro_half_up(want[score]), score
    # Fits must be monotone non-decreasing in score.
    fits = [got[s][2] for s, _, _ in sorted(pts)]
    assert fits == sorted(fits)


def test_isotonic_already_monotone_is_identity(spark):
    rows = [(1, False), (1, False), (2, False), (2, True), (3, True)]
    df = spark.createDataFrame(rows, "score int, label boolean")
    got = {
        r["score"]: r["fit_micro"]
        for r in isotonic_fit(df, "score", "label").collect()
    }
    assert got == {1: 0, 2: 500000, 3: 1000000}


def test_gini_best_split_hand_case(spark):
    from graph_database_spark.operators.evalmetrics import gini_best_splits

    rows = (
        [(1, 1)] * 2 + [(1, 0)]          # x=1: n=3 pos=2
        + [(2, 0)] * 2                   # x=2: n=2 pos=0
        + [(3, 1)] * 2                   # x=3: n=2 pos=2
    )
    df = spark.createDataFrame(rows, "x int, y int")
    got = gini_best_splits(df, {"x": F.col("x")}, "y").collect()
    assert len(got) == 1
    r = got[0]
    # t=1: 2*1/3 + 2*2/4 = 1.667; t=2: 2*3/5 + 2*0/2 = 1.2 -> best t=2.
    assert (r["feature"], r["threshold"]) == ("x", 2)
    assert (r["n_l"], r["pos_l"], r["n_r"], r["pos_r"]) == (5, 2, 2, 2)


def test_jaro_winkler_textbook_values(spark):
    from graph_database_spark.operators.linkage import with_jaro_winkler

    def ref_jw(s1, s2):
        L1, L2 = len(s1), len(s2)
        w = max(0, max(L1, L2) // 2 - 1)
        ml, used = [], set()
        for i in range(L1):
            for j in range(max(0, i - w), min(L2, i + w + 1)):
                if j not in used and s2[j] == s1[i]:
                    ml.append(j)
                    used.add(j)
                    break
        m = len(ml)
        if m == 0:
            return 0
        t = sum(1 for a, b in zip(ml, sorted(ml)) if s2[a] != s2[b])
        lp = 0
        for p in range(1, min(4, L1, L2) + 1):
            if s1[:p] == s2[:p]:
                lp = p
        num_j = 2 * m * m * L2 + 2 * m * m * L1 + (2 * m - t) * L1 * L2
        den_j = 6 * m * L1 * L2
        num_w = (10 - lp) * num_j + lp * den_j
        den_w = 10 * den_j
        return (2 * num_w * 1000000 + den_w) // (2 * den_w)

    cases = [
        ("martha", "marhta"),
        ("dixon", "dicksonx"),
        ("jellyfish", "smellyfish"),
        ("abc", "xyz"),
        ("duane", "dwayne"),
        ("identical", "identical"),
    ]
    df = spark.createDataFrame(cases, "name_a string, name_b string")
    got = {
        (r["name_a"], r["name_b"]): r["jw_micro"]
        for r in with_jaro_winkler(df, "name_a", "name_b").collect()
    }
    for a, b in cases:
        assert got[(a, b)] == ref_jw(a, b), (a, b)
    # Spot-pin the classic published values.
    assert got[("martha", "marhta")] == 961111
    assert got[("abc", "xyz")] == 0
    assert got[("identical", "identical")] == 1000000


def test_qdigest_rank_error_and_compression(spark):
    from graph_database_spark.operators.qdigest import qdigest_build

    vals = [int((i * 37) % 1000) for i in range(2000)]
    df = spark.createDataFrame([(v,) for v in vals], "v int")
    nodes = qdigest_build(df, "v", levels=12, compression=32).collect()
    n = len(vals)
    # Counts are conserved and the digest is compressed.
    assert sum(r["cnt"] for r in nodes) == n
    assert len(nodes) < len(set(vals))
    # Any quantile answered from the digest is within n/32 rank error:
    # the estimate (first ub whose running count reaches the target)
    # must sit between the true values at ranks target +- n/32.
    srt = sorted(vals)
    byub = sorted(nodes, key=lambda r: (r["ub"], r["lvl"], r["idx"]))
    for q in (0.1, 0.5, 0.9, 0.99):
        target = max(1, int(q * n))
        run = 0
        est = None
        for r in byub:
            run += r["cnt"]
            if run >= target:
                est = r["ub"]
                break
        err = n // 32
        lo = srt[max(0, target - err - 1)]
        hi = srt[min(n - 1, target + err - 1)]
        assert lo <= est or est >= lo, q
        # est's TRUE rank (values <= est) within target +- n/32.
        import bisect

        true_rank = bisect.bisect_right(srt, est)
        assert target - err <= true_rank, (q, true_rank, target)


def test_soundex_classic_reference_codes(spark):
    from graph_database_spark.operators.linkage import with_soundex

    # The canonical published test vectors (US National Archives),
    # including the h/w-transparency cases.
    cases = {
        "robert": "R163",
        "rupert": "R163",
        "ashcraft": "A261",
        "ashcroft": "A261",
        "tymczak": "T522",
        "pfister": "P236",
        "honeyman": "H555",
        "jackson": "J250",
    }
    df = spark.createDataFrame([(n,) for n in cases], "name string")
    got = {
        r["name"]: r["soundex"]
        for r in with_soundex(df, "name").collect()
    }
    assert got == cases


def test_bleu_identical_pair_scores_zero_log(spark):
    text = "the red fox jumps over the lazy dog"
    df = spark.createDataFrame(
        [(10, text), (11, text)], "doc_id long, text string"
    )
    rows = bleu_pairs(df).collect()
    assert len(rows) == 1
    r = rows[0]
    # Identical docs: every precision is 1, BP = 1 -> log BLEU = 0.
    assert (r["doc_a"], r["doc_b"]) == (10, 11)
    assert r["c_len"] == 8 and r["r_len"] == 8
    assert (r["m1"], r["m2"], r["m3"], r["m4"]) == (8, 7, 6, 5)
    assert r["log_bleu_micro"] == 0


def test_bleu_hand_computed_pair(spark):
    import math

    cand = "a b c d e"
    ref = "a b c d f g"
    df = spark.createDataFrame(
        [(0, cand), (1, ref)], "doc_id long, text string"
    )
    r = bleu_pairs(df).collect()[0]
    assert (r["m1"], r["m2"], r["m3"], r["m4"]) == (4, 3, 2, 1)
    t = sum(
        round(math.log(m / (5 - n + 1)) * 1e6)
        for n, m in [(1, 4), (2, 3), (3, 2), (4, 1)]
    )
    quarter = (2 * (-t) + 4) // 8
    bp = (2 * (6 - 5) * 1000000 + 5) // (2 * 5)
    assert r["log_bleu_micro"] == -quarter - bp


def test_rouge_l_hand_case(spark):
    from graph_database_spark.operators.evalmetrics import rouge_l_pairs

    df = spark.createDataFrame(
        [(0, "a b c d e"), (1, "a c e b d")], "doc_id long, text string"
    )
    r = rouge_l_pairs(df).collect()[0]
    # LCS([a,b,c,d,e], [a,c,e,b,d]) = 3 (a c e); F1 = 2*3/10 = 0.6.
    assert r["lcs"] == 3
    assert r["rouge_l_f_micro"] == 600000


def test_rouge_l_python_dp_crosscheck(spark):
    from graph_database_spark.operators.evalmetrics import rouge_l_pairs

    a = "the red fox jumps over the lazy dog near the red barn".split()
    b = "a lazy dog sleeps near the big red barn over the hill".split()

    def lcs(x, y):
        prev = [0] * (len(y) + 1)
        for c in x:
            cur = [0]
            for j, t in enumerate(y, 1):
                cur.append(
                    prev[j - 1] + 1 if c == t else max(cur[-1], prev[j])
                )
            prev = cur
        return prev[-1]

    df = spark.createDataFrame(
        [(0, " ".join(a)), (1, " ".join(b))], "doc_id long, text string"
    )
    r = rouge_l_pairs(df).collect()[0]
    want = lcs(a, b)
    assert r["lcs"] == want
    assert r["rouge_l_f_micro"] == (
        2 * (2 * want * 1000000) + (len(a) + len(b))
    ) // (2 * (len(a) + len(b)))


def test_bleu_disjoint_pair_is_null(spark):
    df = spark.createDataFrame(
        [(0, "a b c d e"), (1, "v w x y z")], "doc_id long, text string"
    )
    r = bleu_pairs(df).collect()[0]
    assert (r["m1"], r["m2"], r["m3"], r["m4"]) == (0, 0, 0, 0)
    assert r["log_bleu_micro"] is None
