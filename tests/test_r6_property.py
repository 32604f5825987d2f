"""Randomized property tests for the round-6 operators: a pure-Python
reference implementation vs the Spark operator on hypothesis-generated
inputs. The fixtures in test_r6_operators.py pin each semantics quirk
once; these pin them under composition (overlapping spans, duplicate
values, uneven gaps). Examples are capped low: every example runs
Spark jobs.
"""

from __future__ import annotations

import statistics
from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings, strategies as st

from graph_database_spark.operators.dedup import duplicate_span_coverage
from graph_database_spark.operators.events import burstiness
from graph_database_spark.operators.temporal import rolling_median

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _ref_span_coverage(texts, n):
    """Brute-force reference: hash spans with a dict, union positions."""
    from collections import Counter

    spans = Counter()
    per_doc = {}
    for i, t in enumerate(texts):
        toks = t.split(" ")
        per_doc[i] = toks
        for j in range(len(toks) - n + 1):
            spans[" ".join(toks[j : j + n])] += 1
    out = {}
    for i, toks in per_doc.items():
        covered = set()
        dup = 0
        for j in range(len(toks) - n + 1):
            if spans[" ".join(toks[j : j + n])] > 1:
                dup += 1
                covered.update(range(j, j + n))
        out[i] = (len(toks), dup, len(covered))
    return out


@st.composite
def corpora(draw):
    vocab = ["a", "b", "c", "d"]
    n_docs = draw(st.integers(2, 5))
    return [
        " ".join(
            draw(st.sampled_from(vocab)) for _ in range(draw(st.integers(2, 12)))
        )
        for _ in range(n_docs)
    ]


@given(corpora())
@SLOW
def test_span_coverage_matches_bruteforce(spark, texts):
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_spans"], r["covered_tokens"])
        for r in duplicate_span_coverage(docs, n=2).collect()
    }
    assert got == _ref_span_coverage(texts, 2)


@given(st.lists(st.integers(0, 500), min_size=1, max_size=12))
@SLOW
def test_rolling_median_matches_statistics(spark, vals):
    t0 = datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(1, i, t0 + timedelta(minutes=i), float(v)) for i, v in enumerate(vals)],
        "user_id long, event_id long, ts timestamp, value double",
    )
    got = {
        r["event_id"]: r["roll_median"]
        for r in rolling_median(ev, window_rows=5).collect()
    }
    for i in range(len(vals)):
        window = vals[max(0, i - 4) : i + 1]
        assert got[i] == statistics.median(window), (i, window)


@given(st.lists(st.integers(1, 10000), min_size=2, max_size=10))
@SLOW
def test_burstiness_matches_numpy_moments(spark, gaps):
    t0 = datetime(2024, 1, 1)
    ts, cur = [t0], t0
    for g in gaps:
        cur = cur + timedelta(seconds=g)
        ts.append(cur)
    ev = spark.createDataFrame(
        [(1, i, t) for i, t in enumerate(ts)],
        "user_id long, event_id long, ts timestamp",
    )
    r = burstiness(ev).collect()[0].asDict()
    mu = statistics.mean(gaps)
    var = statistics.pvariance(gaps)
    sigma = var ** 0.5
    assert r["n_gaps"] == len(gaps)
    assert r["mean_gap"] == round(mu, 6)
    assert abs(r["burstiness"] - (sigma - mu) / (sigma + mu)) < 2e-6
