"""Rank-2 ALS: pure-Python replay of the integer training loop, plus
the fit property (predictions beat the zero model on training SSE)."""

from __future__ import annotations

import hashlib

from graph_database_spark.operators.als import (
    CLAMP,
    LAM,
    SCALE,
    als_user_factors,
)


def _h(salt_tag: str, key: int) -> int:
    hx = hashlib.md5(f"{salt_tag}|{key}".encode()).hexdigest()[:15]
    return int(hx, 16) % 201 - 100


def _tdiv(a: int, b: int) -> int:
    # Truncation toward zero, matching Spark div / DuckDB //.
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _solve(rows):
    # rows: list of (r, f1, f2) for one entity.
    n = len(rows)
    a11 = _tdiv(sum(f1 * f1 for _, f1, _ in rows), n) + LAM
    a12 = _tdiv(sum(f1 * f2 for _, f1, f2 in rows), n)
    a22 = _tdiv(sum(f2 * f2 for _, _, f2 in rows), n) + LAM
    b1 = _tdiv(sum(r * f1 for r, f1, _ in rows), n)
    b2 = _tdiv(sum(r * f2 for r, _, f2 in rows), n)
    det = max(a11 * a22 - a12 * a12, 1)
    out = []
    for num in (a22 * b1 - a12 * b2, a11 * b2 - a12 * b1):
        out.append(max(-CLAMP, min(CLAMP, _tdiv(SCALE * num, det))))
    return tuple(out)


def _replay(ratings):
    users = sorted({u for u, _, _ in ratings})
    items = sorted({p for _, p, _ in ratings})
    v = {p: (_h("alsa", p), _h("alsb", p)) for p in items}
    for rnd in range(2):
        u = {
            uu: _solve(
                [(r, *v[p]) for (a, p, r) in ratings if a == uu]
            )
            for uu in users
        }
        if rnd == 1:
            return u
        v = {
            pp: _solve(
                [(r, *u[a]) for (a, p, r) in ratings if p == pp]
            )
            for pp in items
        }


def test_als_matches_python_replay(spark):
    ratings = [
        (1, 10, 5), (1, 11, 1), (2, 10, 4), (2, 12, 2),
        (3, 11, 3), (3, 12, 5), (4, 10, 1), (4, 11, 4), (4, 12, 4),
    ]
    df = spark.createDataFrame(ratings, "u long, p long, r long")
    got = {
        r["fid"]: (r["f1"], r["f2"])
        for r in als_user_factors(df).collect()
    }
    assert got == _replay(ratings)


def test_als_beats_zero_model_on_training_sse(spark):
    # The trained factors must explain more of the ratings than
    # predicting 0 everywhere — a weak but implementation-revealing fit
    # property (sign errors, scale errors, and clamp saturation all
    # break it).
    ratings = [
        (u, p, ((u * 7 + p * 3) % 5) + 1)
        for u in range(1, 21)
        for p in range(100, 110)
    ]
    df = spark.createDataFrame(ratings, "u long, p long, r long")
    u = _replay(ratings)
    # Recompute item factors the same way the loop's last item solve
    # did, to score u2 against its matching v1.
    items = sorted({p for _, p, _ in ratings})
    v0 = {p: (_h("alsa", p), _h("alsb", p)) for p in items}
    u1 = {
        uu: _solve([(r, *v0[p]) for (a, p, r) in ratings if a == uu])
        for uu in sorted({a for a, _, _ in ratings})
    }
    v1 = {
        pp: _solve([(r, *u1[a]) for (a, p, r) in ratings if p == pp])
        for pp in items
    }
    got = {
        r["fid"]: (r["f1"], r["f2"])
        for r in als_user_factors(df).collect()
    }
    sse_zero = sum(r * r for _, _, r in ratings)
    sse = 0.0
    for a, p, r in ratings:
        pred = (
            got[a][0] * v1[p][0] + got[a][1] * v1[p][1]
        ) / 10000.0
        sse += (r - pred) ** 2
    assert sse < sse_zero
