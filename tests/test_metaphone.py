"""Double Metaphone: published canonical vectors + blocking sanity +
Spark/DuckDB rule-table parity (the oracle replays the SAME generated
CASE, so parity here pins the recursive-CTE plumbing, not a second rule
table)."""

from __future__ import annotations

import duckdb

from graph_database_spark.operators.metaphone import (
    dm_init_sql,
    dm_rule_case_sql,
    with_double_metaphone,
)

# Published canonical vectors for the Philips (2000) algorithm,
# 4-char truncated (primary, secondary); secondary equals primary when
# no alternate rule fires. Sources: the original CUJ article examples
# and the widely-reproduced reference test suites.
VECTORS = [
    ("smith", "SM0", "XMT"),        # initial S+M -> S/X, TH -> 0/T
    ("schmidt", "XMT", "SMT"),      # SCH- -> X/S, DT -> T
    ("jose", "HS", "HS"),           # bare JOSE -> H (padded-space rule)
    ("michael", "MKL", "MXL"),      # -CHAE- -> K/X
    ("katherine", "K0RN", "KTRN"),  # TH -> 0/T
    ("sugar", "XKR", "SKR"),        # initial SUGAR -> X/S
    ("fisher", "FXR", "FXR"),       # SH -> X
    ("cabrillo", "KPRL", "KPR"),    # Spanish -ILLO: LL silent in alt
    ("gallegos", "KLKS", "KKS"),    # -ALLE- + -OS ending
    ("wright", "RT", "RT"),         # WR- -> R, -GH- silent after I
    ("knight", "NT", "NT"),         # initial KN- skips K
    ("xavier", "SF", "SFR"),        # initial X -> S, French final -IER
    ("caesar", "SSR", "SSR"),       # CAESAR special case
    ("school", "SKL", "SKL"),       # SCH+OO -> SK
    ("cherry", "XR", "XR"),         # initial CH -> X
    ("john", "JN", "AN"),           # initial J -> J/A, H non-vocalic
    ("jankelowicz", "JNKL", "ANKL"),  # -WICZ -> TS/FX (pre-truncation)
    ("almond", "ALMN", "ALMN"),     # testdata domain word
]


def test_double_metaphone_canonical_vectors(spark):
    df = spark.createDataFrame([(w,) for w, _, _ in VECTORS], "w string")
    got = {
        r["w"]: (r["dm_primary"], r["dm_secondary"])
        for r in with_double_metaphone(df, "w").collect()
    }
    for w, pri, sec in VECTORS:
        assert got[w] == (pri, sec), (w, got[w], (pri, sec))


def test_double_metaphone_blocks_similar_sounding_names(spark):
    # The blocking property: spelling variants share a primary key.
    pairs = [
        ("smith", "smyth"),
        ("johnson", "jonson"),
        ("catherine", "katherine"),
    ]
    words = [(w,) for p in pairs for w in p]
    df = spark.createDataFrame(words, "w string")
    got = {
        r["w"]: r["dm_primary"]
        for r in with_double_metaphone(df, "w").collect()
    }
    for a, b in pairs:
        assert got[a] == got[b], (a, b, got[a], got[b])


def test_duckdb_recursive_replay_matches_vectors():
    # The oracle's recursive-CTE plumbing over the shared rule CASE.
    p0, c0 = dm_init_sql("w")
    rule = dm_rule_case_sql("w", "n", "p")
    vals = ", ".join(f"('{w}')" for w, _, _ in VECTORS)
    sql = f"""
WITH RECURSIVE base AS (
    SELECT nm, upper(nm) || '     ' AS w, length(nm) AS n
    FROM (VALUES {vals}) t(nm)
),
f AS (
    SELECT nm, w, n, {p0} AS p, {c0} AS pri, {c0} AS sec FROM base
    UNION ALL
    SELECT nm, w, n,
           p + CAST(substring(r, 1, 1) AS INT),
           pri || replace(substring(r, 2, 2), '.', ''),
           sec || replace(substring(r, 4, 2), '.', '')
    FROM (SELECT *, {rule} AS r FROM f WHERE p <= n)
)
SELECT nm, substring(pri, 1, 4) AS pri, substring(sec, 1, 4) AS sec
FROM f WHERE p > n
"""
    got = {
        nm: (pri, sec) for nm, pri, sec in duckdb.sql(sql).fetchall()
    }
    for w, pri, sec in VECTORS:
        assert got[w] == (pri, sec), (w, got[w], (pri, sec))
