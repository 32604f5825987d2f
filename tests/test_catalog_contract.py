"""Driver-contract guards: catalog wiring + oracle SQL validity.

These catch contract mistakes in seconds that otherwise only surface in
the minutes-long correctness gate: a query declared without an oracle or
rows-only marker, an oracle for a nonexistent query, or oracle SQL that
DuckDB cannot even bind (EXPLAIN against the real sf0.001 tables — no
execution, so the whole catalog checks in a few seconds).
"""

from __future__ import annotations

import os

import duckdb
import pytest

from graph_database_spark import catalog

SF_DIR = "/root/testdata/sf0.001"


def test_every_query_is_oracled_or_rows_only():
    missing = [
        name
        for name in catalog.QUERIES
        if catalog.ORACLES.get(name) is None and name not in catalog.ROWS_ONLY
    ]
    assert not missing, f"queries with neither oracle nor ROWS_ONLY: {missing}"


def test_rows_only_and_oracles_reference_real_queries():
    assert catalog.ROWS_ONLY <= set(catalog.QUERIES)
    stray = set(catalog.ORACLES) - set(catalog.QUERIES)
    assert not stray, f"oracles without a queries() entry: {stray}"


def test_rows_only_queries_carry_no_oracle():
    # A query in both sets would silently downgrade the driver's check.
    both = {n for n in catalog.ROWS_ONLY if catalog.ORACLES.get(n) is not None}
    assert not both, f"ROWS_ONLY queries that also have oracles: {both}"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_all_oracle_sql_binds_in_duckdb():
    con = duckdb.connect()
    from graph_database_spark.sources.parquet import TABLES

    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    bad = {}
    for name, sql in catalog.oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as exc:  # noqa: BLE001 — collect all failures
            bad[name] = str(exc).splitlines()[0]
    assert not bad, f"oracle SQL failed to bind: {bad}"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_no_oracle_emits_driver_hostile_types():
    """No oracle output column may be HUGEINT/UHUGEINT/DECIMAL.

    DuckDB widens sum(BIGINT) -> HUGEINT (including window sums), and the
    driver's pandas/Arrow fetch renders HUGEINT 39 as 39.0/decimal128
    while the local fetchall path renders int 39 — rows match, width
    matches, value-hash diverges at the driver only (the r9-r11
    km_survival saga; root-caused in VERDICT r11). Plan-only: binds each
    oracle and inspects declared output types, no execution.
    """
    con = duckdb.connect()
    from graph_database_spark.sources.parquet import TABLES

    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    banned = ("HUGEINT", "UHUGEINT", "DECIMAL")
    bad = {}
    for name, sql in catalog.oracle_sql().items():
        try:
            rel = con.sql(sql)
            hits = [
                f"{c}:{t}"
                for c, t in zip(rel.columns, rel.types)
                if any(b in str(t) for b in banned)
            ]
        except Exception as exc:  # noqa: BLE001 — bind failures -> other test
            hits = []
        if hits:
            bad[name] = hits
    assert not bad, (
        "oracle output columns the driver's pandas fetch mis-renders "
        f"(CAST them to BIGINT/DOUBLE): {bad}"
    )
