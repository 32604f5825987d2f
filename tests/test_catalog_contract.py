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
