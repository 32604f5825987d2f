"""Gate the events family on the TIMESTAMP(NANOS) vintage (VERDICT r9 #2).

The driver's events.parquet has shipped in two physical ts encodings;
the local testdata is us-only, so until r10 the local gate could never
see what a nanos-vintage driver file does to a query — the r9
km_survival red row. This test manufactures the missing vintage
(scripts/make_nanos_replica.py: ts re-encoded as timestamp[ns] with a
deterministic sub-microsecond jitter that never crosses a us boundary)
and, for a representative slice of ts-sensitive queries, asserts

  1. Spark result == DuckDB oracle on the SAME nanos dir (the driver's
     gate under a nanos vintage), and
  2. the nanos-dir Spark result == the us-dir Spark result (the jitter
     must be invisible through the us-truncating load path).

The full 74-query events-family sweep runs out-of-band
(`python scripts/make_nanos_replica.py && scripts/check_correctness.py
/tmp/sf0.01_nanos <events queries>` — r10: 73 pass / 1 rows-only / 0
fail); this pytest pins the boundary-hazard classes permanently:
timestamp cutoffs (km_survival), epoch-us band joins (band_join_pairs),
interval/resample grids (events_resample), session gaps
(events_sessionize), concurrency sweeps (max_concurrency), hour
truncation (events_hourly).
"""

from __future__ import annotations

import hashlib
import subprocess
import sys

import duckdb
import pytest

from graph_database_spark import catalog

SF_US = "/root/testdata/sf0.001"

GATED = [
    "km_survival",
    "band_join_pairs",
    "events_resample",
    "events_sessionize",
    "max_concurrency",
    "events_hourly",
]


@pytest.fixture(scope="module", params=["ns", "int96"])
def sf_nanos(tmp_path_factory, request):
    """Both non-us encodings the driver could ship: TIMESTAMP(NANOS)
    (Spark's nanosAsLong fallback path) and INT96 (Spark's native
    legacy read path, DuckDB's TIMESTAMP_NS read) — r11, VERDICT r10
    next-#8."""
    mode = request.param
    dest = tmp_path_factory.mktemp("vintage") / f"sf0.001_{mode}"
    subprocess.run(
        [
            sys.executable,
            "scripts/make_nanos_replica.py",
            SF_US,
            str(dest),
            mode,
        ],
        check=True,
        cwd="/root/repo",
    )
    return str(dest)


def _hash(rows, colnames) -> str:
    def norm(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, bool):
            return str(int(v))
        return str(v)

    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    canon = sorted("|".join(norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in canon:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


@pytest.mark.parametrize("name", GATED)
def test_nanos_vintage(spark, sf_nanos, name):
    fn = catalog.QUERIES[name]
    df_n = fn(spark, sf_nanos)
    rows_n = [tuple(r) for r in df_n.collect()]
    h_spark_nanos = _hash(rows_n, df_n.columns)

    con = duckdb.connect()
    from graph_database_spark.sources.parquet import TABLES

    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{sf_nanos}/{t}.parquet')"
        )
    res = con.execute(catalog.ORACLES[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert len(rows_n) == len(orows), f"{name}: row count diverged on nanos"
    assert h_spark_nanos == _hash(orows, ocols), (
        f"{name}: spark vs oracle hash diverged on the nanos vintage"
    )

    df_u = fn(spark, SF_US)
    rows_u = [tuple(r) for r in df_u.collect()]
    assert h_spark_nanos == _hash(rows_u, df_u.columns), (
        f"{name}: nanos-vintage result differs from us-vintage result"
    )
