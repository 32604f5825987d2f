"""Local replica of the driver's correctness gate.

Runs every catalog query on Spark and its DuckDB oracle side-by-side at
sf0.01 (row-count + schema-width + order-insensitive value hash), prints
one status line per query and a summary. Rows-only queries (no oracle)
are executed and checked for rows >= 0.

Usage: python scripts/check_correctness.py [--vintage] [--json PATH]
       [sf_dir] [query ...]

--json PATH (VERDICT r13 next-#2): also write a driver-artifact-shaped
JSON file (name -> {rows_match, schema_match, hash_match, spark_rows,
oracle_rows, err}, plus a "_meta" summary block) so the full-catalog
local gate leaves durable committed evidence (CORRECTNESS_LOCAL.json)
instead of a prose claim — for the never-driver-gated tail this run is
the only correctness check. The filename deliberately does not match
the CORRECTNESS_r*.json glob that drives the head-50 rotation.

--vintage (VERDICT r10 next-#8): instead of one run on sf_dir, sweep
the EVENTS-reading queries across every manufactured ts encoding the
driver has shipped or could ship — us (the source dir), us-aligned
nanos, genuine-sub-us-jitter nanos, and INT96 — so an
encoding-sensitive regression is caught locally before the driver's
gate sees it. Replicas are built once per sweep under /tmp via
scripts/make_nanos_replica.build_replica. Query args still filter.
"""

from __future__ import annotations

import hashlib
import sys
import time
import traceback

import os

import duckdb

# cwd-independent imports (CLAUDE.md: driver-spawned scripts don't
# inherit the repo cwd): repo root for graph_database_spark /
# __spark_entry__, scripts/ for make_nanos_replica.
_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)
sys.path.insert(0, ".")

from graph_database_spark.session import get_spark
from graph_database_spark.sources.parquet import TABLES
import __spark_entry__ as entry_mod


# DuckDB result types an oracle may NOT emit: the driver fetches through
# pandas/Arrow, where HUGEINT renders 39 -> 39.0 (float64) / decimal128
# while the local fetchall path renders 39 -> int 39. sum(BIGINT) returns
# HUGEINT, so any uncast aggregate/window-sum output column silently
# diverges at the driver only (the r9-r11 km_survival saga). Substring
# match also catches nested list element types (e.g. HUGEINT[]).
_BANNED_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")

_INT_TYPES = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT",
              "USMALLINT", "UINTEGER", "UBIGINT"}


def banned_type_cols(con, sql) -> list:
    """Plan-only (bind, no execution) scan of an oracle's output column
    types; returns [(col, type), ...] for banned types."""
    rel = con.sql(sql)
    return [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if any(b in str(t) for b in _BANNED_TYPES)
    ]


def df_rows(res):
    """Fetch a DuckDB result through the driver's pandas path and
    normalize back to python-native rows, using the declared column
    types to undo ONLY the lossless pandas conversions (NaN padding of
    nullable ints, datetime64 for DATE, numpy scalars/arrays). A
    HUGEINT/DECIMAL rendering divergence is deliberately NOT undone --
    but those are rejected by the type guard before we get here."""
    import math

    import numpy as np
    import pandas as pd

    decls = [str(t) for t in res.types]
    df = res.fetchdf()

    def conv(v, decl):
        if v is None or v is pd.NaT:
            return None
        if isinstance(v, np.ndarray):
            return v.tolist()
        if isinstance(v, float) and math.isnan(v):
            return None
        if isinstance(v, np.generic):
            v = v.item()
        if isinstance(v, pd.Timestamp):
            v = v.to_pydatetime()
        if isinstance(v, __import__("datetime").datetime) and decl == "DATE":
            v = v.date()
        if isinstance(v, float) and decl in _INT_TYPES and v.is_integer():
            v = int(v)
        return v

    return [
        tuple(conv(v, d) for v, d in zip(row, decls))
        for row in df.itertuples(index=False, name=None)
    ]


def value_hash(rows, colnames) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    canon = sorted(
        "|".join(_norm(row[i]) for i in order) for row in rows
    )
    h = hashlib.sha256()
    for line in canon:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def _norm(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def run_gate(
    spark, sf_dir: str, only: set[str], label: str = "", results=None
) -> tuple:
    """One full gate pass over ``sf_dir``; returns (pass, rows_only,
    fail, failures). When ``results`` is a dict, a driver-artifact-shaped
    record is stored per query."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    failures = []
    tag = f" [{label}]" if label else ""

    def record(name, **kw):
        if results is not None:
            rec = {
                "rows_match": None,
                "schema_match": None,
                "hash_match": None,
                "spark_rows": None,
                "oracle_rows": None,
                "err": None,
            }
            rec.update(kw)
            results[name] = rec

    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
            elapsed = time.time() - t0
        except Exception:
            print(f"FAIL  {name}{tag}: spark raised")
            traceback.print_exc()
            n_fail += 1
            failures.append(name)
            record(name, err="spark_raised")
            continue
        if name not in oracles:
            print(
                f"ROWS  {name}{tag}: {len(rows)} rows in {elapsed:.1f}s"
                " (rows-only)"
            )
            n_rows_only += 1
            record(name, spark_rows=len(rows), err="no_oracle")
            continue
        try:
            bad = banned_type_cols(con, oracles[name])
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            # Driver-fetch-path parity (VERDICT r11 #3): re-fetch through
            # pandas and hash again; a fetchall/fetchdf divergence is a
            # rendering bug the driver WILL see even when fetchall agrees
            # with Spark.
            drows = df_rows(con.sql(oracles[name]))
        except Exception:
            print(f"FAIL  {name}{tag}: duckdb oracle raised")
            traceback.print_exc()
            n_fail += 1
            failures.append(name)
            record(name, spark_rows=len(rows), err="oracle_raised")
            continue
        if bad:
            print(
                f"FAIL  {name}{tag}: banned oracle output type(s) "
                + ", ".join(f"{c}:{t}" for c, t in bad)
                + " (driver pandas fetch renders these differently)"
            )
            n_fail += 1
            failures.append(name)
            record(name, spark_rows=len(rows), err="banned_oracle_type")
            continue
        ok_rows = len(rows) == len(orows)
        ok_width = len(cols) == len(ocols)
        hs, ho = value_hash(rows, cols), value_hash(orows, ocols)
        hd = value_hash(drows, ocols)
        ok_hash = hs == ho == hd
        record(
            name,
            rows_match=ok_rows,
            schema_match=ok_width,
            hash_match=ok_hash,
            spark_rows=len(rows),
            oracle_rows=len(orows),
        )
        if ok_rows and ok_width and ok_hash:
            print(f"PASS  {name}{tag}: {len(rows)} rows in {elapsed:.1f}s")
            n_pass += 1
        else:
            print(
                f"FAIL  {name}{tag}: rows {len(rows)}/{len(orows)}"
                f" width {len(cols)}/{len(ocols)} hash {hs}/{ho}"
                + (f" dfhash {hd}" if hd != ho else "")
            )
            n_fail += 1
            failures.append(name)
    return n_pass, n_rows_only, n_fail, failures


def _events_queries() -> set[str]:
    """Oracle-backed queries whose SQL reads the events table (the
    ts-encoding-sensitive family the --vintage sweep targets)."""
    import re

    return {
        name
        for name, sql in entry_mod.oracle_sql().items()
        if re.search(r"\bevents\b", sql)
    }


def main() -> int:
    args = [a for a in sys.argv[1:]]
    vintage = "--vintage" in args
    if vintage:
        args.remove("--vintage")
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    spark = get_spark("correctness-check")

    if not vintage:
        results = {} if json_path else None
        t0 = time.time()
        n_pass, n_rows_only, n_fail, failures = run_gate(
            spark, sf_dir, only, results=results
        )
        print(
            f"\nsummary: {n_pass} pass, {n_rows_only} rows-only,"
            f" {n_fail} fail"
            + (f" -- failures: {', '.join(failures)}" if failures else "")
        )
        if json_path:
            import datetime
            import json

            results["_meta"] = {
                "sf_dir": sf_dir,
                "n_pass": n_pass,
                "n_rows_only": n_rows_only,
                "n_fail": n_fail,
                "failures": failures,
                "duration_sec": round(time.time() - t0, 1),
                "utc": datetime.datetime.now(
                    datetime.timezone.utc
                ).strftime("%Y-%m-%dT%H:%M:%SZ"),
            }
            with open(json_path, "w") as f:
                json.dump(results, f, indent=1)
                f.write("\n")
            print(f"wrote {json_path}")
        return 1 if n_fail else 0

    from make_nanos_replica import build_replica

    family = _events_queries()
    if only:
        family &= only
    base = os.path.basename(sf_dir.rstrip("/"))
    sweeps = [("us", sf_dir)]
    for mode in ("ns-aligned", "ns", "int96"):
        dest = f"/tmp/{base}_vintage_{mode.replace('-', '_')}"
        build_replica(sf_dir, dest, mode)
        sweeps.append((mode, dest))
    total_fail = 0
    lines = []
    for label, d in sweeps:
        n_pass, n_rows_only, n_fail, failures = run_gate(
            spark, d, family, label
        )
        total_fail += n_fail
        lines.append(
            f"  {label:<10} {n_pass} pass, {n_rows_only} rows-only,"
            f" {n_fail} fail"
            + (f" -- {', '.join(failures)}" if failures else "")
        )
    print(f"\nvintage sweep over {len(family)} events queries:")
    for line in lines:
        print(line)
    return 1 if total_fail else 0


if __name__ == "__main__":
    sys.exit(main())
