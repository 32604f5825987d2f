"""Local replica of the driver's correctness gate.

Runs every catalog query on Spark and its DuckDB oracle side-by-side at
sf0.01 (row-count + schema-width + order-insensitive value hash), prints
one status line per query and a summary. Rows-only queries (no oracle)
are executed and checked for rows >= 0.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time
import traceback

import duckdb

sys.path.insert(0, ".")

from graph_database_spark.session import get_spark
from graph_database_spark.sources.parquet import TABLES
import __spark_entry__ as entry_mod


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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    failures = []
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
            print(f"FAIL  {name}: spark raised")
            traceback.print_exc()
            n_fail += 1
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(rows)} rows in {elapsed:.1f}s (rows-only)")
            n_rows_only += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception:
            print(f"FAIL  {name}: duckdb oracle raised")
            traceback.print_exc()
            n_fail += 1
            failures.append(name)
            continue
        ok_rows = len(rows) == len(orows)
        ok_width = len(cols) == len(ocols)
        hs, ho = value_hash(rows, cols), value_hash(orows, ocols)
        ok_hash = hs == ho
        if ok_rows and ok_width and ok_hash:
            print(f"PASS  {name}: {len(rows)} rows in {elapsed:.1f}s")
            n_pass += 1
        else:
            print(
                f"FAIL  {name}: rows {len(rows)}/{len(orows)}"
                f" width {len(cols)}/{len(ocols)} hash {hs}/{ho}"
            )
            n_fail += 1
            failures.append(name)
    print(
        f"\nsummary: {n_pass} pass, {n_rows_only} rows-only, {n_fail} fail"
        + (f" -- failures: {', '.join(failures)}" if failures else "")
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
