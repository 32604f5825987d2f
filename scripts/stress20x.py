"""Reproducible 20x stress harness (the SCALE.md row generator).

Builds the id-shifted 20x documents replica (texts duplicated 20x with
shifted doc_id — duplicate spans densify ~90x, the documented
suffix-array caveat; every other table symlinks to the 1x source) and
times the named catalog queries at 1x (min-of-2 warm) and 20x
(min-of-1), printing one RESULT line each. Prior rounds did this ad
hoc; committing it makes every SCALE.md row reproducible:

    PYTHONPATH=/root/repo python scripts/stress20x.py gopher_repetition ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES_1X = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "embeddings",
)


def build_20x_documents(src: str, dest: str) -> str:
    os.makedirs(dest, exist_ok=True)
    out = os.path.join(dest, "documents.parquet")
    # Rebuild when absent OR older than the source parquet (ADVICE r12):
    # a stale 20x replica of a since-regenerated source dir would
    # silently mix vintages — the same stale-replica lesson the symlink
    # branch below already applies unconditionally.
    src_parquet = os.path.join(src, "documents.parquet")
    stale = os.path.exists(out) and (
        os.path.getmtime(out) < os.path.getmtime(src_parquet)
    )
    if stale:
        os.remove(out)
    if not os.path.exists(out):
        duckdb.connect().execute(
            f"""
            COPY (
              SELECT doc_id + 10000000 * k AS doc_id, * EXCLUDE (doc_id)
              FROM read_parquet('{src}/documents.parquet'),
                   UNNEST(range(0, 20)) u(k)
            ) TO '{out}' (FORMAT PARQUET)
            """
        )
    for t in TABLES_1X:
        link = os.path.join(dest, f"{t}.parquet")
        # Unconditional recreate — the make_nanos_replica stale-symlink
        # lesson (ADVICE r11).
        if os.path.islink(link) or os.path.exists(link):
            os.remove(link)
        os.symlink(os.path.join(src, f"{t}.parquet"), link)
    return dest


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: stress20x.py <query> [query ...]", file=sys.stderr)
        return 2
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    dest = build_20x_documents(
        src, f"/tmp/{os.path.basename(src.rstrip('/'))}_x20"
    )
    from graph_database_spark import catalog
    from graph_database_spark.session import get_spark

    spark = get_spark("stress20x")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn = catalog.QUERIES[name]
        for label, d, reps in (("1x", src, 2), ("20x", dest, 1)):
            best = None
            for _ in range(reps):
                t0 = time.time()
                n = fn(spark, d).count()
                w = time.time() - t0
                best = w if best is None else min(best, w)
                for rdd in list(
                    spark.sparkContext._jsc.getPersistentRDDs().values()
                ):
                    rdd.unpersist()
            print(f"RESULT {name} {label}: {best:.1f} s, {n} rows", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
