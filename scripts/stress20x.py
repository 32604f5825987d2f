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
    "orders", "lineitem", "events",
)
# Tables replicated 20x with id-shifted keys; everything else symlinks
# to the 1x source. embeddings joined documents here in r14 so the
# ann_ivfpq ADC readout has a corpus-scaled stress row (VERDICT r13 #5).
REPLICATED = {"documents": "doc_id", "embeddings": "vec_id"}


def _replicate_20x(src: str, dest: str, table: str, id_col: str) -> None:
    out = os.path.join(dest, f"{table}.parquet")
    # Rebuild when absent OR older than the source parquet (ADVICE r12):
    # a stale 20x replica of a since-regenerated source dir would
    # silently mix vintages — the same stale-replica lesson the symlink
    # branch below already applies unconditionally.
    src_parquet = os.path.join(src, f"{table}.parquet")
    stale = os.path.exists(out) and (
        os.path.getmtime(out) < os.path.getmtime(src_parquet)
    )
    if stale:
        os.remove(out)
    if not os.path.exists(out):
        duckdb.connect().execute(
            f"""
            COPY (
              SELECT {id_col} + 10000000 * k AS {id_col},
                     * EXCLUDE ({id_col})
              FROM read_parquet('{src_parquet}'),
                   UNNEST(range(0, 20)) u(k)
            ) TO '{out}' (FORMAT PARQUET)
            """
        )


def build_20x_documents(src: str, dest: str) -> str:
    os.makedirs(dest, exist_ok=True)
    for table, id_col in REPLICATED.items():
        _replicate_20x(src, dest, table, id_col)
    for t in TABLES_1X:
        link = os.path.join(dest, f"{t}.parquet")
        # Unconditional recreate — the make_nanos_replica stale-symlink
        # lesson (ADVICE r11).
        if os.path.islink(link) or os.path.exists(link):
            os.remove(link)
        os.symlink(os.path.join(src, f"{t}.parquet"), link)
    return dest


def stress_minhash_index_lifecycle(spark, src: str, dest: str) -> None:
    """Time the persisted-index lifecycle (build -> append -> probe) at
    1x and 20x corpus scale (VERDICT r13 #5). The batch is a FIXED 500
    documents at both scales (id-shifted to honor append's disjoint-id
    precondition), so the append and probe timings isolate how corpus
    growth affects a constant unit of incoming work: append signs only
    the batch (corpus-size-independent by construction); probe's batch
    side shuffles onto the index's key buckets, whose occupancy grows
    20x — near-flat probe time is the bucketed-index scaling claim."""
    import shutil

    from graph_database_spark.sinks.ann import (
        append_minhash_index,
        build_minhash_index,
        probe_minhash_index,
    )
    from graph_database_spark.sources.parquet import load_table

    for label, d in (("1x", src), ("20x", dest)):
        docs = load_table(spark, d, "documents")
        app_batch = docs.limit(500).selectExpr(
            "doc_id + 900000000 AS doc_id", "text"
        ).localCheckpoint()
        probe_batch = docs.limit(500).selectExpr(
            "doc_id + 950000000 AS doc_id", "text"
        ).localCheckpoint()
        path = f"/tmp/stress_mh_index_{label}"
        shutil.rmtree(path, ignore_errors=True)
        table = f"stress_mh_{label}"
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        for step, fn in (
            ("build", lambda: build_minhash_index(docs, table, path)),
            ("append", lambda: append_minhash_index(app_batch, path)),
            (
                "probe",
                lambda: probe_minhash_index(
                    spark, path, probe_batch
                ).count(),
            ),
        ):
            t0 = time.time()
            fn()
            print(
                f"RESULT minhash_index_lifecycle/{step} {label}:"
                f" {time.time() - t0:.1f} s",
                flush=True,
            )


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
        if name == "minhash_index_lifecycle":
            stress_minhash_index_lifecycle(spark, src, dest)
            continue
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
