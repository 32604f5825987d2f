"""Versioned parquet snapshots — reproducible dataset pinning.

A training run must be able to name the EXACT corpus it saw; rewriting
one parquet directory in place destroys that. This sink gives the
minimal lakehouse contract with nothing but parquet + one JSON file:
each write lands under ``path/v=N/`` and atomically publishes N by
rewriting ``path/_versions.json`` (the manifest is the commit point —
a crashed write leaves an unreferenced directory, never a torn table).
Readers resolve "latest" or any pinned version from the manifest, so
yesterday's training job replays against yesterday's snapshot while
today's write proceeds — snapshot isolation by immutability.

Scale posture: data files are written by executors exactly as the plain
sink would; only the manifest touch is driver-side (tiny). Retention is
explicit (``vacuum`` keeps the last K versions) — automatic deletion
under concurrent readers is a policy decision this layer refuses to
guess at.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "write_version",
    "read_version",
    "list_versions",
    "vacuum",
    "merge_upsert",
]

_MANIFEST = "_versions.json"


def _load_manifest(path: str) -> dict:
    p = os.path.join(path, _MANIFEST)
    if not os.path.exists(p):
        return {"latest": 0, "versions": []}
    with open(p) as f:
        return json.load(f)


def write_version(df: DataFrame, path: str, note: str = "") -> int:
    """Write ``df`` as the next version of the table at ``path``;
    returns the new version number."""
    m = _load_manifest(path)
    v = m["latest"] + 1
    df.write.mode("overwrite").parquet(os.path.join(path, f"v={v}"))
    rows = df.sparkSession.read.parquet(os.path.join(path, f"v={v}")).count()
    m["versions"].append({"version": v, "rows": rows, "note": note})
    m["latest"] = v
    tmp = os.path.join(path, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(m, f)
    os.replace(tmp, os.path.join(path, _MANIFEST))  # atomic publish
    return v


def read_version(spark: SparkSession, path: str, version: int | None = None) -> DataFrame:
    """Read a pinned ``version`` (default: latest)."""
    m = _load_manifest(path)
    v = m["latest"] if version is None else version
    known = {e["version"] for e in m["versions"]}
    if v not in known:
        raise ValueError(f"version {v} not in manifest (have {sorted(known)})")
    return spark.read.parquet(os.path.join(path, f"v={v}"))


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
    delete_col: str | None = None,
) -> int:
    """Copy-on-write ``MERGE INTO``: the latest snapshot upserted with
    ``updates`` keyed on ``key_cols`` — matched rows are replaced,
    unmatched rows inserted, and (when ``delete_col`` names a boolean
    column on ``updates``) flagged keys are removed. The result lands
    as the NEXT version, so the merge is atomic (manifest publish),
    time-travelable, and concurrent readers of the old version are
    undisturbed — the logical contract of a lakehouse MERGE with
    nothing but parquet + the manifest.

    Scale posture: one keyed anti-join (current vs update keys) + a
    union — the copy-on-write shape; executors write the data files,
    only the manifest touch is driver-side. Returns the new version."""
    from pyspark.sql import functions as F

    m = _load_manifest(path)
    if delete_col is not None:
        deletes = updates.where(F.col(delete_col)).select(*key_cols)
        ups = updates.where(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        ).drop(delete_col)
    else:
        deletes = None
        ups = updates
    if m["latest"] == 0:
        merged = ups
    else:
        current = read_version(spark, path)
        merged = current.join(
            ups.select(*key_cols).distinct(), key_cols, "left_anti"
        ).unionByName(ups)
    if deletes is not None:
        merged = merged.join(deletes.distinct(), key_cols, "left_anti")
    return write_version(merged, path, note=f"merge on {','.join(key_cols)}")


def list_versions(path: str) -> list[dict]:
    return _load_manifest(path)["versions"]


def vacuum(path: str, keep: int = 2) -> list[int]:
    """Drop all but the last ``keep`` versions; returns removed ids."""
    import shutil

    m = _load_manifest(path)
    live = m["versions"][-keep:] if keep > 0 else []
    dead = [e["version"] for e in m["versions"][: len(m["versions"]) - len(live)]]
    for v in dead:
        shutil.rmtree(os.path.join(path, f"v={v}"), ignore_errors=True)
    m["versions"] = live
    tmp = os.path.join(path, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(m, f)
    os.replace(tmp, os.path.join(path, _MANIFEST))
    return dead
