"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The real surface lives in ``graph_database_spark.catalog``; this module
is a thin re-export so the engine stays importable as a library.
"""

from __future__ import annotations

import json
import re
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from graph_database_spark import catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's proof-1 hypothesis pipeline
    (src/main.js:29-46) over the derived co-purchase graph at sf0.001."""
    return catalog.q_hypothesis_pct(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# Standing head-50 rotation policy (r9, VERDICT r8 next-#2).
#
# The driver's gate takes the FIRST 50 keys of queries(). A static head-50
# saturates: by r7 the same 39/11/0 had been re-verified for three rounds
# while 79% of the catalog had never been externally checked. r8 rotated it
# once by hand; r9 makes rotation the STANDING policy:
#
#   reserved slots (every round):
#     - the 10 reference-surface queries (SURVEY §2.12, src/main.js:29-125)
#       — the parity claim the judge checks first must stay externally
#       verified every round;
#     - every catalog.ROWS_ONLY query — the driver's rows-only check is the
#       ONLY external visibility those production paths get.
#   rotating slots (the remaining ~25):
#     - oracle-backed queries ordered by last-externally-verified round
#       (never-verified first, then oldest), ties broken by catalog order.
#       "Externally verified" is read from the committed CORRECTNESS_r*.json
#       artifacts at import time, so each new round's gate result
#       automatically advances the rotation — no hand-editing.
#
# The tail after the head-50 is ordered the same way (least-verified first)
# so any extra driver capacity lands where it helps most.
# ---------------------------------------------------------------------------

_REFERENCE_SURFACE = [
    "node_count",
    "edge_count",
    "cooccurrence_pairs",
    "connected_pairs",
    "hypothesis_pct",
    "degree",
    "triangle_edges",
    "clustering_coefficient",
    "feature_decode",
    "circles_membership",
]

# Pin history: km_* pinned r11 (VERDICT r10 #1), HUGEINT trio pinned
# r12 (VERDICT r11 #1/#5), replan-regate quartet + nine r12-new queries
# pinned r13 (VERDICT r12 #1/#2/#3). All RETIRED: CORRECTNESS_r13.json
# shows every pinned name hash-green, each pin's stated unpin condition.
#
# r14 pins (VERDICT r13 #1): r13's flagship additions that have never
# had a driver-gate row — newest code with zero external rows is the
# riskiest tier (the HUGEINT saga started exactly there). Catalog order
# is SECTION-based, not chronological, so the standing
# least-recently-verified rotation cannot express "newest code first";
# pin for one round instead. Unpin in r15 once green.
_R14_NEWEST_GATE = [
    "ann_ivfpq",
    "ivfpq_recall_audit",
    # added mid-r14: brand-new this round, gate it the same round
    "ann_ivfpq_refined",
]


def _last_verified_rounds() -> dict[str, int]:
    """Per-query round of most recent external hash-pass (rows-only
    queries count their rows_match pass), from CORRECTNESS_r*.json.

    NOTE (ADVICE r9): the glob reads whatever CORRECTNESS_r*.json files
    exist in the checkout — an uncommitted local artifact therefore
    shifts the rotating-slot ordering relative to the driver's checkout.
    That is intentional (each round's gate result must advance the
    rotation without hand-editing), but it means the gate artifact for
    round N MUST be committed before reasoning about round N+1's head-50
    locally; the repo's convention is that the driver's round commit
    includes it (see `git log --oneline -- 'CORRECTNESS_r*.json'`)."""
    seen: dict[str, int] = {}
    for p in sorted(Path(__file__).resolve().parent.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", p.stem)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        for name, res in data.items():
            if not isinstance(res, dict) or res.get("err"):
                continue
            ok = res.get("hash_match") or (
                res.get("hash_match") is None and res.get("rows_match")
            )
            if ok:
                seen[name] = max(seen.get(name, -1), rnd)
    return seen


def _ordered_names() -> list[str]:
    verified = _last_verified_rounds()
    order = {n: i for i, n in enumerate(catalog.QUERIES)}
    reserved = [
        n
        for n in (*_REFERENCE_SURFACE, *_R14_NEWEST_GATE)
        if n in catalog.QUERIES
    ]
    rows_only = [
        n for n in catalog.QUERIES if n in catalog.ROWS_ONLY and n not in reserved
    ]
    taken = set(reserved) | set(rows_only)
    rotating = sorted(
        (n for n in catalog.QUERIES if n not in taken),
        key=lambda n: (verified.get(n, -1), order[n]),
    )
    return reserved + rows_only + rotating


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.11,
    ordered by the standing rotation policy above: reserved reference
    surface + rows-only paths first, then least-recently-externally-
    verified queries — the driver's head-50 window rotates itself."""
    return {n: catalog.QUERIES[n] for n in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query key; rows-only ops are omitted
    (catalog.ROWS_ONLY) and get the driver's weaker rows-only check."""
    return catalog.oracle_sql()
