"""Consistent-hash ring assignment and rebalance audit — the shard
planner's primitive.

Scaling a 100 TB corpus from N to N+1 storage/serving nodes must move
only ~1/(N+1) of the keys; modulo sharding moves nearly all of them.
Consistent hashing proves it: nodes own ring positions (md5 of
``node<i>#<vk>`` for ``vnodes`` virtual points each), a key lands on
the first vnode clockwise of its own md5 position, and adding a node
only claims the arc segments its new vnodes cut.

The ring is bounded model state (N x vnodes entries), precomputed once
in Python — ``hashlib.md5`` over UTF-8 equals Spark's ``md5`` and
DuckDB's ``md5`` byte for byte — and embedded as ONE literal array
expression (CLAUDE.md: big literals are one generated expr string,
never nested ``F.array(F.lit(...))``). Per key the successor lookup is
a JVM HOF scan of that array: no join, no shuffle beyond the final
count aggregation.

``rebalance_matrix`` emits the (node_before, node_after, n_docs)
transition matrix between an N-node and an (N+1)-node ring; minimal
movement means every off-diagonal cell has ``node_after = N`` (the new
node) — pinned in tests/test_chash.py.

No reference analog (src/main.js is single-node); SURVEY §2 extension
family alongside the layout planners.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, functions as F

VNODES = 32
_POS_HEX = 12  # 48-bit positions: collision-free in practice, asserted


def _pos(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:_POS_HEX], 16)


def build_ring(n_nodes: int, vnodes: int = VNODES) -> list[tuple[int, int]]:
    """Sorted (position, node) ring. Raises on the astronomically
    unlikely 48-bit position collision rather than resolving it
    silently (a collision would make successor lookup order-dependent).
    """
    ring = sorted(
        (_pos(f"node{n}#{v}"), n)
        for n in range(n_nodes)
        for v in range(vnodes)
    )
    if len({p for p, _ in ring}) != len(ring):
        raise ValueError("vnode position collision; change vnodes")
    return ring

def ring_spark_literal(ring: list[tuple[int, int]]) -> str:
    """The ring as one array<struct<pos,node>> literal expr string."""
    cells = ",".join(
        f"named_struct('pos',{p}L,'node',{n})" for p, n in ring
    )
    return f"array({cells})"


_KEY_POS = (
    "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 12), 16, 10)"
    " AS BIGINT)"
)


def _assign_expr(ring: list[tuple[int, int]]) -> str:
    """Successor-on-ring node for the key position column ``kp``:
    first vnode with pos > kp, wrapping to the ring's first entry.
    The filter scans a materialized literal array (bounded: N x vnodes
    entries), not a recomputed expression."""
    lit = ring_spark_literal(ring)
    return (
        f"(coalesce(try_element_at(filter({lit}, v -> v.pos > kp), 1),"
        f" element_at({lit}, 1))).node"
    )


def rebalance_matrix(
    docs: DataFrame, n_before: int, n_after: int, vnodes: int = VNODES
) -> DataFrame:
    """(node_before, node_after, n_docs) transition matrix for moving
    ``docs`` (keyed by ``doc_id``) from an ``n_before``- to an
    ``n_after``-node consistent-hash ring."""
    ra = build_ring(n_before, vnodes)
    rb = build_ring(n_after, vnodes)
    keyed = docs.select(F.expr(_KEY_POS).alias("kp"))
    return (
        keyed.select(
            F.expr(_assign_expr(ra)).cast("long").alias("node_before"),
            F.expr(_assign_expr(rb)).cast("long").alias("node_after"),
        )
        .groupBy("node_before", "node_after")
        .agg(F.count("*").alias("n_docs"))
    )


def rebalance_sql(
    n_before: int, n_after: int, vnodes: int = VNODES
) -> str:
    """DuckDB oracle: same rings as VALUES lists, successor via an
    inequality join + arg_min (set-based, no correlated subquery)."""

    def values(ring):
        return ",".join(f"({p},{n})" for p, n in ring)

    ra, rb = build_ring(n_before, vnodes), build_ring(n_after, vnodes)
    return f"""
WITH k AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 12))
              AS BIGINT) AS kp
  FROM documents
),
ra(pos, node) AS (VALUES {values(ra)}),
rb(pos, node) AS (VALUES {values(rb)}),
sa AS (
  SELECT k.doc_id,
         coalesce(arg_min(r.node, r.pos),
                  (SELECT arg_min(node, pos) FROM ra)) AS node_before
  FROM k LEFT JOIN ra r ON r.pos > k.kp
  GROUP BY k.doc_id
),
sb AS (
  SELECT k.doc_id,
         coalesce(arg_min(r.node, r.pos),
                  (SELECT arg_min(node, pos) FROM rb)) AS node_after
  FROM k LEFT JOIN rb r ON r.pos > k.kp
  GROUP BY k.doc_id
)
SELECT CAST(sa.node_before AS BIGINT) AS node_before,
       CAST(sb.node_after AS BIGINT) AS node_after,
       CAST(count(*) AS BIGINT) AS n_docs
FROM sa JOIN sb ON sb.doc_id = sa.doc_id
GROUP BY 1, 2
"""
