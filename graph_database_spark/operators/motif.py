"""Declarative motif finding over the undirected edge set — the
GraphFrames ``find()`` analog for this engine's DataFrame graphs
(north star: GraphX-style analytics on DataFrames, not OLTP traversal;
the reference's closest relative is its 2-hop Cypher neighborhood
pattern, src/main.js:88-89).

A pattern is a semicolon-separated list of undirected adjacency terms:

    find_motif(edges, "a-b; b-c; a-c")     # triangles (ordered bindings)
    find_motif(edges, "a-b; b-c; !a-c")    # open wedges (negated term)

Each term compiles to ONE equi-join against the symmetrized edge set
(positive, introducing at most one new vertex variable) or to a
left-anti join (negated, both endpoints already bound) — the whole
pattern is a single Catalyst join tree: reorderable, AQE-sized,
whole-stage codegen'd. No traversal engine, no recursion — a motif is
just a join shape.

Semantics (GraphFrames-compatible): bindings are ORDERED — a triangle
{x,y,z} appears once per binding order satisfying the pattern (6 for
"a-b; b-c; a-c"). Distinct variables bind distinct vertices only where
``distinct_vertices`` demands it (anonymous non-adjacency is what the
negated terms are for).

Scale: term order is the join order hint — lead with the most selective
term; every join is keyed on vertex ids, so the same skew/broadcast
levers as any fact-fact join apply (symmetrize doubles the probe side
exactly once; degree skew → AQE skew join, session default).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

from graph_database_spark.plans.copurchase import symmetrize

__all__ = ["find_motif"]

_TERM = re.compile(r"^(!?)\s*([A-Za-z_]\w*)\s*-\s*([A-Za-z_]\w*)$")


def _parse(pattern: str) -> list[tuple[bool, str, str]]:
    terms = []
    for raw in pattern.split(";"):
        raw = raw.strip()
        if not raw:
            continue
        m = _TERM.match(raw)
        if not m:
            raise ValueError(f"bad motif term {raw!r} (expected 'a-b' or '!a-b')")
        neg, u, v = m.group(1) == "!", m.group(2), m.group(3)
        if u == v:
            raise ValueError(f"self-loop term {raw!r} (the edge set is simple)")
        terms.append((neg, u, v))
    if not terms:
        raise ValueError("empty motif pattern")
    return terms


def find_motif(
    edges: DataFrame, pattern: str, distinct_vertices: bool = True
) -> DataFrame:
    """Bindings DataFrame with one column per pattern variable.

    Positive terms must keep the pattern connected (each after the
    first shares a bound variable — guarantees equi-joins, never a
    cartesian product); negated terms need both endpoints bound."""
    sym = symmetrize(edges)  # (v, n): both directions of every edge
    terms = _parse(pattern)

    result: DataFrame | None = None
    bound: list[str] = []
    for neg, u, v in terms:
        have_u, have_v = u in bound, v in bound
        if neg:
            if not (have_u and have_v):
                raise ValueError(
                    f"negated term !{u}-{v} requires both variables bound first"
                )
            probe = sym.select(F.col("v").alias(u), F.col("n").alias(v))
            result = result.join(probe, [u, v], "left_anti")
            continue
        if result is None:
            result = sym.select(F.col("v").alias(u), F.col("n").alias(v))
            bound += [u, v]
        elif have_u and have_v:
            probe = sym.select(F.col("v").alias(u), F.col("n").alias(v))
            result = result.join(probe, [u, v], "left_semi")
        elif have_u or have_v:
            old, new = (u, v) if have_u else (v, u)
            probe = sym.select(F.col("v").alias(old), F.col("n").alias(new))
            result = result.join(probe, old)
            bound.append(new)
        else:
            raise ValueError(
                f"term {u}-{v} is disconnected from the bound variables {bound} "
                "(reorder the pattern; disconnected motifs would be a cartesian product)"
            )
    if distinct_vertices:
        for i, a in enumerate(bound):
            for b in bound[i + 1 :]:
                result = result.where(F.col(a) != F.col(b))
    return result.select(*bound)
