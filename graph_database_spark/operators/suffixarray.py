"""Distributed prefix-grouped suffix array with adjacent-LCP readout —
the true ExactSubstr construction (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better"), completing the dedup
ladder past the fixed-n approximations (`dedup.duplicate_span_coverage`
at n=8 tokens, `cdc.cdc_chunks`): a suffix array reports the MAXIMAL
repeated-match length at every position, which no fixed n-gram width
can.

Construction (all DataFrame ops, one shuffle):

1. Suffixes start at TOKEN boundaries of the normalized text (the
   token-level ExactSubstr variant — ~6x fewer suffixes than byte-level
   at identical span semantics for word data), each represented by its
   ``ext_cap``-char prefix. Token-start char positions come from one
   O(tokens) ``aggregate`` fold per document — never an O(len^2)
   re-join.
2. Prefix grouping: every suffix pair with LCP >= ``min_match`` shares
   its first ``min_match`` chars, so bucketing on that prefix makes
   global suffix-array adjacency EXACTLY bucket-local adjacency for all
   pairs that can matter. One hash shuffle on the bucket key; each
   bucket sorts locally (a windowed sort, n log n overall — the linear
   adjacent-pair scan is what makes suffix arrays beat all-pairs).
3. Adjacent-LCP: by the suffix-array property, a suffix's longest match
   anywhere in the corpus is against one of its two sort-neighbors;
   ``max(lcp(prev), lcp(next))`` is therefore the exact maximal
   duplicated-substring length starting at that position (capped at
   ``ext_cap``).

Scale posture: linear rows (one per token), one shuffle keyed by a
``min_match``-char prefix; skew = one globally hot phrase filling one
bucket — the documented knob is raising ``min_match`` (finer buckets),
the same occupancy discipline as the LSH ``auto_bits`` rule. Sort
collation is byte order over [a-z0-9 ] on both engines, so the oracle
(catalog.py, same construction in windowed SQL) is value-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from graph_database_spark.functions.textnorm import tokens

__all__ = [
    "suffix_lcp_dedup",
    "suffix_cross_doc",
    "duplicate_span_cuts",
    "apply_span_cuts",
    "lcp_sql",
]


def lcp_sql(a: str, b: str, sub: str = "substring") -> str:
    """Exact longest-common-prefix length of two string expressions:
    (first mismatch position - 1), or the shorter length if one is a
    prefix of the other. One-parameter HOF lambda (the (element, index)
    trap does not apply); portable modulo the substring function name."""
    n = f"least(length({a}), length({b}))"
    return (
        f"coalesce(array_min(filter(sequence(1, {n}),"
        f" i -> {sub}({a}, i, 1) != {sub}({b}, i, 1))) - 1, {n})"
    )


def suffix_lcp_dedup(
    docs: DataFrame, min_match: int = 30, ext_cap: int = 64
) -> DataFrame:
    """Per-document duplicated-span-start profile from the suffix
    array: for each doc with at least one token-start suffix whose
    maximal corpus match is >= ``min_match`` chars, the count of such
    starts, the longest match observed (capped at ``ext_cap``), and
    ``n_cross_doc`` — of those starts, how many have a qualifying match
    against a DIFFERENT document **among their two sort-neighbors**.

    ``n_cross_doc`` is a LOWER BOUND on true cross-document attribution
    (ADVICE r10): only the MAX lcp is guaranteed adjacent in a suffix
    array, so a start sandwiched between same-doc repeats is counted as
    self-repetition even if a cross-doc match >= ``min_match`` exists
    further away in the bucket. ``n_dup_starts`` / ``max_lcp`` (the
    ExactSubstr quantities from Lee et al.) are exact; widening the
    neighbor window would buy exact attribution at k x the window cost
    and is not what the dedup decision needs. The oracle mirrors the
    two-neighbor semantics, so the hash gate pins exactly this.

    Returns columns ``doc_id, n_dup_starts, max_lcp, n_cross_doc``.
    """
    scored = _span_scores(docs, min_match, ext_cap)
    return (
        scored.where(F.col("mlcp") >= min_match)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_dup_starts"),
            F.max("mlcp").cast("long").alias("max_lcp"),
            F.sum("xd").alias("n_cross_doc"),
        )
    )


def _span_scores(
    docs: DataFrame, min_match: int, ext_cap: int
) -> DataFrame:
    """Shared span frame of the ExactSubstr family: one row per
    token-start suffix with its maximal adjacent-LCP ``mlcp`` and the
    two-neighbor cross-doc flag ``xd`` — ``(doc_id, pos, mlcp, xd)``."""
    nb = _lcp_frame(docs, min_match, ext_cap)
    return nb.select(
        "doc_id",
        "pos",
        F.greatest("lcp_pv", "lcp_nx").alias("mlcp"),
        F.expr(
            f"CASE WHEN (lcp_pv >= {min_match} AND pv.doc_id != doc_id)"
            f" OR (lcp_nx >= {min_match} AND nx.doc_id != doc_id)"
            " THEN 1 ELSE 0 END"
        ).alias("xd"),
    )


def _lcp_frame(docs: DataFrame, min_match: int, ext_cap: int) -> DataFrame:
    """Sorted-bucket suffix frame with both adjacent LCPs — ``(bkt,
    doc_id, pos, suf, pv, nx, lcp_pv, lcp_nx)`` where ``pv``/``nx`` are
    the sort-neighbor structs. The single bucket-keyed shuffle every
    ExactSubstr readout rides."""
    d = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        tokens(F.col("text")).alias("toks"),
    ).withColumn("norm", F.array_join("toks", " "))
    # Token-start char positions: one linear fold, state = (next
    # position, starts-so-far).
    d = d.withColumn(
        "starts",
        F.expr(
            "aggregate(toks,"
            " named_struct('p', 1, 'st', CAST(array() AS array<int>)),"
            " (st, t) -> named_struct('p', st.p + length(t) + 1,"
            " 'st', concat(st.st, array(st.p))),"
            " st -> st.st)"
        ),
    )
    suf = (
        d.select("doc_id", "norm", F.explode("starts").alias("pos"))
        .select(
            "doc_id",
            "pos",
            F.expr(f"substring(norm, pos, {ext_cap})").alias("suf"),
        )
        .where(F.length("suf") >= min_match)
        .withColumn("bkt", F.expr(f"substring(suf, 1, {min_match})"))
    )
    w = Window.partitionBy("bkt").orderBy("suf", "doc_id", "pos")
    nb = suf.withColumn(
        "pv", F.lag(F.struct("suf", "doc_id")).over(w)
    ).withColumn("nx", F.lead(F.struct("suf", "doc_id")).over(w))
    return nb.withColumn(
        "lcp_pv",
        F.expr(
            f"CASE WHEN pv IS NULL THEN 0"
            f" ELSE {lcp_sql('suf', 'pv.suf')} END"
        ),
    ).withColumn(
        "lcp_nx",
        F.expr(
            f"CASE WHEN nx IS NULL THEN 0"
            f" ELSE {lcp_sql('suf', 'nx.suf')} END"
        ),
    )


def suffix_cross_doc(
    docs: DataFrame, min_match: int = 30, ext_cap: int = 64
) -> DataFrame:
    """EXACT cross-document attribution of duplicated spans (the r11
    upgrade of ``suffix_lcp_dedup``'s documented two-neighbor lower
    bound): for each start, the maximal LCP against the nearest
    OTHER-document suffix in either sort direction — which, by the
    suffix-array range-minimum property (LCP(i, j) = min of adjacent
    LCPs between them, non-increasing as j moves away), equals the
    maximal cross-doc match length over the WHOLE corpus (capped at
    ``ext_cap``).

    Two segment scans per bucket: a run of consecutive same-doc
    suffixes forms a segment (the previous row of a segment head is by
    construction another doc, or absent); the backward cross-doc LCP of
    row i is then min(lcp_pv) from its segment head through i, and
    forward symmetrically over reversed order. Each scan is a running
    min over a (bucket, segment) window — still bucket-local, still one
    row per token, and still ONE hash shuffle: hash(bkt) already
    satisfies the finer (bkt, seg) clustered-distribution requirement,
    so the scans add per-partition sorts, not exchanges (verified: 2
    Exchanges total incl. the final per-doc groupBy).

    Returns ``(doc_id, n_dup_starts, n_cross_lb, n_cross_exact,
    max_cross_lcp)`` per doc with >= 1 duplicated start: the two-
    neighbor lower bound rides along, so lb <= exact is visible in the
    output (and pinned by the oracle, which replays both scans).
    """
    nb = _lcp_frame(docs, min_match, ext_cap)
    asc = ["suf", "doc_id", "pos"]
    desc = [F.desc(c) for c in asc]
    wb = Window.partitionBy("bkt").orderBy(*asc).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wf = Window.partitionBy("bkt").orderBy(*desc).rowsBetween(
        Window.unboundedPreceding, 0
    )
    seg = nb.withColumn(
        "seg_b",
        F.sum(
            F.expr(
                "CASE WHEN pv IS NULL OR pv.doc_id != doc_id"
                " THEN 1 ELSE 0 END"
            )
        ).over(wb),
    ).withColumn(
        "seg_f",
        F.sum(
            F.expr(
                "CASE WHEN nx IS NULL OR nx.doc_id != doc_id"
                " THEN 1 ELSE 0 END"
            )
        ).over(wf),
    )
    wsb = Window.partitionBy("bkt", "seg_b").orderBy(*asc).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wsf = Window.partitionBy("bkt", "seg_f").orderBy(*desc).rowsBetween(
        Window.unboundedPreceding, 0
    )
    # Segment-head rows carry lcp vs the previous segment's last row —
    # an OTHER-doc suffix — so the running min through row i is exactly
    # LCP(i, nearest previous other-doc suffix); 0 at bucket edges
    # (pv/nx NULL) reads as "no cross match", correct at any
    # min_match >= 1.
    scored = (
        seg.withColumn("cb", F.min("lcp_pv").over(wsb))
        .withColumn("cf", F.min("lcp_nx").over(wsf))
        .select(
            "doc_id",
            F.greatest("lcp_pv", "lcp_nx").alias("mlcp"),
            F.expr(
                f"CASE WHEN (lcp_pv >= {min_match} AND pv.doc_id != doc_id)"
                f" OR (lcp_nx >= {min_match} AND nx.doc_id != doc_id)"
                " THEN 1 ELSE 0 END"
            ).alias("xd"),
            F.greatest("cb", "cf").alias("cross_lcp"),
        )
    )
    return (
        scored.where(F.col("mlcp") >= min_match)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_dup_starts"),
            F.sum("xd").alias("n_cross_lb"),
            F.sum(
                (F.col("cross_lcp") >= min_match).cast("long")
            ).alias("n_cross_exact"),
            # Below min_match a bucket-local cross_lcp is only a lower
            # bound (an out-of-bucket pair may share up to min_match - 1
            # chars), so the reported max clamps sub-threshold values to
            # 0 — every nonzero output is globally exact.
            F.max(
                F.when(
                    F.col("cross_lcp") >= min_match, F.col("cross_lcp")
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("max_cross_lcp"),
        )
    )


def duplicate_span_cuts(
    docs: DataFrame, min_match: int = 30, ext_cap: int = 64
) -> DataFrame:
    """The ACTIONABLE readout of the ExactSubstr profile: per document,
    the union of its duplicated character spans — each qualifying start
    ``pos`` contributes interval [pos, pos + mlcp), overlapping/touching
    intervals merge (the classic gaps-and-islands fold), and
    ``cut_chars`` is the total character length an ExactSubstr-style
    cut pass would remove (Lee et al. 2022 drop the matched span; this
    reports exactly what that pass would delete, per doc).

    Returns ``(doc_id, n_starts, n_islands, cut_chars)`` for docs with
    at least one duplicated span. Windows are per-doc (bounded by doc
    length), the spans frame rides the same single bucket-keyed shuffle
    as ``suffix_lcp_dedup``.
    """
    per_island = _islands(docs, min_match, ext_cap)
    return per_island.groupBy("doc_id").agg(
        F.sum("n_starts").alias("n_starts"),
        F.count("*").alias("n_islands"),
        F.sum(F.col("e") - F.col("s")).alias("cut_chars"),
    )


def _islands(docs: DataFrame, min_match: int, ext_cap: int) -> DataFrame:
    """Merged duplicated intervals per doc: ``(doc_id, island,
    n_starts, s, e)`` with [s, e) the union span (1-based char
    positions, e exclusive)."""
    spans = _span_scores(docs, min_match, ext_cap).where(
        F.col("mlcp") >= min_match
    )
    wprev = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wrun = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    isl = (
        spans.withColumn(
            "new_isl",
            (
                F.col("pos")
                > F.coalesce(
                    F.max(F.col("pos") + F.col("mlcp")).over(wprev),
                    F.lit(-1),
                )
            ).cast("long"),
        )
        .withColumn("island", F.sum("new_isl").over(wrun))
    )
    return isl.groupBy("doc_id", "island").agg(
        F.count("*").alias("n_starts"),
        F.min("pos").alias("s"),
        F.max(F.col("pos") + F.col("mlcp")).alias("e"),
    )


def apply_span_cuts(
    docs: DataFrame, min_match: int = 30, ext_cap: int = 64
) -> DataFrame:
    """Execute the ExactSubstr cut plan: remove every merged duplicated
    interval from the normalized text and return the surviving string's
    length and md5 per document — the cross-engine parity proof that
    the TRANSFORM (not just the plan) is deterministic. Docs with no
    duplicated span pass through whole.

    Per doc the kept text is the ordered concatenation of the gaps
    between islands plus the tail: segment t = norm[prev_e, s_t) and
    tail = norm[e_last, end]. Built with one per-doc collect_list over
    the (bounded-by-doc-length) island set; order restored by
    array_sort on the island index, so the concat is deterministic on
    both engines.

    Returns ``(doc_id, kept_chars, kept_md5)`` for EVERY document.
    """
    d = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.array_join(tokens(F.col("text")), " ").alias("norm"),
    )
    isl = _islands(docs, min_match, ext_cap)
    wseq = Window.partitionBy("doc_id").orderBy("island")
    segs = (
        isl.join(d, "doc_id")
        .withColumn("prev_e", F.coalesce(F.lag("e").over(wseq), F.lit(1)))
        .withColumn(
            "seg",
            F.expr("substring(norm, prev_e, greatest(0, s - prev_e))"),
        )
    )
    kept = segs.groupBy("doc_id").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list("
            "struct(island, seg))), x -> x.seg), '')"
        ).alias("head"),
        F.max("e").alias("e_max"),
    )
    return (
        d.join(kept, "doc_id", "left")
        .select(
            "doc_id",
            F.expr(
                "CASE WHEN e_max IS NULL THEN norm"
                " ELSE concat(head, substring(norm, e_max,"
                "      greatest(0, length(norm) - e_max + 1))) END"
            ).alias("kept"),
        )
        .select(
            "doc_id",
            F.length("kept").cast("long").alias("kept_chars"),
            F.md5(F.col("kept")).alias("kept_md5"),
        )
    )
