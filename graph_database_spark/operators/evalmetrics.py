"""Pairwise text evaluation metrics (BLEU / ROUGE family).

The evaluation leg of an LLM data pipeline: given (candidate, reference)
document pairs, score surface overlap the way generation evals do. No
analog in the reference (src/main.js) — extension family X5 alongside the
retrieval/quality operators.

Exactness discipline (CLAUDE.md): every libm-born per-item value (the
``ln p_n`` terms) is snapped to integer micro-units before any further
arithmetic; ratios of integers appear only as single IEEE divisions
(bit-identical across engines); the final quarter/penalty divisions use
the exact integer half-up idiom (Spark ``div`` / DuckDB ``//``), so the
emitted ``log_bleu_micro`` is a pure BIGINT on both engines.

Scale posture: n-gram counts are one map-side-combinable shuffle keyed
(doc, n, gram); the candidate/reference meet is an EQUI-join whose
leading key is the pair id (never the gram — with a 31-word vocabulary a
gram-keyed meet is quadratic, see CLAUDE.md), so the plan stays linear in
corpus size regardless of vocabulary skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graph_database_spark.functions.textnorm import tokens

_MAX_N = 4


def _gram_counts(toks: DataFrame) -> DataFrame:
    """Per-doc modified-precision n-gram counts for n = 1..4.

    All four gram lengths are generated ROW-LOCALLY by one JVM HOF
    (no per-n re-scan), then counted in a single shuffle.
    """
    arr = (
        "flatten(array("
        + ", ".join(
            f"transform(sequence(1, size(t) - {n} + 1),"
            f" i -> struct({n} AS n, concat_ws(' ', slice(t, i, {n})) AS g))"
            for n in range(1, _MAX_N + 1)
        )
        + "))"
    )
    return (
        toks.select("doc_id", F.explode(F.expr(arr)).alias("x"))
        .select("doc_id", "x.n", "x.g")
        .groupBy("doc_id", "n", "g")
        .agg(F.count("*").alias("c"))
    )


def isotonic_fit(
    df: DataFrame,
    score_col: str,
    label_col,
    max_score_universe: int | None = 10_000,
) -> DataFrame:
    """Exact L2 isotonic regression (calibration curve) of a binary label
    on an integer score, via the minimax identity

        fit_i = max_{j<=i} min_{k>=i} mean(label over score bins j..k)

    which equals the (unique) pool-adjacent-violators solution — so a
    sequential PAV replay pins this distributed formulation exactly
    (tests/test_evalmetrics.py). Arithmetic is PURE INTEGER: each
    interval mean enters as a half-up micro-unit division (Spark ``div``
    / DuckDB ``//``), and because half-up rounding is monotone it
    commutes with the max/min, so micro(PAV) == maxmin(micro) — no
    floats anywhere, partition-order-exact by construction.

    Scale posture: raw rows collapse to the DISTINCT score universe
    first (one combinable shuffle), so the O(B^2) interval enumeration
    is bounded by the score cardinality, not the corpus (B = distinct
    document lengths here; for unbounded scores quantile-bin first).
    The prefix window runs over that bounded universe — and the bound
    is ENFORCED (VERDICT r9 #4): more than ``max_score_universe``
    distinct scores raises instead of silently stalling the
    unpartitioned window AND exploding the O(B^2) interval join (the
    count reuses the already-checkpointed bins frame, so the guard is
    ~free). Pass None to skip when the caller knows the universe.
    """
    from pyspark.sql import Window

    grouped = (
        df.groupBy(F.col(score_col).alias("score"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col(label_col).cast("long")).alias("pos"),
        )
        .localCheckpoint()
    )
    # Guard BEFORE the unpartitioned window runs (the count reuses the
    # checkpointed grouped frame, so it is ~free).
    if max_score_universe is not None:
        n_bins = grouped.count()
        if n_bins > max_score_universe:
            raise ValueError(
                f"isotonic_fit: score universe has {n_bins} distinct "
                f"values (> {max_score_universe}); the O(B^2) interval "
                "join and the unpartitioned prefix window would blow up "
                "— quantile-bin the score first"
            )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, 0)
    bins = grouped.select(
        "score",
        "n",
        "pos",
        F.row_number().over(Window.orderBy("score")).alias("idx"),
        F.sum("n").over(w).alias("cn"),
        F.sum("pos").over(w).alias("cp"),
    ).localCheckpoint()
    j = bins.select(
        F.col("idx").alias("j"),
        (F.col("cn") - F.col("n")).alias("cn0"),
        (F.col("cp") - F.col("pos")).alias("cp0"),
    )
    k = bins.select(
        F.col("idx").alias("k"), F.col("cn").alias("cn1"), F.col("cp").alias("cp1")
    )
    intervals = j.join(k, F.col("k") >= F.col("j")).select(
        "j",
        "k",
        F.expr(
            "(2 * (cp1 - cp0) * 1000000 + (cn1 - cn0)) div (2 * (cn1 - cn0))"
        ).alias("mean_micro"),
    )
    wm = Window.partitionBy("j").orderBy(F.col("k").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    m = intervals.select(
        "j", F.col("k").alias("i"), F.min("mean_micro").over(wm).alias("mn")
    )
    fit = m.groupBy("i").agg(F.max("mn").alias("fit_micro"))
    return (
        bins.join(fit, bins.idx == fit.i)
        .select("score", "n", "pos", "fit_micro")
    )


def gini_best_splits(df: DataFrame, features: dict[str, "F.Column"], label) -> DataFrame:
    """Exact depth-1 decision-tree training (best Gini split per feature).

    For each integer feature, every distinct value is a candidate
    threshold (split: value <= t vs > t); the chosen split minimizes the
    weighted Gini impurity. For a binary label the weighted impurity is
    (up to the constant 2/n) ``pos_l*neg_l/n_l + pos_r*neg_r/n_r`` — two
    single IEEE divisions of exact integers plus one add, bit-identical
    across engines, used ONLY for ordering (ties broken by threshold);
    the emitted columns are pure integers.

    Scale posture: one explode to (feature, value, label), one
    combinable shuffle to distinct-value stats, then windows over the
    bounded per-feature value universe (documented bounded-universe
    windows). Raw rows are never joined or windowed.
    """
    from pyspark.sql import Window

    legs = [
        F.struct(F.lit(name).alias("feature"), expr.cast("long").alias("value"))
        for name, expr in features.items()
    ]
    flat = df.select(
        F.explode(F.array(*legs)).alias("fv"), F.col(label).cast("long").alias("y")
    ).select("fv.feature", "fv.value", "y")
    stats = flat.groupBy("feature", "value").agg(
        F.count("*").alias("n"), F.sum("y").alias("pos")
    )
    wp = Window.partitionBy("feature").orderBy("value").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wt = Window.partitionBy("feature")
    pre = stats.select(
        "feature",
        "value",
        F.sum("n").over(wp).alias("n_l"),
        F.sum("pos").over(wp).alias("pos_l"),
        F.sum("n").over(wt).alias("n_t"),
        F.sum("pos").over(wt).alias("pos_t"),
    ).where(F.col("n_l") < F.col("n_t"))
    scored = pre.select(
        "feature",
        F.col("value").alias("threshold"),
        "n_l",
        "pos_l",
        (F.col("n_t") - F.col("n_l")).alias("n_r"),
        (F.col("pos_t") - F.col("pos_l")).alias("pos_r"),
        (
            (F.col("pos_l") * (F.col("n_l") - F.col("pos_l"))).cast("double")
            / F.col("n_l").cast("double")
            + (
                (F.col("pos_t") - F.col("pos_l"))
                * ((F.col("n_t") - F.col("n_l")) - (F.col("pos_t") - F.col("pos_l")))
            ).cast("double")
            / (F.col("n_t") - F.col("n_l")).cast("double")
        ).alias("imp"),
    )
    wr = Window.partitionBy("feature").orderBy(F.col("imp").asc(), F.col("threshold").asc())
    return (
        scored.select("*", F.row_number().over(wr).alias("rk"))
        .where(F.col("rk") == 1)
        .select("feature", "threshold", "n_l", "pos_l", "n_r", "pos_r")
    )


_ROUGE_CAP = 48


def rouge_l_pairs(docs: DataFrame, cap: int = _ROUGE_CAP) -> DataFrame:
    """ROUGE-L F1 between adjacent-id document pairs (cand d, ref d+1).

    LCS dynamic program evaluated ROW-LOCALLY by one JVM ``aggregate``
    HOF: the i-th step rewrites the DP row with the prefix-max identity
    ``new[j] = max(prev[j], max_{q<=j}(prev[q-1] + 1 if a_i = b_q))``
    (valid because DP rows are non-decreasing), which needs no
    intra-row sequential chain and mirrors 1:1 into the oracle's
    recursive CTE. With beta = 1 the F measure collapses to the pure
    rational 2*LCS/(c_len + r_len), so the score is an exact half-up
    micro integer — no floats anywhere.

    Sequences are truncated to ``cap`` tokens (standard eval-truncation
    convention, applied on both engines) bounding per-pair work at
    O(cap^3); pairs are formed by id adjacency, so the plan is linear in
    corpus size with no cross-document joins beyond the id equi-join.
    """
    toks = docs.select(
        "doc_id", F.slice(tokens(F.col("text")), 1, cap).alias("t")
    ).where(F.size("t") >= 1)
    pairs = (
        toks.alias("a")
        .join(toks.alias("b"), F.col("b.doc_id") == F.col("a.doc_id") + 1)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.t").alias("ta"),
            F.col("b.t").alias("tb"),
        )
    )
    # The DP is the expensive stage; a small scan arrives as one
    # partition and would pin it to one core (CLAUDE.md spread rule).
    from graph_database_spark.operators.spread import spread

    pairs = spread(pairs)
    lcs = (
        "aggregate(ta,"
        " transform(sequence(0, size(tb)), x -> 0L),"
        " (row, c) -> concat(array(0L), transform(sequence(1, size(tb)), j ->"
        "   greatest(element_at(row, j + 1),"
        "     coalesce(array_max(transform(sequence(1, j), q ->"
        "       IF(c = element_at(tb, q), element_at(row, q) + 1, 0L))),"
        "       0L)))),"
        " row -> element_at(row, -1))"
    )
    out = pairs.select(
        "doc_a",
        "doc_b",
        F.size("ta").cast("long").alias("c_len"),
        F.size("tb").cast("long").alias("r_len"),
        F.expr(lcs).alias("lcs"),
    )
    return out.select(
        "*",
        F.expr(
            "(2 * (2 * lcs * 1000000) + (c_len + r_len))"
            " div (2 * (c_len + r_len))"
        ).alias("rouge_l_f_micro"),
    )


def bleu_pairs(docs: DataFrame) -> DataFrame:
    """BLEU-4 between adjacent-id document pairs (cand d, ref d+1).

    Standard BLEU: modified n-gram precisions p_n = sum_g min(cnt_cand,
    cnt_ref) / (c_len - n + 1), brevity penalty exp(min(0, 1 - r/c)),
    geometric mean over n = 1..4. Reported in LOG space as exact integer
    micro-units (exp of a snapped sum would re-enter libm); pairs with
    any p_n = 0 get NULL (log-BLEU is -inf there) but keep their matched
    counts, so the zero-overlap population is still visible.
    """
    toks = docs.select(
        "doc_id", tokens(F.col("text")).alias("t")
    ).where(F.size("t") >= _MAX_N)
    lens = toks.select("doc_id", F.size("t").cast("long").alias("ln_t"))
    pairs = (
        lens.alias("a")
        .join(lens.alias("b"), F.col("b.doc_id") == F.col("a.doc_id") + 1)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.ln_t").alias("c_len"),
            F.col("b.ln_t").alias("r_len"),
        )
    )
    # Referenced twice (candidate and reference side of the meet).
    gc = _gram_counts(toks).localCheckpoint()
    cand = gc.select(
        F.col("doc_id").alias("pair_id"), "n", "g", F.col("c").alias("cc")
    )
    ref = gc.select(
        (F.col("doc_id") - 1).alias("pair_id"), "n", "g", F.col("c").alias("rc")
    )
    matched = (
        cand.join(ref, ["pair_id", "n", "g"])
        .groupBy("pair_id", "n")
        .agg(F.sum(F.least("cc", "rc")).alias("m"))
    )
    mw = matched.groupBy("pair_id").agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("n") == n, F.col("m"))), F.lit(0).cast("long")
            ).alias(f"m{n}")
            for n in range(1, _MAX_N + 1)
        ]
    )
    out = pairs.join(mw, pairs.doc_a == mw.pair_id, "left").drop("pair_id")
    out = out.select(
        "doc_a",
        "doc_b",
        "c_len",
        "r_len",
        *[
            F.coalesce(F.col(f"m{n}"), F.lit(0).cast("long")).alias(f"m{n}")
            for n in range(1, _MAX_N + 1)
        ],
    )
    # ln(p_n) snapped to micro-units; greatest(m, 1) keeps the untaken
    # NULL branch free of ln(0) = -inf (ANSI cast would raise).
    t_terms = " + ".join(
        f"CAST(round(ln(CAST(greatest(m{n}, 1) AS DOUBLE)"
        f" / CAST(c_len - {n} + 1 AS DOUBLE))"
        " * CAST(1000000 AS DOUBLE), 0) AS BIGINT)"
        for n in range(1, _MAX_N + 1)
    )
    bp = (
        "(CASE WHEN r_len > c_len THEN"
        " (2 * (r_len - c_len) * 1000000 + c_len) div (2 * c_len)"
        " ELSE 0 END)"
    )
    log_bleu = (
        "CASE WHEN m1 > 0 AND m2 > 0 AND m3 > 0 AND m4 > 0 THEN"
        f" -((2 * (-({t_terms})) + 4) div 8) - {bp}"
        " ELSE NULL END"
    )
    return out.select(
        "doc_a",
        "doc_b",
        "c_len",
        "r_len",
        "m1",
        "m2",
        "m3",
        "m4",
        F.expr(log_bleu).alias("log_bleu_micro"),
    )
