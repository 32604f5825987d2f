"""Skew-guarded blocked self-join for the record-linkage family.

Blocking makes fuzzy matching tractable (compare only within a block),
but the compare is quadratic IN THE BLOCK: a self-join on the block key
hashes every row of a hot block onto one task, so one oversized block
(one very common head noun, one dominant zip code) serializes the whole
stage — AQE's skew splitting cannot help, because splitting a partition
cannot split a single join KEY's build side.

``block_self_pairs`` is the production guard (r7 VERDICT next-#7):
blocks at or below ``hot_threshold`` rows take the plain self-join;
hotter blocks are grid-decomposed — each side of the self-join gets a
deterministic group id ``g(row) in [0, n_groups)`` and is replicated
``n_groups`` times, so the block's m^2 pair space splits into
n_groups^2 independent (ga, gb) cells joined on the composite key
(block, ga, gb). Every pair lands in exactly one cell (ga pins the left
row's group, gb the right row's), so the union of the two paths is
byte-identical to the plain join — pytest-pinned in tests/test_linkage.

Cost model: hot rows are replicated n_groups times (bytes), in exchange
for m^2/n_groups^2 comparisons per task instead of m^2. Comparisons are
the dominant term (Levenshtein is O(len^2) per pair), so the trade wins
whenever a block materially exceeds the threshold; the 20x hot-block
stress row in SCALE.md has the measured numbers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["block_self_pairs", "with_jaro_winkler", "with_soundex"]

# American Soundex letter codes; vowels+y reset adjacency, h/w are
# transparent (neither code nor reset).
_SOUNDEX_MAP = {
    **{c: "1" for c in "bfpv"},
    **{c: "2" for c in "cgjkqsxz"},
    **{c: "3" for c in "dt"},
    "l": "4",
    **{c: "5" for c in "mn"},
    "r": "6",
}


def _soundex_code_sql(char_expr: str) -> str:
    branches = " ".join(
        f"WHEN {char_expr} IN ({', '.join(repr(c) for c in cs)}) THEN '{d}'"
        for d, cs in (
            ("1", "bfpv"),
            ("2", "cgjkqsxz"),
            ("3", "dt"),
            ("4", "l"),
            ("5", "mn"),
            ("6", "r"),
        )
    )
    return f"(CASE {branches} ELSE '' END)"


def with_soundex(df: DataFrame, name_col: str, out: str = "soundex") -> DataFrame:
    """Append the American Soundex code of a (lowercase alphabetic)
    name column — the classic phonetic BLOCKING key, the linkage
    family's third leg next to Levenshtein and Jaro-Winkler.

    Exact standard semantics: first letter kept verbatim; subsequent
    letters code b..r into digits 1-6, a digit is emitted only when it
    differs from the last RETAINED digit, vowels (and y) reset that
    adjacency state, h/w are transparent; pad/truncate to LETTER+3.
    One JVM ``aggregate`` fold with (last_code, digits) state, mirrored
    by a recursive-CTE replay in the oracle (catalog.py) — the whole
    code is string-exact on both engines.
    """
    code = _soundex_code_sql("c")
    first_code = _soundex_code_sql(f"substring({name_col}, 1, 1)")
    fold = (
        f"aggregate(transform(sequence(2, greatest(length({name_col}), 2)),"
        f" i -> substring({name_col}, i, 1)),"
        f" struct({first_code} AS last, CAST('' AS STRING) AS digits),"
        " (st, c) -> CASE"
        f" WHEN {code} != '' AND {code} != st.last THEN"
        f"   struct({code} AS last, concat(st.digits, {code}) AS digits)"
        f" WHEN {code} != '' THEN st"
        " WHEN c IN ('h', 'w') THEN st"
        " ELSE struct('' AS last, st.digits AS digits) END,"
        " st -> st.digits)"
    )
    return df.withColumn(
        out,
        F.expr(
            f"concat(upper(substring({name_col}, 1, 1)),"
            f" substring(concat({fold}, '000'), 1, 3))"
        ),
    )


def with_jaro_winkler(
    df: DataFrame, s1: str, s2: str, out: str = "jw_micro"
) -> DataFrame:
    """Append exact integer-micro Jaro-Winkler similarity of two string
    columns — the edit-distance family's second linkage leg (Levenshtein
    rewards alignment, Jaro-Winkler rewards shared prefixes and tolerates
    transpositions).

    The match-window greedy assignment runs as one JVM ``aggregate`` HOF
    (state = matched-position list, O(len^2) per pair like Levenshtein);
    the final score is a pure rational — jaro = (2m^2·L2 + 2m^2·L1 +
    (2m-t)·L1·L2) / (6m·L1·L2), winkler = ((10-l)·jaro + l)/10 — emitted
    via the exact half-up integer idiom, so both engines agree
    bit-for-bit with no floats (oracle: recursive-CTE replay of the same
    fold, catalog.py).  ``t`` is kept as the RAW mismatched-position
    count (= 2x transpositions), which the formula absorbs as (2m-t)/2m.
    """
    d = (
        df.withColumn("_L1", F.length(s1).cast("int"))
        .withColumn("_L2", F.length(s2).cast("int"))
        .withColumn("_w", F.expr("greatest(0, greatest(_L1, _L2) div 2 - 1)"))
        .withColumn(
            "_c1", F.expr(f"transform(sequence(1, _L1), i -> substring({s1}, i, 1))")
        )
        .withColumn(
            "_c2", F.expr(f"transform(sequence(1, _L2), i -> substring({s2}, i, 1))")
        )
    )
    d = d.withColumn(
        "_ml",
        F.expr(
            "aggregate(sequence(1, _L1), CAST(array() AS ARRAY<INT>),"
            " (ml, i) -> concat(ml, filter(array(array_min(filter("
            "sequence(1, _L2), j -> j >= i - _w AND j <= i + _w"
            " AND element_at(_c2, j) = element_at(_c1, i)"
            " AND NOT array_contains(ml, j)))), x -> x IS NOT NULL)))"
        ),
    )
    d = (
        d.withColumn("_m", F.expr("size(_ml)"))
        .withColumn("_sml", F.expr("array_sort(_ml)"))
        .withColumn(
            "_t",
            F.expr(
                "IF(_m = 0, 0, size(filter(sequence(1, _m), k ->"
                " element_at(_c2, element_at(_ml, k))"
                " != element_at(_c2, element_at(_sml, k)))))"
            ),
        )
        .withColumn(
            "_l",
            F.expr(
                f"size(filter(sequence(1, least(4, least(_L1, _L2))),"
                f" p -> substring({s1}, 1, p) = substring({s2}, 1, p)))"
            ),
        )
    )
    num_j = (
        "CAST(2*_m*_m*_L2 + 2*_m*_m*_L1 + (2*_m - _t)*_L1*_L2 AS BIGINT)"
    )
    den_j = "CAST(6*_m*_L1*_L2 AS BIGINT)"
    d = d.withColumn(
        out,
        F.expr(
            f"CASE WHEN _m = 0 THEN CAST(0 AS BIGINT) ELSE"
            f" (2*((10 - _l)*{num_j} + _l*{den_j})*1000000 + 10*{den_j})"
            f" div (2*10*{den_j}) END"
        ),
    ).withColumn("jw_m", F.col("_m").cast("long")).withColumn(
        "jw_t", F.col("_t").cast("long")
    )
    return d.drop("_L1", "_L2", "_w", "_c1", "_c2", "_ml", "_m", "_sml", "_t", "_l")


def block_self_pairs(
    df: DataFrame,
    blk_col: str,
    order_col: str,
    hot_threshold: int = 4096,
    n_groups: int = 8,
) -> DataFrame:
    """All within-block row pairs ``(a, b)`` with ``a[order_col] <
    b[order_col]``, as two struct columns over ``df``'s schema. Blocks
    larger than ``hot_threshold`` are grid-decomposed over
    ``n_groups``^2 composite keys; the rest take the plain self-join.
    ``order_col`` must be block-unique (it both orders the pair and
    derives the deterministic grid group)."""
    cols = df.columns
    sizes = df.groupBy(blk_col).agg(F.count("*").alias("_bn"))
    packed = (
        df.join(sizes, blk_col)
        .select(blk_col, "_bn", F.struct(*cols).alias("s"))
        .localCheckpoint()  # feeds both paths' both sides
    )

    def pair(left: DataFrame, right: DataFrame, keys: list[str]) -> DataFrame:
        return (
            left.join(right, keys)
            .where(F.col("sa")[order_col] < F.col("sb")[order_col])
            .select(F.col("sa").alias("a"), F.col("sb").alias("b"))
        )

    cold = packed.where(F.col("_bn") <= hot_threshold)
    cold_pairs = pair(
        cold.select(blk_col, F.col("s").alias("sa")),
        cold.select(blk_col, F.col("s").alias("sb")),
        [blk_col],
    )

    hot = packed.where(F.col("_bn") > hot_threshold)
    grp = F.pmod(
        F.xxhash64(F.col("s")[order_col].cast("string")), F.lit(n_groups)
    ).cast("int")
    gseq = F.explode(F.expr(f"sequence(0, {n_groups - 1})"))
    # Explicit repartition BY the composite key with a pinned partition
    # count: a hot block's grid cells are few BYTES but enormous
    # COMPUTE (the m^2/g^2 comparisons happen inside the join), and
    # AQE's byte-based coalescing would fold all cells back onto one
    # task (measured: 253 s -> one task at 8k names). A user-pinned
    # repartition is exempt from AQE coalescing and satisfies the
    # join's distribution requirement, so the cells actually spread.
    parts = df.sparkSession.sparkContext.defaultParallelism
    hot_a = hot.select(
        blk_col, F.col("s").alias("sa"), grp.alias("ga"), gseq.alias("gb")
    ).repartition(parts, blk_col, "ga", "gb")
    hot_b = hot.select(
        blk_col, F.col("s").alias("sb"), gseq.alias("ga"), grp.alias("gb")
    ).repartition(parts, blk_col, "ga", "gb")
    hot_pairs = pair(hot_a, hot_b, [blk_col, "ga", "gb"])

    return cold_pairs.unionByName(hot_pairs)


def _cologne_case(c: str, p: str, n: str, i: str) -> str:
    """The Cologne-phonetics letter->digit table as one CASE expression,
    parameterized on the char-access syntax so the Spark and DuckDB
    expressions are generated from the SAME table (engine-portability
    rule). ``c``/``p``/``n`` are current/previous/next char expressions,
    ``i`` the 1-based position variable. Unlike Soundex/NYSIIS, every
    rule here is decidable from the (prev, curr, next) window alone —
    no in-place rewriting, so the whole encoding vectorizes."""
    return f"""CASE
 WHEN {c} IN ('a','e','i','j','o','u','y') THEN '0'
 WHEN {c} = 'h' THEN ''
 WHEN {c} = 'b' THEN '1'
 WHEN {c} = 'p' THEN CASE WHEN {n} = 'h' THEN '3' ELSE '1' END
 WHEN {c} IN ('d','t') THEN
   CASE WHEN {n} IN ('c','s','z') THEN '8' ELSE '2' END
 WHEN {c} IN ('f','v','w') THEN '3'
 WHEN {c} IN ('g','k','q') THEN '4'
 WHEN {c} = 'c' THEN CASE
   WHEN {i} = 1 THEN
     CASE WHEN {n} IN ('a','h','k','l','o','q','r','u','x')
          THEN '4' ELSE '8' END
   WHEN {p} IN ('s','z') THEN '8'
   WHEN {n} IN ('a','h','k','o','q','u','x') THEN '4'
   ELSE '8' END
 WHEN {c} = 'x' THEN CASE WHEN {p} IN ('c','k','q') THEN '8' ELSE '48' END
 WHEN {c} = 'l' THEN '5'
 WHEN {c} IN ('m','n') THEN '6'
 WHEN {c} = 'r' THEN '7'
 WHEN {c} IN ('s','z') THEN '8'
 ELSE '' END"""


def with_cologne(
    df: DataFrame, name_col: str, out: str = "cologne"
) -> DataFrame:
    """Append the Cologne-phonetics (Koelner Phonetik) code — the
    fourth linkage leg next to Soundex: a published phonetic key whose
    rules are all (prev, curr, next)-window-local, so the encode is
    three chained VECTORIZED passes (letter->digit map, adjacent-dup
    collapse, zero-strip keeping the leading digit) with no sequential
    fold at all. Per-row JVM string ops; embarrassingly parallel."""
    case = _cologne_case(
        f"substring({name_col}, i, 1)",
        f"IF(i = 1, '', substring({name_col}, i - 1, 1))",
        f"substring({name_col}, i + 1, 1)",
        "i",
    )
    d = df.withColumn(
        "_full",
        F.expr(
            f"concat_ws('', transform(sequence(1,"
            f" greatest(length({name_col}), 1)), i -> {case}))"
        ),
    )
    d = d.withColumn(
        "_dedup",
        F.expr(
            "concat_ws('', transform(sequence(1, greatest(length(_full),"
            " 1)), j -> IF(j = 1 OR substring(_full, j, 1) !="
            " substring(_full, j - 1, 1), substring(_full, j, 1), '')))"
        ),
    )
    return d.withColumn(
        out,
        F.expr(
            "concat(substring(_dedup, 1, 1),"
            " replace(substring(_dedup, 2), '0', ''))"
        ),
    ).drop("_full", "_dedup")


def cologne_duckdb_sql(name_col: str) -> str:
    """DuckDB mirror of :func:`with_cologne` as a scalar expression
    pipeline (generated from the same CASE table): returns SQL
    fragments (full_expr, dedup_from, key_from) the oracle composes
    as chained CTE columns."""
    case = _cologne_case(
        f"substr({name_col}, CAST(i AS INT), 1)",
        f"CASE WHEN i = 1 THEN '' ELSE"
        f" substr({name_col}, CAST(i - 1 AS INT), 1) END",
        f"substr({name_col}, CAST(i + 1 AS INT), 1)",
        "i",
    )
    return (
        f"array_to_string(list_transform(range(1,"
        f" greatest(length({name_col}), 1) + 1), i -> {case}), '')"
    )


def cologne_dedup_duckdb_sql(full_col: str) -> str:
    return (
        f"array_to_string(list_transform(range(1,"
        f" greatest(length({full_col}), 1) + 1), j -> CASE WHEN j = 1"
        f" OR substr({full_col}, CAST(j AS INT), 1) !="
        f" substr({full_col}, CAST(j - 1 AS INT), 1)"
        f" THEN substr({full_col}, CAST(j AS INT), 1) ELSE '' END), '')"
    )
