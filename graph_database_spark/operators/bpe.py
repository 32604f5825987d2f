"""BPE tokenizer induction — the iterative merge loop (SURVEY §2.11 X5).

``text.bpe_pair_counts`` computes round-1 pair frequencies (the first
merge candidate); this module runs the actual Sennrich-style induction:
count adjacent symbol pairs over the word-frequency table, merge the
argmax pair greedily left-to-right in every word, repeat. The output is
the merge TABLE — the artifact a tokenizer trainer ships.

Exactness (hash-verified): pair counts are integer sums over the word
table; the argmax tie-breaks on (count DESC, sym_a, sym_b) — pure
ASCII-alnum symbols, so string order agrees cross-engine; and the
greedy left-to-right merge is replayed in the oracle with the
gaps-and-islands window formulation (select even-parity positions
inside each run of consecutive matches), which is provably the same
selection as the fold below: runs of overlapping matches only arise
for a == b pairs, and the fold's "last element already merged" test
resolves them to even parities. A merged symbol is strictly longer
than either source symbol, so it can never spuriously re-match within
the same round.

Scale posture: state is the VOCABULARY (one row per distinct word with
its count), not the corpus; each round is one map-side-combinable pair
aggregation + a bounded ONE-ROW argmax collect (driver-side model, the
IVF-centroid pattern) + a narrow per-word fold. Rounds are the
explicit cost knob, exactly as in production tokenizer training.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graph_database_spark.functions.textnorm import tokens
from graph_database_spark.operators.spread import spread

__all__ = ["bpe_merge_table", "bpe_encode_vocab"]


def bpe_merge_table(docs: DataFrame, n_merges: int = 3) -> DataFrame:
    """``(merge_round, sym_a, sym_b, pair_count)`` — the first
    ``n_merges`` BPE merges learned from the corpus word frequencies."""
    out, _ = _induce(docs, n_merges)
    return out


def bpe_encode_vocab(docs: DataFrame, n_merges: int = 3) -> DataFrame:
    """``(w, cnt, n_syms, encoding)`` — the vocabulary ENCODED under
    the first ``n_merges`` learned merges ('|'-joined symbols): the
    tokenizer-apply step, i.e. what every downstream token-count /
    packing / LM-scoring job consumes. Same induction loop as
    :func:`bpe_merge_table`; the oracle replays the merge applications
    per word (the gaps-and-islands formulation) and serializes the
    final symbol table, so the APPLY path is hash-verified too, not
    just the learned merge list."""
    _, seqs = _induce(docs, n_merges)
    return seqs.select(
        "w",
        "cnt",
        F.size("syms").cast("long").alias("n_syms"),
        F.array_join("syms", "|").alias("encoding"),
    )


def _induce(docs: DataFrame, n_merges: int):
    """Shared Sennrich loop: returns (merge table DF, final seqs DF)."""
    spark = docs.sparkSession
    words = (
        spread(docs)
        .select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    seqs = words.select(
        "w",
        "cnt",
        F.expr(
            "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
        ).alias("syms"),
    ).localCheckpoint()  # feeds pair counting AND the merge fold, per round

    out: list[tuple[int, str, str, int]] = []
    for r in range(1, n_merges + 1):
        pairs = (
            seqs.where(F.size("syms") >= 2)
            .select(
                "cnt",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1),"
                        " i -> struct(element_at(syms, i) AS a,"
                        "             element_at(syms, i + 1) AS b))"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("pair_count"))
        )
        top = pairs.orderBy(F.desc("pair_count"), "a", "b").limit(1).collect()
        if not top:
            # The unrolled oracle CROSS JOINs top{r}, so an empty merge
            # round would silently empty its sym{r+1} while this loop
            # kept the last seqs — fail loudly instead of diverging
            # (ADVICE r8: degenerate single-char vocabularies).
            raise ValueError(
                f"bpe: merge round {r} found no adjacent symbol pairs; "
                f"corpus vocabulary exhausted before n_merges={n_merges}"
            )
        a, b, pc = top[0]["a"], top[0]["b"], int(top[0]["pair_count"])
        out.append((r, a, b, pc))
        merged = a + b
        # Greedy left-to-right merge: fold each word's symbols; merge
        # when the accumulated tail is `a` and the incoming symbol is
        # `b`. The merged string is strictly longer than `a`, so it
        # never re-matches as the left side within this round.
        seqs = seqs.select(
            "w",
            "cnt",
            F.aggregate(
                F.col("syms"),
                F.expr("CAST(array() AS array<string>)"),
                lambda acc, s: F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == F.lit(a))
                    & (s == F.lit(b)),
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
                    ),
                ).otherwise(F.concat(acc, F.array(s))),
            ).alias("syms"),
        ).localCheckpoint()
    table = spark.createDataFrame(
        out, "merge_round int, sym_a string, sym_b string, pair_count long"
    )
    return table, seqs
