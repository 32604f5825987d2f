"""Prefix-filtered exact Jaccard (PPJoin-style): result parity with the
full-inverted-index exact path, and a real candidate-count reduction on
a boilerplate-heavy corpus."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from graph_database_spark.operators.dedup import (
    _shingles_from,
    _tokens_df,
    ngram_jaccard_exact_pairs,
    prefix_jaccard_pairs,
)
from graph_database_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in df.collect()
    )


def test_prefix_join_matches_full_index(spark):
    docs = load_table(spark, SF_DIR, "documents")
    full = _rows(ngram_jaccard_exact_pairs(docs))
    pref = _rows(prefix_jaccard_pairs(docs))
    assert pref == full
    assert len(full) > 0


def test_prefix_join_parity_on_boilerplate_corpus(spark):
    # Every doc shares the same boilerplate header (a corpus-common
    # shingle run); only 1-2 and 3-4 are true near-dups.
    boiler = "terms of service apply to this document"
    rows = [
        (1, f"{boiler} alpha beta gamma delta epsilon zeta"),
        (2, f"{boiler} alpha beta gamma delta epsilon eta"),
        (3, f"{boiler} one two three four five six"),
        (4, f"{boiler} one two three four five seven"),
        (5, f"{boiler} completely different tail tokens here now"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    full = _rows(ngram_jaccard_exact_pairs(docs))
    pref = _rows(prefix_jaccard_pairs(docs))
    assert pref == full
    assert {(a, b) for a, b, _ in full} >= {(1, 2), (3, 4)}


def _candidate_counts(spark, docs, shingle_k=3, threshold=0.5):
    toks = _tokens_df(docs, "text", "doc_id")
    sets_df = (
        toks.where(F.size("toks") >= shingle_k)
        .select(
            "id",
            F.array_distinct(_shingles_from(F.col("toks"), shingle_k)).alias("sh"),
        )
        .withColumn("n", F.size("sh"))
    )
    inv = sets_df.select("id", "n", F.explode("sh").alias("g"))
    full = (
        inv.toDF("id_a", "na", "g")
        .join(inv.toDF("id_b", "nb", "g"), "g")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .count()
    )
    dfreq = inv.groupBy("g").agg(F.count("*").alias("df"))
    w = Window.partitionBy("id").orderBy("df", "g")
    prefix = (
        inv.join(dfreq, "g")
        .withColumn("rn", F.row_number().over(w))
        .where(
            F.col("rn")
            <= F.col("n") - F.ceil(F.lit(threshold) * F.col("n")).cast("int") + 1
        )
        .select("id", "g")
    )
    pref = (
        prefix.toDF("id_a", "g")
        .join(prefix.toDF("id_b", "g"), "g")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .count()
    )
    return full, pref


def test_prefix_filter_shrinks_candidates(spark):
    docs = load_table(spark, SF_DIR, "documents")
    full, pref = _candidate_counts(spark, docs)
    assert pref < full, (full, pref)
