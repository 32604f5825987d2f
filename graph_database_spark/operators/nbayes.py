"""Multinomial Naive Bayes text classifier (train + predict) as pure
DataFrame algebra — the classic supervised baseline a corpus pipeline
trains on labeled docs (here: language labels) and applies at scale.

Train: one pass of grouped counts over the md5-bucketed train split
(class priors, per-(class, token) counts with Laplace smoothing).
Predict: explode test tokens, broadcast-join the (token, class) log-score
grid (|vocab| x |classes| rows — tiny), sum per (doc, class), argmax.

Cross-engine exactness: every libm-derived log term is snapped to
integer micro-units at the finest grain (one per (token, class) cell and
one per class prior) before any summation, per the CLAUDE.md micro-unit
rule — integer group-sums are partition-order-exact on both engines.

Scale posture: the model (score grid) is O(|vocab| x |classes|) and
broadcast; the only shuffle is the per-(doc, class) sum over exploded
test tokens, which is linear in corpus token mass. No driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from graph_database_spark.functions.textnorm import tokens

__all__ = ["nb_language_model", "nb_predict"]

# md5-bucket split fraction (percent of docs that train the model).
TRAIN_PCT = 80


def _bucket(doc_id):
    return (
        F.conv(F.md5(doc_id.cast("string")).substr(1, 4), 16, 10).cast("long")
        % 100
    )


def nb_language_model(docs: DataFrame):
    """Returns (grid, priors): the per-(token, class) Laplace-smoothed
    log-likelihood grid and the per-class log-prior, both in integer
    micro-units. grid: (tok, lang, tok_micro); priors: (lang,
    prior_micro, n_docs)."""
    train = docs.where(_bucket(F.col("doc_id")) < TRAIN_PCT)
    tok = train.select(
        "lang", F.explode(tokens(F.col("text"))).alias("tok")
    )
    # counts is tiny (|vocab| x |classes|) but feeds totals, vocab AND
    # the grid's left join — checkpoint so the scan+explode+groupBy
    # lineage runs once, not three times (CLAUDE.md reuse rule).
    counts = (
        tok.groupBy("lang", "tok")
        .agg(F.count("*").alias("n"))
        .coalesce(4)
        .localCheckpoint()
    )
    totals = counts.groupBy("lang").agg(F.sum("n").alias("tot"))
    vocab = counts.select("tok").distinct()
    vsize = vocab.agg(F.count("*").alias("v"))
    # Dense (token x class) grid so unseen pairs get the Laplace floor
    # count of 0 (+1 smoothing) instead of vanishing from the join.
    grid = (
        vocab.crossJoin(totals)
        .crossJoin(F.broadcast(vsize))
        .join(counts, ["lang", "tok"], "left")
        .select(
            "tok",
            "lang",
            F.expr(
                "CAST(round(1000000 * ln(CAST(coalesce(n, 0) + 1 AS DOUBLE)"
                " / CAST(tot + v AS DOUBLE)), 0) AS BIGINT)"
            ).alias("tok_micro"),
        )
    )
    ndocs = train.agg(F.count("*").alias("nd"))
    priors = (
        train.groupBy("lang")
        .agg(F.count("*").alias("n_docs"))
        .crossJoin(F.broadcast(ndocs))
        .select(
            "lang",
            F.expr(
                "CAST(round(1000000 * ln(CAST(n_docs AS DOUBLE)"
                " / CAST(nd AS DOUBLE)), 0) AS BIGINT)"
            ).alias("prior_micro"),
            "n_docs",
        )
    )
    return grid, priors


def nb_predict(docs: DataFrame) -> DataFrame:
    """Classify the held-out test split with the model trained on the
    train split: (doc_id, lang, pred_lang, score_micro). Out-of-vocab
    test tokens are dropped (standard multinomial NB). Ties break to the
    lexicographically smallest language."""
    grid, priors = nb_language_model(docs)
    test = docs.where(_bucket(F.col("doc_id")) >= TRAIN_PCT)
    ttok = test.select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("tok")
    )
    scored = (
        ttok.join(
            F.broadcast(grid.withColumnRenamed("lang", "cls")), "tok"
        )
        .groupBy("doc_id", "lang", "cls")
        .agg(F.sum("tok_micro").alias("tok_sum"))
        .join(F.broadcast(priors.withColumnRenamed("lang", "cls")), "cls")
        .select(
            "doc_id",
            "lang",
            "cls",
            (F.col("tok_sum") + F.col("prior_micro")).alias("score_micro"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_micro").desc(), F.col("cls").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            "lang",
            F.col("cls").alias("pred_lang"),
            "score_micro",
        )
    )
