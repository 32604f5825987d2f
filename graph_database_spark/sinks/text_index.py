"""Persisted inverted text index — build-once-probe-many BM25.

The text twin of ``sinks/ann.py``: every retrieval query in
``operators/retrieval.py`` re-tokenizes and re-aggregates the corpus
per run — fine for one-shot analytics, wrong for the 100 TB serving
shape, where the corpus is indexed once and probed by many query
batches. This sink persists the classic inverted index as:

- a **bucketed parquet postings table** ``(term, doc_id, tf, dl)``,
  bucketed + sorted by ``term`` (sources/bucketed machinery) so a
  probe's term filter prunes buckets and the postings side — the
  corpus-scale data — is read without any Exchange;
- a **document-frequency table** (``_df`` parquet, vocabulary-sized)
  broadcast onto the matched postings at probe time;
- a **stats manifest** (JSON, two integers): n_docs and total token
  count, from which avgdl is reconstructed with the exact same
  int64->double cast-and-divide tree the refit path uses.

Probe parity with ``retrieval.bm25_search`` is pytest-pinned: the
scoring expression mirrors ``retrieval._term_scores`` operand for
operand (same idf, same length normalization, same micro snap), so an
index probe returns bit-identical rankings to the refit path.

Citation: the reference engine re-reads its edge files per run
(src/main.js:244-262) and has no text surface at all; this is the
Spark-native index lifecycle a search-serving deployment needs.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from graph_database_spark.operators.retrieval import _doc_terms, _micro
from graph_database_spark.sources.bucketed import write_bucketed

__all__ = ["build_text_index", "probe_text_index"]

_MANIFEST = "_text_index.json"


def build_text_index(
    docs: DataFrame,
    table: str,
    path: str,
    n_buckets: int = 16,
) -> None:
    """Tokenize once, persist postings + df + stats."""
    terms = _doc_terms(docs).localCheckpoint()
    tf = (
        terms.groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint()
    )
    dl = (
        terms.groupBy("doc_id")
        .agg(F.count("*").alias("dl"))
        .localCheckpoint()
    )
    postings = tf.join(dl, "doc_id").select("term", "doc_id", "tf", "dl")
    write_bucketed(postings, table, path, bucket_by="term", n_buckets=n_buckets)
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    df_.write.mode("overwrite").parquet(os.path.join(path, "_df"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    ).collect()[0]
    manifest = {
        "table": table,
        "n_docs": int(stats["n_docs"]),
        "sum_dl": int(stats["sum_dl"]),
    }
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _MANIFEST), "w") as fh:
        json.dump(manifest, fh)


def probe_text_index(
    spark: SparkSession,
    path: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top: int = 20,
) -> DataFrame:
    """BM25 top-k from the persisted index — no tokenize, no corpus
    scan beyond the query terms' own buckets. Returns the same
    ``(rank, doc_id, matched, score)`` frame as ``bm25_search``."""
    with open(os.path.join(path, _MANIFEST)) as fh:
        man = json.load(fh)
    postings = spark.table(man["table"]).where(
        F.col("term").isin(query_terms)
    )
    dfp = (
        spark.read.parquet(os.path.join(path, "_df"))
        .where(F.col("term").isin(query_terms))
    )
    # Mirror retrieval._term_scores operand for operand: int64->double
    # casts, the same literal placement, the same micro snap.
    n_docs = F.lit(man["n_docs"]).cast("long")
    sum_dl = F.lit(man["sum_dl"]).cast("long")
    k1c, bc = F.lit(float(k1)), F.lit(float(b))
    avgdl = sum_dl.cast("double") / n_docs.cast("double")
    idf = F.log(
        F.lit(1.0)
        + (n_docs.cast("double") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tnorm = (F.col("tf") * (k1c + F.lit(1.0))) / (
        F.col("tf")
        + k1c
        * (F.lit(1.0) - bc + bc * (F.col("dl").cast("double") / avgdl))
    )
    scored = postings.join(F.broadcast(dfp), "term").withColumn(
        "s_micro", _micro(idf * tnorm)
    )
    agg = scored.groupBy("doc_id").agg(
        F.count("*").alias("matched"), F.sum("s_micro").alias("sum_micro")
    )
    topk = agg.orderBy(F.desc("sum_micro"), F.asc("doc_id")).limit(top)
    w = Window.orderBy(F.desc("sum_micro"), F.asc("doc_id"))
    return (
        topk.withColumn("rank", F.row_number().over(w))
        .select(
            "rank",
            "doc_id",
            "matched",
            (F.col("sum_micro") / F.lit(1_000_000.0)).alias("score"),
        )
    )
