"""End-to-end corpus curation CLI — the training-data pipeline as one job.

The batch shape a 100 TB curation run takes: staged dedup keeps the
best representative of every duplicate group, quality/language columns
annotate the survivors, deterministic stratified caps rebalance the
(lang, source) mix, and the kept corpus lands as partitioned parquet
(pruning-friendly layout) next to a one-row summary. Every stage is an
already-oracle-verified operator (catalog.py); this module only
composes them and writes.

Usage:
    python -m graph_database_spark.curate \
        --sf-dir /root/testdata/sf0.01 --out /tmp/curated \
        [--cap 200] [--sample 1.0]
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import functions as F

from graph_database_spark.corpus_api import Corpus
from graph_database_spark.session import get_spark
from graph_database_spark.sinks.parquet import write_partitioned
from graph_database_spark.sources.parquet import load_table


def curate(spark, sf_dir: str, out_dir: str, cap: int = 200, sample: float = 1.0) -> dict:
    docs = load_table(spark, sf_dir, "documents")
    corpus = Corpus(docs)
    n_in = docs.count()

    if sample < 1.0:
        corpus = Corpus(corpus.sample(sample))

    survivors = corpus.staged_dedup().select("doc_id")
    deduped = corpus.docs.join(survivors, "doc_id", "left_semi")

    # PII redaction BEFORE annotation: quality/language signals (and the
    # published corpus) never see raw emails/IPs/phones.
    from graph_database_spark.operators.pii import redact

    scrubbed = redact(deduped)
    n_pii = scrubbed.where(F.col("has_pii") == 1).count()
    kept = Corpus(scrubbed.drop("has_pii"))

    annotated = (
        kept.docs.join(kept.quality().select("doc_id", "quality"), "doc_id")
        .join(kept.lang_id().select("doc_id", F.col("lang").alias("lang_pred")), "doc_id")
    )
    balanced = Corpus(annotated).stratified(["lang", "source"], cap)

    write_partitioned(balanced, f"{out_dir}/corpus", ["lang", "source"])

    n_out = spark.read.parquet(f"{out_dir}/corpus").count()
    summary = {
        "input_docs": n_in,
        "dedup_survivors": survivors.count(),
        "pii_redacted_docs": n_pii,
        "kept_docs": n_out,
        "cap_per_stratum": cap,
    }
    with open(f"{out_dir}/summary.json", "w") as f:
        json.dump(summary, f)
    return summary


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--cap", type=int, default=200)
    p.add_argument("--sample", type=float, default=1.0)
    args = p.parse_args(argv)
    spark = get_spark("curate")
    print(json.dumps(curate(spark, args.sf_dir, args.out, args.cap, args.sample)))


if __name__ == "__main__":
    main()
