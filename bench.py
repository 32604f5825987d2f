"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is materialized with a count() (no driver-side row transfer);
value = total wall-clock over all headline queries.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from graph_database_spark import catalog
from graph_database_spark.session import get_spark

# Headline set: every major operator family, weighted toward the ones
# whose plans matter at scale (graph joins, LSH dedup, similarity).
HEADLINE = [
    "node_count",
    "edge_count",
    "hypothesis_pct",
    "degree",
    "clustering_coefficient",
    "betweenness",
    "feature_decode",
    "dedup_exact",
    "dedup_norm",
    "dedup_minhash",
    "dedup_simhash",
    "ngram_jaccard",
    "text_token_stats",
    "lang_id",
    "quality_score",
    "similarity_topk",
    "embedding_neardup",
    "ann_lsh",
    "json_extract_events",
    "events_hourly",
    "events_sessionize",
    "top3_orders",
    "pricing_summary",
    "shipping_priority",
    "local_supplier_volume",
    "returned_items",
    "rollup_customers",
    "events_asof_order",
    "order_events_7d",
    "cube_orders",
    "multimodal_features",
    "bfs_distances",
    "pagerank",
    "kcore",
    "label_propagation",
    "volume_shipping",
    "large_volume_customers",
    "triangle_count",
    "copurchase_components",
    "common_ngrams",
    "ngram_jaccard_exact",
    "quality_rules",
    "closeness_sampled",
    "link_prediction",
    "waiting_supplier_rank",
    "customer_distribution",
    "nation_market_share",
    "quality_dedup",
    "event_funnel",
    "event_anomalies",
    "decontamination",
    "embedding_pca",
    "tfidf_terms",
    "bm25_search",
    "unigram_logprob",
    "events_ewma",
    "bloom_semijoin",
    "embedding_quantize",
    "excess_suppliers",
    # r6 additions: the remaining major families the headline set
    # didn't yet time (IVF ANN, community quality, CMS sketch, cohort
    # retention, walk corpus).
    "ann_ivf",
    "community_modularity",
    "token_counts_cms",
    "user_retention",
    "random_walks",
    # r6 second wave: HITS, link-score family, feature standardization,
    # histogram quantiles.
    "hits_scores",
    "link_scores",
    "embedding_standardize",
    "quantile_hist",
    # r6 third wave: span-level dedup, geometry-derived graph, and the
    # point-process temporal family.
    "span_dedup",
    "knn_graph",
    "event_burstiness",
    "events_resample",
    "katz_centrality",
    "label_centroid_sim",
    "hybrid_search",
    "ngram_containment",
    "compression_ratio",
    "events_rolling_median",
    "graph_coloring",
    "densest_subgraph",
    "column_entropy",
    "edge_betweenness",
    "scd2_intervals",
    "event_features",
    "frequent_itemsets",
    "key_skew_profile",
    "events_anomaly_mad",
    "embedding_outliers",
    "token_novelty",
    "supplier_concentration",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf

    spark = get_spark("graph-database-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: run the first headline query once untimed so JVM/codegen/
    # parquet-footer startup cost isn't attributed to whichever query runs
    # first (r2: node_count absorbed ~8 s of session warmup, making
    # per-query deltas unattributable across rounds).
    try:
        catalog.QUERIES[HEADLINE[0]](spark, sf_dir).count()
    except Exception:
        pass

    def release_checkpoints() -> None:
        # localCheckpoint() blocks pin executor storage memory and are
        # never freed by plan GC within a session; without this, graph
        # queries' checkpointed edge frames accumulate across the run and
        # later queries execute under growing memory pressure (observed
        # as 2-3x noise on the tail of the r3 bench).
        for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            rdd.unpersist()

    release_checkpoints()
    timings: dict[str, float | None] = {}
    errors: dict[str, str] = {}
    total = 0.0
    for name in HEADLINE:
        # Per-query isolation: one raising query must not discard the other
        # 51 timings (BENCH_r04 was nulled exactly that way).
        fn = catalog.QUERIES[name]
        t0 = time.time()
        try:
            fn(spark, sf_dir).count()
        except Exception as exc:  # noqa: BLE001 — record and continue
            timings[name] = None
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
        else:
            dt = round(time.time() - t0, 3)
            timings[name] = dt
            total += dt
        release_checkpoints()

    out = {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
