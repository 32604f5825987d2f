"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The real surface lives in ``graph_database_spark.catalog``; this module
is a thin re-export so the engine stays importable as a library.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from graph_database_spark import catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's proof-1 hypothesis pipeline
    (src/main.js:29-46) over the derived co-purchase graph at sf0.001."""
    return catalog.q_hypothesis_pct(spark, "/root/testdata/sf0.001")


# The driver's gate takes the FIRST 50 keys of queries(). That subset
# had been saturated at the same 39/11/0 since r5 while the catalog grew
# 121 -> 221 queries, so the external artifact never saw the strongest
# newer families (VERDICT r7 next-#1). r8 ROTATES the head-50: it keeps
# the 10 reference-surface queries, the graph core, and every rows-only
# production path (they get the weaker rows-only check nowhere else),
# and swaps ~20 long-saturated single-shape OLAP analogs for the
# never-externally-checked flagships (all locally hash-verified by
# scripts/check_correctness.py; the rotated-out queries remain in the
# catalog right after position 50, so extra driver capacity still
# reaches them first).
_HEAD_50 = [
    # reference surface (SURVEY §2.12, src/main.js:29-125)
    "node_count",
    "edge_count",
    "cooccurrence_pairs",
    "connected_pairs",
    "hypothesis_pct",
    "degree",
    "triangle_edges",
    "clustering_coefficient",
    "feature_decode",
    "circles_membership",
    # graph core
    "betweenness",
    "bfs_distances",
    "kcore",
    # rows-only production paths (weaker check, driver-only visibility)
    "pagerank",
    "pagerank_personalized",
    "dedup_minhash",
    "dedup_simhash",
    "ngram_jaccard",
    "staged_dedup",
    "text_embedding_neardup",
    "embedding_neardup_lsh",
    "ann_lsh",
    "ann_ivf",
    "snap_metrics",
    # r6/r7/r8 flagships, locally hash-verified, never driver-checked
    "hybrid_search",
    "graph_coloring",
    "knn_graph",
    "embedding_outliers",
    "max_spanning_forest",
    "audio_features",
    "video_motion",
    "pii_scan",
    "bpe_merges",
    "pq_codes",
    "span_dedup",
    "katz_centrality",
    "percolation",
    "kmeans_cells",
    "record_linkage",
    "entity_resolution",
    "hyper_anf",
    "bootstrap_replicates",
    "lorenz_curve",
    "psi_drift",
    "events_cusum",
    "theil_sen_trend",
    "spend_gini",
    "png_features",
    "scc_components",
    "topo_layers",
]

# Next tier: the queries rotated out of the historical head-50 plus the
# strongest remaining families — exercised first by any extra driver
# capacity beyond 50.
_NEXT_TIER = [
    "dedup_exact",
    "dedup_norm",
    "doc_fingerprint",
    "text_embedding_neardup_md5",
    "doc_chunks",
    "winnow_fingerprints",
    "text_token_stats",
    "lang_id",
    "quality_score",
    "similarity_topk",
    "embedding_neardup",
    "ann_lsh_md5",
    "embedding_neardup_lsh_md5",
    "ann_ivf_md5",
    "semdedup",
    "sssp_weighted",
    "label_propagation",
    "docs_hash_sample",
    "corpus_mixture",
    "token_packing",
    "json_extract_events",
    "events_hourly",
    "events_sessionize",
    "top3_orders",
    "pricing_summary",
    "events_sliding_1h",
    "events_resample",
    "edge_betweenness",
    "link_scores",
    "densest_subgraph",
    "events_rolling_median",
    "scd2_intervals",
    "weighted_sample",
    "quantile_hist",
    "frequent_itemsets",
    "source_reputation",
    "graph_diameter",
    "two_hop_reach",
    "msf_clusters",
    "link_negative_samples",
    "distinct_users_sliding",
    "vocab_oov",
    "matryoshka_fidelity",
    "label_confusion",
    "max_concurrency",
    "fk_integrity",
    "events_autocorr",
    "conversion_latency",
    "events_twap",
    "association_rules",
    "rfm_segments",
    "sequence_logloss",
    "customer_value_deciles",
    # r8 additions beyond the head-50
    "benford_prices",
    "jaccard_prefix_join",
    "incremental_agg",
    "chi_square_events",
    "incremental_distinct",
    "scc_reach",
    "bpe_encode",
    "weighted_median",
    "incremental_quantiles",
    "join_cardinality",
    "triangles_sampled",
    "item_cf",
    "table_diff",
    "group_split",
    "adpcm_features",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.11,
    ordered: the curated driver-gate head-50 first, then the rotated-out
    and strongest remaining queries, then the rest in catalog order."""
    head = [n for n in _HEAD_50 if n in catalog.QUERIES]
    tier = [n for n in _NEXT_TIER if n in catalog.QUERIES and n not in head]
    seen = set(head) | set(tier)
    rest = [n for n in catalog.QUERIES if n not in seen]
    return {n: catalog.QUERIES[n] for n in head + tier + rest}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query key; rows-only ops are omitted
    (catalog.ROWS_ONLY) and get the driver's weaker rows-only check."""
    return catalog.oracle_sql()
