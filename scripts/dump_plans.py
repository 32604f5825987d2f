"""Dump formatted physical plans of representative queries to PLANS.md.

Run after plan-affecting changes; the committed file is the review
artifact for scan pruning / join strategy / shuffle count decisions.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from graph_database_spark import catalog
from graph_database_spark.session import get_spark

SHOW = [
    "hypothesis_pct",
    "clustering_coefficient",
    "dedup_minhash",
    "embedding_neardup",
    "ann_lsh",
    "ann_ivf",
    "events_sessionize",
    "events_asof_order",
    "corpus_curation",
    "docs_hash_sample",
    "token_packing",
    "shipping_priority",
    "local_supplier_volume",
    "returned_items",
    "volume_shipping",
    "small_qty_revenue",
    "idle_rich_customers",
    "triangle_count",
    "common_ngrams",
    "ngram_jaccard_exact",
    "quality_rules",
    "priority_waiting_orders",
    "customer_distribution",
    "waiting_supplier_rank",
    "brand_quantity_revenue",
    "quality_dedup",
    "minhash_signatures",
    "event_anomalies",
    "link_prediction",
    "banded_revenue",
    "important_stock",
    "copurchase_strength",
    "event_funnel",
    "decontamination",
    "media_resize",
    "tfidf_terms",
    "bm25_search",
    "unigram_logprob",
    "dedup_minhash_md5",
    "events_ewma",
    "bloom_semijoin",
    "embedding_quantize",
    "excess_suppliers",
    "token_counts_cms",
    "walk_skipgrams",
    "degree_assortativity",
    "community_modularity",
    "user_retention",
    "link_scores",
    "embedding_standardize",
    "quantile_hist",
    "graph_drift",
    "zipf_slope",
    "event_transitions",
    "token_pmi",
    "triad_census",
    "degree_powerlaw",
    "semdedup",
    "sssp_weighted",
    "conductance",
    "phrase_search",
    "event_burstiness",
    "span_dedup",
    "knn_graph",
    "events_resample",
    "cumulative_users",
    "weighted_sample",
    "katz_centrality",
    "graph_global_stats",
    "label_centroid_sim",
    "order_percentiles",
    "ngram_containment",
    "hybrid_search",
    "compression_ratio",
    "events_rolling_median",
    "densest_subgraph",
    "column_entropy",
    "edge_betweenness",
    "user_event_paths",
    "scd2_intervals",
    "event_features",
    "frequent_itemsets",
    "key_skew_profile",
    "events_anomaly_mad",
    "embedding_outliers",
    "token_novelty",
    "order_seasonality",
    "supplier_concentration",
    "part_return_rate",
    "customer_value_deciles",
    # r7 additions
    "audio_features",
    "video_motion",
    "pii_scan",
    "source_reputation",
    "link_negative_samples",
    "record_linkage",
    "vocab_oov",
    "events_autocorr",
    "distinct_users_sliding",
    "conversion_latency",
    "label_confusion",
    "matryoshka_fidelity",
    "theil_sen_trend",
    "hyper_anf",
    "max_concurrency",
    "fk_integrity",
    "benford_prices",
    "entity_resolution",
    "events_twap",
    "pq_codes",
    "association_rules",
    "rfm_segments",
    "bootstrap_replicates",
    "spend_gini",
    "sequence_logloss",
    "percolation",
    "lorenz_curve",
    # r9 flagships
    "copurchase_projection",
    "item_cf",
    "token_heavy_hitters",
    "weighted_jaccard",
    "incremental_join",
    "parts_skyline",
    "audience_overlap",
    "events_ohlc",
    "km_survival",
    "embedding_gram",
    "ab_test_welch",
    "bleu_pairs",
    "rouge_l",
    "isotonic_calibration",
    "decision_stump",
    "jaro_winkler",
    "soundex_blocks",
    "node2vec_walks",
    "textrank_keywords",
    "inclusion_deps",
    "collocations_llr",
    "dedup_survivorship",
    "max_cover_seeds",
    "sprt_monitor",
    "f2_ams",
    "position_attribution",
    "timedecay_attribution",
    "diff_in_diff",
    "quantile_normalize",
    "rectangle_count",
    "corpus_policy",
    "ucb_replay",
    "ols_price_model",
    "logistic_calibration",
    "woe_iv",
    "target_encoding",
    "sorted_neighborhood",
    "sequential_rules",
    "seasonal_decompose",
    "mase_backtest",
    "image_ahash",
    "neyman_allocation",
    "quantile_digest",
    "quantile_digest_read",
    "k_anonymity_audit",
    "temporal_reachability",
    "prf_search",
    "pit_features",
    "zorder_index",
    "range_partition_plan",
    "bitmap_intersections",
    "benford_audit",
    "chi2_independence",
    "column_profile",
    "compaction_plan",
    "consistent_hash_rebalance",
    "markov_2step",
    "zonemap_pruning",
    "edge_reciprocity",
    "pareto_abc",
    "cuped_adjustment",
    "compaction_nextfit",
    "haar_orders",
    "naive_bayes_lang",
    "viterbi_paths",
    "holt_linear",
    "ndcg_eval",
    "rake_keywords",
    "cdc_chunks",
    "cdc_dedup",
    "randomized_response",
    "calibration_bins",
    "ks_drift",
    "mannwhitney_test",
    "spearman_nation",
    "hilbert_index",
    "dsir_selection",
    "als_factors",
    "events_changepoint",
    "platt_scaling",
    "hashed_features",
    "cologne_blocks",
    "conformal_intervals",
    "good_turing",
    "shapley_attribution",
    "ipw_effect",
    "wl_refinement",
    "jl_projection",
    "mrr_eval",
    "gram_power_iteration",
    "bm25_indexed",
    "ransac_line",
    "band_join_pairs",
    "em_gmm",
    "kneser_ney",
    "mutual_information",
    "boosted_stumps",
    "trimmed_mean",
    "uplift_segments",
    "markov_attribution",
    "emd_drift",
    "ar1_fit",
    "logrank_test",
    "propensity_matching",
    "metaphone_blocks",
    "suffix_array_dedup",
    "fellegi_sunter",
    "kfold_cv",
    "ktruss",
    "lof_outliers",
    "dbscan_customers",
    "mg_heavy_hitters",
    "cmh_test",
    # r11 additions
    "km_risk_table",
    "space_saving_hh",
    "priority_sample",
    "bh_fdr",
    "mmr_diversify",
    "knn_label_noise",
    "kcenter_coreset",
    "dedup_span_cuts",
    "dedup_span_apply",
    "compression_stored_twin",
    "cohens_kappa",
    "hopkins_statistic",
    # r12 additions
    "suffix_cross_doc",
    "decontamination_bloom",
    "gopher_repetition",
    "stratified_sample",
    "char_entropy",
    "edge_embeddedness",
    "merkle_ranges",
    "regression_discontinuity",
    "onion_layers",
    "tokenizer_fertility",
    "label_spreading",
    "holt_winters",
    "sax_symbols",
    "ann_recall_audit",
    "ivf_recall_audit",
    "perplexity_filter",
    "temperature_mixing",
    "t_closeness",
    "grouping_sets_revenue",
    "rag_chunks",
    "attribute_assortativity",
    "source_diversity",
    "interarrival_fit",
    "length_emd_matrix",
    "lsh_pair_prf",
    "rolling_beta",
    "powerlaw_alpha",
    "embedding_isotropy",
    "effective_diameter",
    "minhash_calibration",
    # r13 additions
    "dedup_incremental",
    "ann_ivfpq",
    "ivfpq_recall_audit",
    # r14 additions
    "ann_ivfpq_refined",
    # r14 (VERDICT r13 #7): full-coverage contract — every remaining
    # catalog query whose construction does NOT execute a fixpoint loop
    # (classified empirically: fixpoint.PLAN_CAPTURE stayed empty while
    # building the frame at sf0.001). tests/test_plans_coverage.py
    # enforces SHOW + ITERATIVE + EXCLUDED == catalog.QUERIES.
    "adpcm_features",
    "ann_ivf_md5",
    "ann_lsh_md5",
    "bigram_logprob",
    "bpe_encode",
    "bpe_merges",
    "bpe_pair_counts",
    "chi_square_events",
    "circles_membership",
    "column_stats",
    "connected_pairs",
    "cooccurrence_pairs",
    "corpus_mixture",
    "cube_orders",
    "customers_intersect_eventusers",
    "customers_minus_eventusers",
    "customers_without_orders",
    "dataset_split",
    "dedup_editdist_verify",
    "dedup_exact",
    "dedup_norm",
    "dedup_simhash",
    "degree",
    "degree_histogram",
    "distinct_users_hll",
    "distinct_users_kmv",
    "distinct_users_sketch",
    "doc_chunks",
    "doc_fingerprint",
    "doc_kl_divergence",
    "doc_repetition",
    "dp_order_stats",
    "edge_count",
    "embedding_neardup_lsh",
    "embedding_neardup_lsh_md5",
    "embedding_pca",
    "events_cusum",
    "events_hourly",
    "events_running_value",
    "events_sliding_1h",
    "fd_violations",
    "feature_decode",
    "group_split",
    "grouping_sets_orders",
    "heaps_fit",
    "incremental_agg",
    "incremental_distinct",
    "incremental_quantiles",
    "jaccard_prefix_join",
    "join_cardinality",
    "json_extract_events",
    "km_horizon_probe",
    "km_user_lifetimes",
    "kmeans_cells",
    "lang_id",
    "large_volume_customers",
    "local_bridges",
    "media_frames",
    "media_metadata",
    "min_cost_supplier",
    "mixture_weights",
    "multimodal_features",
    "nation_market_share",
    "ngram_jaccard",
    "node_count",
    "ntile_orders",
    "order_events_7d",
    "order_price_quantiles",
    "order_rank_stats",
    "order_stats_ext",
    "orders_pivot_year",
    "parts_supplier_counts",
    "png_features",
    "pricing_summary",
    "priority_line_counts",
    "product_profit",
    "promo_revenue",
    "psi_drift",
    "purchase_attribution",
    "quality_score",
    "quantile_treatment_effect",
    "readability",
    "rich_club",
    "rollup_customers",
    "score_auc",
    "simhash_signatures",
    "similarity_topk",
    "snap_metrics",
    "source_influence",
    "synthetic_control",
    "table_diff",
    "text_embedding_neardup",
    "text_embedding_neardup_md5",
    "text_token_stats",
    "top3_orders",
    "top_supplier",
    "top_tokens_per_lang",
    "triangle_edges",
    "triangles_sampled",
    "two_hop_reach",
    "user_event_types",
    "value_histogram",
    "video_codec_features",
    "weighted_median",
    "winnow_fingerprints",
]

# Iterative operators (r13, VERDICT r12 #4): their per-round plans are
# built and executed INSIDE the operator call, so plan_text() on the
# returned frame only shows the post-loop readout (onion_layers' union
# was the only artifact the five most expensive queries had — which is
# where the r12 perf regression hid). These run to completion at
# sf0.001 with fixpoint.PLAN_CAPTURE set, recording the pre-AQE plan of
# every state materialization; PLANS.md pins the per-materialization
# Exchange-count sequence plus the worst round's full plan.
ITERATIVE = [
    "scc_reach",
    # r14 coverage contract: every query whose CONSTRUCTION ran
    # fixpoint materializations at sf0.001 (captures>0 in the r14
    # classification sweep) — their meaningful plan artifact is the
    # per-materialization Exchange sequence, not the readout plan.
    "bfs_distances",
    "closeness_sampled",
    "copurchase_components",
    "coreness",
    "embedding_dedup_groups",
    "graph_diameter",
    "graph_mis",
    "hits_scores",
    "kcore",
    "label_propagation",
    "max_spanning_forest",
    "maximal_matching",
    "msf_clusters",
    "pagerank",
    "pagerank_personalized",
    "pagerank_personalized_quantized",
    "pagerank_quantized",
    "pagerank_weighted",
    "pagerank_weighted_quantized",
    "random_walks",
    "staged_dedup",
    "scc_components",
    "topo_layers",
    "onion_layers",
    "graph_coloring",
    "betweenness",
]

# Catalog queries deliberately absent from BOTH lists, with the reason
# the coverage test accepts. Empty today: the r14 classification put
# every query in SHOW (plain plan) or ITERATIVE (per-round capture).
EXCLUDED: dict[str, str] = {}

HEADER = """# Physical plans (sf0.01, AQE initial plans)

Generated by `python scripts/dump_plans.py`. What to look for:
scans list only needed columns (`ReadSchema`), dimension joins broadcast,
similarity plans contain no `CartesianProduct` (except the documented
broadcast top-k), and per-query shuffle (`Exchange`) counts stay flat as
data grows. The trailing "iterative per-round" sections pin each
state-materialization's Exchange count across a full run (sf0.001) —
a growing count round-over-round is the lineage/stats leak signature.
"""


def plan_text(spark, name: str, sf_dir: str = "/root/testdata/sf0.01") -> str:
    """Executed-plan string (pre-AQE initial plan) for a catalog query."""
    df = catalog.QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def count_exchanges(plan: str) -> int:
    """The shuffle counter PLANS.md and the plan-regression test share."""
    return len(re.findall(r"Exchange ", plan))


def main() -> None:
    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    out = [HEADER]
    for name in SHOW:
        plan = plan_text(spark, name)
        exchanges = count_exchanges(plan)
        schemas = re.findall(r"ReadSchema: (\S+)", plan)
        out.append(f"\n## {name}\n")
        out.append(f"- shuffles (Exchange nodes, pre-AQE): {exchanges}")
        out.append(f"- scan schemas: {sorted(set(s[:120] for s in schemas))}")
        out.append("\n```\n" + plan[:3000] + ("\n… (truncated)" if len(plan) > 3000 else "") + "\n```")
    from graph_database_spark.operators import fixpoint

    for name in ITERATIVE:
        fixpoint.PLAN_CAPTURE = []
        try:
            # sf0.001: round structure is graph-shape-bound, so the
            # smallest SF exercises the same per-round plan shapes the
            # big runs pay, in seconds instead of minutes.
            catalog.QUERIES[name](spark, "/root/testdata/sf0.001").count()
            plans = fixpoint.PLAN_CAPTURE
        finally:
            fixpoint.PLAN_CAPTURE = None
        counts = [count_exchanges(p) for p in plans]
        out.append(f"\n## {name} (iterative per-round, sf0.001)\n")
        out.append(
            f"- state materializations: {len(plans)}; Exchange count per"
            f" materialization: {counts}"
        )
        if plans:
            worst = max(range(len(plans)), key=lambda i: counts[i])
            out.append(
                f"- worst materialization (#{worst + 1},"
                f" {counts[worst]} exchanges):"
            )
            ptxt = plans[worst]
            out.append(
                "\n```\n"
                + ptxt[:3000]
                + ("\n… (truncated)" if len(ptxt) > 3000 else "")
                + "\n```"
            )
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out) + "\n")
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
