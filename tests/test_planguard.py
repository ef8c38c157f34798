"""Plan-level regression guard for the continuation-session queries.

Asserts the physical plans contain no CartesianProduct (the unbounded
cross product — BroadcastNestedLoopJoin over 1-row literal anchors and
tiny generator frames is the accepted pattern and is NOT flagged) and
no row-at-a-time Python evaluation (BatchEvalPython) — the two plan
shapes that do not survive a 100x scale-up. tools/plan_audit.py writes
the full headline audit to PLANS.md; this test pins the invariant in
CI for the queries added in this session.
"""

from __future__ import annotations

import os
import re

import pytest

from social_link_prediction_spark import queries as q

SF_DIR = "/root/testdata/sf0.001"

NEW_QUERIES = [
    "katz_suppliers",
    "triangle_doulion",
    "frequent_itemsets_pairs",
    "revenue_concentration_gini",
    "mutual_information_priority_segment",
    "feature_scaling_audit",
    "neyman_allocation_sample",
    "l_diversity_audit",
    "multitouch_attribution",
    "ivf_silhouette_audit",
    "poisson_bootstrap_mean",
    "seasonal_residual_anomalies",
    "item_item_cosine_topk",
    "join_size_estimate",
    "information_gain_features",
    "conversion_latency_stats",
    "cf_recommend_parts_c1",
]

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


# round-5 additions (non-mapInPandas paths only: media_video_features
# is Arrow-batched by design and would trip neither assert anyway)
R5_QUERIES = [
    "trajectory_minhash_topk",
    "graph_build_weights",
    "year_feature_audit",
    "feature_assembly_audit",
    "six_degrees_summary",
    "hll_daily_users",
    "skyline_parts",
    "ols_revenue_trend",
    "cusum_changepoint",
    "table_fingerprint_audit",
    "weighted_median_price",
    "ab_test_zscore",
    "join_ivm_nation_orders",
    "temperature_mixture_langs",
    "kaplan_meier_conversion",
    "kmeans_embeddings",
    "markov_stationary_events",
    # r5 continuation: stats/corpus/graph/ANN batches
    "ewma_control_chart",
    "ks_test_price_segments",
    "chi2_priority_segment",
    "t_closeness_audit",
    "association_rules_items",
    "collocation_pmi_bigrams",
    "heaps_law_vocab",
    "theil_sen_revenue_trend",
    "rich_club_suppliers",
    "reciprocity_suppliers",
    "ann_recall_audit",
    "calibration_reliability_bins",
    "fdr_bh_nation_anomalies",
    "forecast_backtest_daily",
    # r5 second continuation: time-series, inference, causal,
    # LLM-curation, graph batches
    "acf_daily_events",
    "jackknife_nation_ratio",
    "zorder_layout_audit",
    "grid_dbscan_parts",
    "mann_whitney_price_segments",
    "spearman_size_price",
    "stl_decompose_daily",
    "mann_kendall_revenue_trend",
    "conformal_forecast_intervals",
    "rfm_segments",
    "isotonic_calibration_bins",
    "shapley_attribution_channels",
    "anova_price_segments",
    "covariate_balance_smd",
    "cuped_variance_reduction",
    "diff_in_diff_event_rates",
    "dsir_importance_weights",
    "ccnet_perplexity_buckets",
    "ab_test_power_mde",
    "anf_neighborhood_function",
    "scan_structural_similarity",
    "median_ci_binomial",
    "trimmed_winsorized_price",
    "frequent_event_paths",
    "cmh_test_priority_status",
    "overdispersion_event_counts",
    "hurst_exponent_daily",
    "entropy_rate_events",
    "linkpred_heuristic_eval",
    "attribute_assortativity_nation",
    "triangle_significance_null",
    "logrank_test_cohorts",
    "embedding_drift_by_label",
    "rolling_median_daily",
    "information_value_acctbal",
    "zipf_law_tokens",
    "stratified_ate_estimate",
    "seasonality_strength_daily",
    "matryoshka_truncation_audit",
    "delta_method_ratio_se",
    "msprt_ab_monitor",
    "cohort_ltv_curves",
    "token_burstiness_top",
    "huber_revenue_trend",
    "qini_uplift_deciles",
    "simpsons_paradox_screen",
    "interarrival_burstiness_users",
    "hour_of_day_uniformity",
    "clustering_by_degree",
    "brier_decomposition",
    "kendall_tau_binned",
    "langid_confusion_matrix",
    "cross_source_overlap",
    "negbinom_fit_events",
    "decile_lift_table",
    "icc_nation_totalprice",
    "capture_recapture_users",
    "mcnemar_model_compare",
    "cohens_kappa_langid",
    "pr_curve_score",
    "component_size_distribution",
    "hubness_audit_embeddings",
    "dau_mau_stickiness",
    "auc_exact_score",
    "ks_score_separation",
    "lorenz_curve_revenue",
    "hhi_market_concentration",
    "percolation_hub_removal",
    "embedding_isotropy_audit",
    "extreme_value_daily_peaks",
    "order_to_ship_latency",
    "growth_accounting_monthly",
    "pps_systematic_sample",
    "spectral_power_weekly",
    "session_threshold_sensitivity",
    "revenue_decomposition_mom",
    "abc_xyz_classification",
    "wilson_interval_priorities",
    "eb_shrunken_rates_nation",
    "vocab_richness_estimators",
    # round-6 additions
    "bucketed_rank_stats",
    "hyperball_anf_suppliers",
    "ndcg_popularity_baseline",
    "effective_diameter_suppliers",
    "jl_projection_audit",
    "time_decay_attribution",
    "hybrid_rrf_search_docs",
    "bpe_merges_docs",
    "textrank_keywords",
    "holt_forecast_daily",
    "embedding_covariance_spectrum",
    "densest_subgraph_suppliers",
    "containment_neardup_docs",
]

# round-6 second continuation wave
R6C_QUERIES = [
    "runs_test_daily_revenue",
    "hill_tail_index_price",
    "bloom_join_prune_audit",
    "skew_salting_plan",
    "sax_motifs_daily",
    "croston_forecast_urgent",
    "permutation_test_events",
    "salsa_partsupp",
    "wasserstein_price_segments",
    "energy_distance_embeddings",
    "cooks_distance_influence",
    "levene_test_price_segments",
    "bowtie_structure_suppliers",
    "dp_noisy_histogram",
    "page_hinkley_events",
    "image_ahash_neardup",
    "fim_split_audit",
    "span_corruption_plan",
    "kruskal_wallis_price_segments",
    "seasonal_mann_kendall_revenue",
    "pacf_daily_events",
    "weibull_fit_latency",
    "matrix_profile_daily",
    "watermark_lateness_audit",
    "price_elasticity_by_type",
    "quantile_treatment_effects",
    "hll_precision_sweep",
    "null_rate_drift_audit",
    "graph_deanonymization_risk",
    "crosscorr_purchase_click",
    "minhash_accuracy_audit",
    "write_partition_skew_audit",
    "otsu_quality_threshold",
    "safety_stock_by_brand",
    "longest_contamination_run",
    "markov_next_event_accuracy",
    "median_polish_weekday_month",
    "rmst_conversion",
    "randomized_response_estimate",
    "approx_percentile_accuracy_sweep",
    "peak_detection_daily",
    "dedup_state_ttl_audit",
    "bradley_terry_source_ranking",
    "encoding_advisor_orders",
    "twoway_anova_interaction",
    "mediation_priority_quantity",
    "kendall_w_nation_rankings",
    "granger_click_purchase",
    "best_split_changepoint",
    "variance_ratio_test",
    "qn_scale_daily",
    "theil_index_decomposition",
    "ipf_raking_weights",
    "burrows_delta_sources",
    "avg_neighbor_degree_curve",
]


# round-6 third wave: recursion-shaped graph ops, exact combinatorial
# inference on the shared-lgamma text, sketch/encoding/packing planners
R6D_QUERIES = [
    "eigenvector_centrality_suppliers",
    "hierarchy_rollup_parts",
    "temporal_reach_suppliers",
    "fisher_exact_priority_status",
    "bayes_ab_conversion",
    "ams_f2_tokens",
    "target_encoding_oof",
    "adstock_ols_events",
    "compaction_packing_plan",
    "mst_nation_trade",
    "independent_cascade_spread",
    "cox_ph_conversion",
    "kneser_ney_bigram_docs",
    "platt_calibration_scores",
    "sbg_churn_fit",
    "ql_dirichlet_search_docs",
    "good_turing_counts",
    "ips_policy_eval",
    "hierarchical_forecast_reconciliation",
    "em_gaussian_mixture_price",
    "gamma_gamma_spend_fit",
    "fellegi_sunter_em",
    "competing_risks_cif",
    "fiedler_scores_suppliers",
    "panel_fe_elasticity",
    "rolling_7d_hll_users",
    "stupid_backoff_trigram_docs",
    "psm_att_building",
    "markov_absorption_funnel",
    "youden_f1_threshold",
    "holt_winters_weekly",
    "fairness_audit_scores",
    "selectivity_independence_audit",
    "minmax_pruning_audit",
    "view_advisor_greedy",
    "knn_shapley_valuation",
    "glm_poisson_orders",
    "mmd_embeddings",
    "erlang_c_staffing",
    "partial_correlation_screen",
    "ransac_line_fit",
]


@needs_testdata
@pytest.mark.parametrize(
    "name", NEW_QUERIES + R5_QUERIES + R6C_QUERIES + R6D_QUERIES
)
def test_no_cartesian_or_python_rowloop(spark, name):
    df = q.QUERIES[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: unbounded cross product"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"


def test_sampled_graph_generator_isolated():
    """VERDICT r5 item 4: the N² crossJoin+hash testdata edge
    generator must live ONLY in graph/testgraph.py — query bodies get
    their sampled graph through tg.sampled_edges (so a production
    deployment swaps one source function, not ~16 inlined devices).
    Guard: no query body pair-expands a corpus table against itself
    with the hash-filter device."""
    import social_link_prediction_spark as pkg

    root = os.path.dirname(pkg.__file__)
    offenders = []
    for dirpath, _dirs, files in os.walk(root):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            if path.endswith(os.path.join("graph", "testgraph.py")):
                continue
            src = open(path).read()
            # the device signature: the PYSPARK hash-threshold filter
            # over the "src-dst" pair string (oracle SQL strings also
            # carry the device — DuckDB must replay it — so match the
            # DataFrame-expression form only)
            if re.search(
                r'hash60\(F\.format_string\("%d-%d", "src", "dst"\),'
                r' F\.lit\([^)]*\)\)\s*\n?\s*%\s*10000',
                src,
            ):
                offenders.append(os.path.relpath(path, root))
    assert not offenders, f"inlined N² edge generator in: {offenders}"


@needs_testdata
def test_mixture_rebalance_broadcasts_report_join(spark):
    """VERDICT r4 item 3: the 5x5 plan-vs-kept report join must stay a
    broadcast join — without the hint Spark planned it as a full
    SortMergeJoin with two shuffles (the r4 bench regression)."""
    df = q.QUERIES["mixture_rebalance_langs"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, "mixture report join lost its broadcast"
    assert "BroadcastHashJoin" in plan
