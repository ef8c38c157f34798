"""Law tests for the round-6 continuation query families — properties
the DuckDB parity gate can't express (it replays the same algebra;
these check the MATH against independent ground truth): runs-test
moment identities, Hill-estimator positivity/ordering, the Bloom
no-false-negative guarantee, salting-plan arithmetic, SAX alphabet
closure, Croston weight normalization, permutation-test bounds, the
Wasserstein >= |mean gap| inequality, energy-distance structure,
Cook's-distance/leverage ranges, Levene degrees of freedom, and the
PACF lag-1 == ACF lag-1 identity."""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from social_link_prediction_spark import queries as q

SF_DIR = "/root/testdata/sf0.001"
needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@needs_testdata
def test_runs_test_moment_identities(spark):
    r = q.QUERIES["runs_test_daily_revenue"](spark, SF_DIR).collect()[0]
    assert r.n == r.n_pos + r.n_neg
    assert 1 <= r.n_runs <= r.n
    # closed-form E[R] recomputed independently
    exp = 2.0 * r.n_pos * r.n_neg / r.n + 1
    assert abs(r.exp_runs - round(exp, 6)) < 1e-9
    # z sign agrees with observed-vs-expected direction
    assert (r.z_runs < 0) == (r.n_runs < r.exp_runs)


@needs_testdata
def test_hill_estimator_laws(spark):
    rows = q.QUERIES["hill_tail_index_price"](spark, SF_DIR).collect()
    assert [r.k for r in rows] == [50, 100, 200]
    for r in rows:
        assert r.hill_h > 0 and r.tail_alpha > 0
        # reciprocal identity, allowing for the 6-dp display rounding
        # of each side (d(1/h) = dh/h^2 amplifies the h rounding)
        assert abs(r.tail_alpha * r.hill_h - 1.0) < 1e-3
    # the k-th largest threshold shrinks as k grows
    ths = [r.threshold for r in rows]
    assert ths[0] >= ths[1] >= ths[2]


@needs_testdata
def test_bloom_filter_guarantees(spark):
    r = q.QUERIES["bloom_join_prune_audit"](spark, SF_DIR).collect()[0]
    # THE Bloom guarantee: no false negatives, ever
    assert r.n_false_neg == 0
    assert r.n_predicted == r.n_actual + r.n_false_pos
    assert r.n_bits_set <= min(4096, 4 * r.n_keys)
    assert 0.0 <= r.fp_expected <= 1.0


@needs_testdata
def test_salting_plan_arithmetic(spark):
    rows = q.QUERIES["skew_salting_plan"](spark, SF_DIR).collect()
    for r in rows:
        assert r.n_rows > 32
        assert r.salt_factor == math.ceil(r.n_rows / 32.0)
        assert 0.0 < r.share <= 1.0
    counts = [r.n_rows for r in rows]
    assert counts == sorted(counts, reverse=True)


@needs_testdata
def test_sax_motifs_alphabet_closure(spark):
    rows = q.QUERIES["sax_motifs_daily"](spark, SF_DIR).collect()
    assert rows, "daily series long enough for width-3 words"
    for r in rows:
        assert len(r.motif) == 3 and set(r.motif) <= set("abcd")
    counts = [r.n_occurrences for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_croston_weights_are_a_probability_vector():
    assert sum(q._CROSTON_W) == 1.0  # exact in binary
    assert all(w > 0 for w in q._CROSTON_W)


@needs_testdata
def test_croston_forecast_laws(spark):
    r = q.QUERIES["croston_forecast_urgent"](spark, SF_DIR).collect()[0]
    # smoothed size of integer demands >= 1; smoothed interval >= 1 day
    assert r.z_hat >= 1.0 and r.p_hat >= 1.0
    assert abs(r.croston_rate - r.z_hat / r.p_hat) < 1e-5
    assert 0.0 < r.empirical_rate <= 1.0 * r.z_hat


@needs_testdata
def test_permutation_test_bounds(spark):
    r = q.QUERIES["permutation_test_events"](spark, SF_DIR).collect()[0]
    assert r.n_perm == 64
    assert 0 < r.n1 < r.n
    assert round(1.0 / 65, 6) <= r.p_value <= 1.0
    assert abs(r.obs_diff - round(r.mean_treat - r.mean_ctrl, 6)) < 2e-6


@needs_testdata
def test_salsa_scores_positive_sorted(spark):
    rows = q.QUERIES["salsa_partsupp"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.authority > 0 and r.degree >= 1
    scores = [r.authority for r in rows]
    assert scores == sorted(scores, reverse=True)


@needs_testdata
def test_wasserstein_dominates_mean_gap(spark):
    r = q.QUERIES["wasserstein_price_segments"](spark, SF_DIR).collect()[0]
    assert r.w1_dollars >= 0 and 0.0 <= r.w1_rel <= 1.0
    # W1(P, Q) >= |E[P] - E[Q]| — Jensen on the coupling definition
    o = q._t(spark, SF_DIR, "orders")
    c = q._t(spark, SF_DIR, "customer")
    m = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .groupBy("c_mktsegment")
        .agg(F.avg("o_totalprice").alias("m"))
        .collect()
    )
    gap = abs(m[0].m - m[1].m)
    assert r.w1_dollars >= gap - 1e-4


@needs_testdata
def test_energy_distance_structure(spark):
    r = q.QUERIES["energy_distance_embeddings"](spark, SF_DIR).collect()[0]
    assert r.n_aa >= 0 and r.n_bb >= 0 and r.n_ab > 0
    assert r.mean_between > 0
    got = 2 * r.mean_between - r.mean_within_a - r.mean_within_b
    assert abs(r.energy_distance - round(got, 6)) < 2e-6


@needs_testdata
def test_cooks_distance_ranges(spark):
    rows = q.QUERIES["cooks_distance_influence"](spark, SF_DIR).collect()
    assert len(rows) == 10
    for r in rows:
        assert 0.0 < r.leverage < 1.0
        assert r.cooks_d >= 0.0
    cds = [r.cooks_d for r in rows]
    assert cds == sorted(cds, reverse=True)


@needs_testdata
def test_levene_degrees_of_freedom(spark):
    r = q.QUERIES["levene_test_price_segments"](spark, SF_DIR).collect()[0]
    assert r.df1 == r.k - 1
    assert r.df2 == r.n - r.k
    assert r.w_stat >= 0.0


@needs_testdata
def test_pacf_lag1_equals_acf_lag1(spark):
    pacf = {r.lag: r.pacf for r in q.QUERIES["pacf_daily_events"](spark, SF_DIR).collect()}
    acf = {r.lag: r.acf for r in q.QUERIES["acf_daily_events"](spark, SF_DIR).collect()}
    assert len(pacf) == 7
    # Durbin-Levinson base case: phi_11 is exactly r_1
    assert abs(pacf[1] - acf[1]) < 1e-9
    for v in pacf.values():
        assert abs(v) <= 1.5  # sample estimates stay near the unit disc


@needs_testdata
def test_bowtie_partitions_all_nodes(spark):
    rows = q.QUERIES["bowtie_structure_suppliers"](spark, SF_DIR).collect()
    assert {r.component for r in rows} <= {"core", "in", "out", "other"}
    n_sup = q._t(spark, SF_DIR, "supplier").count()
    assert sum(r.n_nodes for r in rows) == n_sup
    assert abs(sum(r.frac for r in rows) - 1.0) < 1e-4


@needs_testdata
def test_dp_histogram_release_laws(spark):
    rows = q.QUERIES["dp_noisy_histogram"](spark, SF_DIR).collect()
    assert len(rows) == 10 and [r.bin for r in rows] == list(range(10))
    n_orders = q._t(spark, SF_DIR, "orders").count()
    assert sum(r.true_n for r in rows) == n_orders
    for r in rows:
        assert abs(abs(r.noisy_n - r.true_n) - r.abs_err) < 2e-6
        # Laplace(b=1) tail: |noise| beyond ~28 has prob < 1e-12
        assert r.abs_err < 28.0


@needs_testdata
def test_page_hinkley_structure(spark):
    r = q.QUERIES["page_hinkley_events"](spark, SF_DIR).collect()[0]
    assert r.ph_stat >= 0.0 and getattr(r, "lambda") > 0.0
    assert r.detected == (r.detect_day is not None)


def test_perceptual_ahash_real_path(spark):
    from social_link_prediction_spark.pipelines import imagecodec
    from social_link_prediction_spark.pipelines import multimodal as mm

    def grad(w, h, flip=False):
        rows = [
            [
                (
                    (255 - (x * 255 // max(w - 1, 1))) if flip
                    else (x * 255 // max(w - 1, 1)),
                ) * 3
                for x in range(w)
            ]
            for y in range(h)
        ]
        return imagecodec.encode_png_rgb(rows)

    a = grad(20, 12)
    c = grad(20, 12, flip=True)
    df = spark.createDataFrame(
        [(1, bytearray(a)), (2, bytearray(a)), (3, bytearray(c))],
        "media_id long, content binary",
    )
    rows = {r.media_id: r for r in mm.perceptual_ahash(df, fake=False).collect()}
    assert rows[1].ahash == rows[2].ahash  # identical image, identical hash
    ham = bin(rows[1].ahash ^ rows[3].ahash).count("1")
    assert ham >= 20  # inverted gradient flips most blocks
    for r in rows.values():  # bands re-pack to the hash
        packed = (
            r.band0 | (r.band1 << 15) | (r.band2 << 30) | (r.band3 << 45)
        )
        assert packed == r.ahash


@needs_testdata
def test_fim_split_is_lossless(spark):
    rows = q.QUERIES["fim_split_audit"](spark, SF_DIR).collect()
    for r in rows:
        # the lossless-transform guarantee: every doc reassembles
        assert r.n_reassembly_ok == r.n_docs
        fracs = r.mean_prefix_frac + r.mean_middle_frac + r.mean_suffix_frac
        assert abs(fracs - 1.0) < 1e-4


@needs_testdata
def test_span_corruption_plan_bounds(spark):
    rows = q.QUERIES["span_corruption_plan"](spark, SF_DIR).collect()
    for r in rows:
        assert r.mean_spans_per_doc >= 1.0
        # planner can only undershoot the 15% target (k rounds down)
        assert 0.0 <= r.corrupt_frac <= 0.16


@needs_testdata
def test_kruskal_wallis_structure(spark):
    r = q.QUERIES["kruskal_wallis_price_segments"](spark, SF_DIR).collect()[0]
    assert r.k == 5 and r.df == 4
    assert r.h_stat >= 0.0
    # tie correction can only inflate H
    assert r.h_corrected >= r.h_stat - 1e-9


@needs_testdata
def test_seasonal_mk_structure(spark):
    r = q.QUERIES["seasonal_mann_kendall_revenue"](spark, SF_DIR).collect()[0]
    assert r.n_seasons == 7
    assert r.var_total > 0
    assert r.significant == (abs(r.z_sk) > 1.96)


@needs_testdata
def test_weibull_fit_laws(spark):
    r = q.QUERIES["weibull_fit_latency"](spark, SF_DIR).collect()[0]
    assert r.shape_k > 0 and r.scale_days > 0
    assert 0.0 <= r.r2 <= 1.0


@needs_testdata
def test_matrix_profile_structure(spark):
    rows = q.QUERIES["matrix_profile_daily"](spark, SF_DIR).collect()
    ds = [r for r in rows if r.kind == "discord"]
    ms = [r for r in rows if r.kind == "motif"]
    assert len(ds) == 5 and len(ms) == 5
    # every motif NN distance <= every discord NN distance
    assert max(m.profile_dist for m in ms) <= min(d.profile_dist for d in ds)
    for r in rows:
        assert r.profile_dist >= 0.0


@needs_testdata
def test_watermark_lateness_monotone(spark):
    rows = q.QUERIES["watermark_lateness_audit"](spark, SF_DIR).collect()
    assert [r.watermark_s for r in rows] == [0, 60, 300, 900]
    drops = [r.n_dropped for r in rows]
    # a longer watermark can only drop fewer events
    assert drops == sorted(drops, reverse=True)
    for r in rows:
        assert 0.0 <= r.frac_dropped <= 1.0


@needs_testdata
def test_price_elasticity_group_floor(spark):
    rows = q.QUERIES["price_elasticity_by_type"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n >= 30
    es = [r.elasticity for r in rows]
    assert es == sorted(es)


@needs_testdata
def test_qte_deciles_monotone_within_group(spark):
    rows = q.QUERIES["quantile_treatment_effects"](spark, SF_DIR).collect()
    assert [r.decile for r in rows] == list(range(1, 10))
    qa = [r.q_building for r in rows]
    qb = [r.q_machinery for r in rows]
    assert qa == sorted(qa) and qb == sorted(qb)
    for r in rows:
        assert abs(r.qte - round(r.q_building - r.q_machinery, 2)) < 1e-6


@needs_testdata
def test_hll_sweep_bounds_tighten(spark):
    rows = q.QUERIES["hll_precision_sweep"](spark, SF_DIR).collect()
    assert [r.lg_k for r in rows] == [8, 10, 12, 14]
    bounds = [r.bound_rel for r in rows]
    assert bounds == sorted(bounds, reverse=True)  # bigger sketch, tighter band
    assert all(r.within_bound for r in rows)
    assert len({r.n_exact for r in rows}) == 1


@needs_testdata
def test_null_rate_drift_shape(spark):
    r = q.QUERIES["null_rate_drift_audit"](spark, SF_DIR).collect()[0]
    assert r.n_first > 0 and r.n_second > 0
    assert r.null_status_first == 0.0 and r.null_status_second == 0.0
    assert r.priority_domain_drift == (
        r.nd_priority_first != r.nd_priority_second
    )


@needs_testdata
def test_deanonymization_risk_ordering(spark):
    r = q.QUERIES["graph_deanonymization_risk"](spark, SF_DIR).collect()[0]
    # the 1-neighborhood signature refines degree: it can only expose MORE
    assert r.unique_by_neighborhood >= r.unique_by_degree
    assert 0.0 <= r.frac_reidentifiable <= 1.0
    assert r.k_anonymity >= 1


@needs_testdata
def test_crosscorr_bounds(spark):
    rows = q.QUERIES["crosscorr_purchase_click"](spark, SF_DIR).collect()
    assert [r.lag for r in rows] == list(range(-3, 4))
    for r in rows:
        assert -1.0 - 1e-9 <= r.ccf <= 1.0 + 1e-9
        assert r.n >= 2


@needs_testdata
def test_minhash_accuracy_audit_bounds(spark):
    r = q.QUERIES["minhash_accuracy_audit"](spark, SF_DIR).collect()[0]
    assert r.n_pairs > 0
    assert 0.0 <= r.mean_abs_err <= 1.0
    assert r.rmse >= r.mean_abs_err - 1e-9  # RMSE dominates MAE
    assert r.within_band  # 8 permutations stay inside 2-sigma on average


@needs_testdata
def test_write_partition_skew_shape(spark):
    r = q.QUERIES["write_partition_skew_audit"](spark, SF_DIR).collect()[0]
    assert r.n_partitions > 0 and r.total_rows > 0
    assert r.skew_ratio >= 1.0
    assert r.cov >= 0.0
    assert r.n_small_partitions <= r.n_partitions


@needs_testdata
def test_otsu_threshold_structure(spark):
    r = q.QUERIES["otsu_quality_threshold"](spark, SF_DIR).collect()[0]
    assert 0 <= r.threshold_bin <= 63
    assert r.between_class_var > 0
    assert 0.0 < r.frac_below < 1.0


@needs_testdata
def test_safety_stock_formula(spark):
    rows = q.QUERIES["safety_stock_by_brand"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_days >= 30
        expect = r.mean_daily_qty * 7 + r.safety_stock
        assert abs(r.reorder_point - expect) < 1e-3
        assert r.safety_stock >= 0


@needs_testdata
def test_longest_contamination_run_laws(spark):
    rows = q.QUERIES["longest_contamination_run"](spark, SF_DIR).collect()
    assert rows
    lens = [r.longest_run_tokens for r in rows]
    assert lens == sorted(lens, reverse=True)
    for r in rows:
        assert r.longest_run_tokens >= 3  # one shingle = 3 tokens minimum
        assert r.id_a != r.id_b


@needs_testdata
def test_markov_accuracy_bounds(spark):
    r = q.QUERIES["markov_next_event_accuracy"](spark, SF_DIR).collect()[0]
    assert r.n_train > 0 and r.n_test > 0
    assert 0.0 <= r.accuracy <= 1.0
    assert 0.0 <= r.baseline_accuracy <= 1.0
    # per-source argmax can never lose to the single global argmax on
    # the TRAIN set; on test it can, but both must be plausible rates
    assert r.baseline_accuracy > 0.05


@needs_testdata
def test_median_polish_shape(spark):
    rows = q.QUERIES["median_polish_weekday_month"](spark, SF_DIR).collect()
    wd = [r for r in rows if r.kind == "weekday"]
    mon = [r for r in rows if r.kind == "month"]
    assert len(wd) == 7 and len(mon) == 12
    # a full row sweep ran last-but-one: weekday effects bracket zero
    assert min(r.effect_dollars for r in wd) <= max(
        r.effect_dollars for r in wd
    )


@needs_testdata
def test_rmst_bounds(spark):
    r = q.QUERIES["rmst_conversion"](spark, SF_DIR).collect()[0]
    # RMST is an area under a [0,1] curve over [0, tau]
    assert 0.0 <= r.rmst_days <= r.tau_days
    assert 0.0 <= r.survival_at_tail <= 1.0
    assert r.n_users > 0


@needs_testdata
def test_randomized_response_recovery(spark):
    r = q.QUERIES["randomized_response_estimate"](spark, SF_DIR).collect()[0]
    assert r.q == 0.25
    # the estimator must land within the binomial noise band:
    # sd(p_est) = sd(p_obs)/0.5 <= (0.5/sqrt(n))/0.5 = 1/sqrt(n)
    assert r.abs_err <= 4.0 / (r.n ** 0.5)
    assert abs(r.p_est - round((r.p_obs - 0.25) / 0.5, 6)) < 2e-6


@needs_testdata
def test_approx_percentile_sweep_flags(spark):
    rows = q.QUERIES["approx_percentile_accuracy_sweep"](spark, SF_DIR).collect()
    assert [r.accuracy for r in rows] == [100, 1000, 10000]
    errs = [r.max_rank_err for r in rows]
    assert errs == sorted(errs, reverse=True)
    assert all(r.within_bound for r in rows)


@needs_testdata
def test_peak_detection_structure(spark):
    rows = q.QUERIES["peak_detection_daily"](spark, SF_DIR).collect()
    assert len(rows) == 5
    proms = [r.prominence for r in rows]
    assert proms == sorted(proms, reverse=True)
    for r in rows:
        assert r.prominence >= 0
        assert r.revenue >= r.prominence  # rise can't exceed the height


@needs_testdata
def test_dedup_state_ttl_monotone(spark):
    rows = q.QUERIES["dedup_state_ttl_audit"](spark, SF_DIR).collect()
    assert [r.ttl_h for r in rows] == [1, 6, 24, 168]
    keys = [r.n_keys for r in rows]
    events = [r.n_events for r in rows]
    assert keys == sorted(keys) and events == sorted(events)
    for r in rows:
        assert 0.0 <= r.frac_of_all_keys <= 1.0
        assert r.n_keys <= r.n_events


@needs_testdata
def test_bradley_terry_leaderboard(spark):
    rows = q.QUERIES["bradley_terry_source_ranking"](spark, SF_DIR).collect()
    assert rows
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    strengths = [r.strength for r in rows]
    assert strengths == sorted(strengths, reverse=True)
    for r in rows:
        assert r.strength > 0 and r.wins >= 0


@needs_testdata
def test_encoding_advisor_laws(spark):
    rows = q.QUERIES["encoding_advisor_orders"](spark, SF_DIR).collect()
    assert len(rows) == 2
    for r in rows:
        assert 1 <= r.n_runs <= r.n_rows
        assert r.n_distinct <= r.n_runs  # every value appears in >=1 run
        assert r.recommendation in ("RLE", "DICT", "PLAIN")


@needs_testdata
def test_twoway_anova_decomposition(spark):
    r = q.QUERIES["twoway_anova_interaction"](spark, SF_DIR).collect()[0]
    assert r.ka == 5 and r.kb == 5
    assert r.df_interaction == 16
    # every SS component nonnegative and error positive
    assert r.ss_priority >= 0 and r.ss_segment >= 0 and r.ss_error > 0
    assert r.f_interaction >= 0.0


@needs_testdata
def test_mediation_decomposition_identity(spark):
    r = q.QUERIES["mediation_priority_quantity"](spark, SF_DIR).collect()[0]
    # OLS exact identity: total effect = direct + indirect
    assert abs(r.total_dollars - (r.direct_dollars + r.indirect_dollars)) < 0.05
    assert r.n > 0


@needs_testdata
def test_kendall_w_bounds(spark):
    r = q.QUERIES["kendall_w_nation_rankings"](spark, SF_DIR).collect()[0]
    assert r.k_years >= 2 and r.n_nations >= 3
    assert 0.0 <= r.kendall_w <= 1.0
    expect = r.k_years * (r.n_nations - 1) * r.kendall_w
    assert abs(r.chi2_approx - expect) < 1e-3


@needs_testdata
def test_granger_sse_nesting(spark):
    r = q.QUERIES["granger_click_purchase"](spark, SF_DIR).collect()[0]
    # the full model nests the restricted one: SSE can only drop
    assert r.sse_full <= r.sse_restricted + 1e-6
    assert r.f_granger >= 0.0
    assert r.clicks_help == (r.f_granger > 3.84)


@needs_testdata
def test_best_split_changepoint_margins(spark):
    r = q.QUERIES["best_split_changepoint"](spark, SF_DIR).collect()[0]
    assert 7 <= r.split_index <= r.n_days - 7
    assert r.between_ss_dollars2 >= 0.0


@needs_testdata
def test_variance_ratio_structure(spark):
    rows = q.QUERIES["variance_ratio_test"](spark, SF_DIR).collect()
    assert [r.q for r in rows] == [2, 4, 8]
    for r in rows:
        assert r.vr > 0
        assert r.n > 8


@needs_testdata
def test_qn_scale_laws(spark):
    r = q.QUERIES["qn_scale_daily"](spark, SF_DIR).collect()[0]
    h = r.n_days // 2 + 1
    assert r.k_order == h * (h - 1) // 2
    assert r.qn_dollars > 0 and r.sd_dollars > 0
    assert abs(r.qn_over_sd - r.qn_dollars / r.sd_dollars) < 1e-2


@needs_testdata
def test_theil_decomposition_identity(spark):
    r = q.QUERIES["theil_index_decomposition"](spark, SF_DIR).collect()[0]
    assert r.theil_total >= 0 and r.theil_between >= 0
    # additive decomposition is exact
    assert abs(r.theil_total - (r.theil_between + r.theil_within)) < 2e-6
    assert 0.0 <= r.between_share <= 1.0


@needs_testdata
def test_ipf_margins_converge(spark):
    rows = q.QUERIES["ipf_raking_weights"](spark, SF_DIR).collect()
    assert len(rows) == 25
    n_sample = sum(r.n_sample for r in rows)
    weighted = sum(r.weighted_n for r in rows)
    # calibration preserves the sample total (targets scaled to it)
    assert abs(weighted - n_sample) / n_sample < 0.02
    for r in rows:
        assert r.weight > 0


@needs_testdata
def test_burrows_delta_structure(spark):
    rows = q.QUERIES["burrows_delta_sources"](spark, SF_DIR).collect()
    assert rows
    ds = [r.delta for r in rows]
    assert ds == sorted(ds)
    for r in rows:
        assert r.delta >= 0.0
        assert r.source_a < r.source_b


@needs_testdata
def test_avg_neighbor_degree_curve(spark):
    rows = q.QUERIES["avg_neighbor_degree_curve"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.k >= 1 and r.n_nodes >= 1
        assert r.knn_k >= 1.0  # every neighbor has degree >= 1
