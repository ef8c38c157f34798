"""Money-scale float lint over every oracle (VERDICT r7 item 4).

The class of driver-hash flips found by the r7 full sf0.1 sweep:
a value of magnitude O(1e5+) that is NOT integer and NOT 2dp-coarse
was built from float sums and rounded finer than its magnitude
supports — `round(x, 6)` of a 1e7-scale FLOAT sum differs between
engines in the last retained digits (huber_revenue_trend, r7). The
cure is integer sufficient statistics (sums/cents/counts) or rounding
no finer than 2dp at that magnitude (holt_winters precedent).

This test runs every registered ORACLE on DuckDB at the gate tier
(sf0.01) and flags any emitted double whose implied rounding quantum
is too fine for its magnitude: the quantum (10^-d from the shortest
decimal representation) must exceed the value's float ulp by a
SAFETY factor of 1e4 — room for thousands of ulps of cross-engine
summation-order drift before the rounding boundary can flip. The
r7 flip (round(x,6) of an O(1e8) float sum: ~45 ulps of headroom)
fails this; the safe precedents (round(x,2) at 1e7: ~4e6 ulps;
TPC-H 4dp revenues at 1e6: ~1e5 ulps) pass. Waivers need a reason.
DuckDB-only (no Spark session), so the whole 500-oracle scan runs
in minutes in CI on every new query.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from social_link_prediction_spark import queries as q

SF_DIR = os.environ.get("SPARK_GRAFT_LINT_SF", "/root/testdata/sf0.01")

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Queries allowed to emit large doubles finer than their magnitude's
# headroom bar, each audited (r8): the value is NOT an accumulated
# float sum — it derives from exact integer sufficient statistics
# (or exact selections like min/max/median) through ONE fixed float
# expression written identically on both engines, so the doubles are
# bit-identical BEFORE rounding and the boundary cannot flip. Keep
# this short — the default for new queries is integer cents/counts.
_INT_STATS = (
    "exact integer sufficient statistics through one fixed float "
    "expression — doubles bit-identical before rounding"
)
WAIVERS: dict[str, str] = {
    "sketch_quantiles_price": (
        "exact min/max selections + integer bin index through one "
        "fixed interpolation expression"
    ),
    "ols_revenue_trend": _INT_STATS + " (r7 integer-cents contract)",
    "theil_sen_revenue_trend": (
        "exact median SELECTIONS over integer-cents-derived values "
        "(r7 contract)"
    ),
    "rfm_segments": _INT_STATS + " (cents/count division only)",
    "anova_price_segments": _INT_STATS + " (decimal cents moments)",
    "twoway_anova_interaction": _INT_STATS + " (int64 cents moments)",
    "seasonal_mann_kendall_revenue": (
        _INT_STATS + " (int64 S/tie terms; only final /18 and sqrt float)"
    ),
    "otsu_quality_threshold": _INT_STATS + " (exact cumulative moments)",
    "kalman_local_level_daily": (
        "exact integer-cents inputs through the identical recursive "
        "float sequence on both engines (CTE == Python loop)"
    ),
    "ridge_cv_path": _INT_STATS + " (fold moments expanded exactly)",
    "hierarchical_forecast_reconciliation": (
        _INT_STATS + " (r8 integer-cents rework of the float-sum "
        "original this lint caught)"
    ),
    "price_dispersion_within_part": _INT_STATS + " (cents-per-unit sums)",
}

# Float ±0.0 outputs — the r8 `brier_decomposition_scores` flip class:
# a rounded near-zero DIFFERENCE of float aggregates has a
# summation-order-dependent SIGN, and -0.0 vs 0.0 flips the driver's
# value hash (this DuckDB-side lint sees whichever sign DuckDB lands
# on, so ANY float zero forces an audit). Waive only when the zero
# cannot be a cancelling difference: exact integer-derived arithmetic,
# a nonnegative-by-float-construction form (ratio/product/sum of
# nonnegatives, abs(), percent_rank, survival products — floats that
# cannot go negative), or an explicit snap-to-zero literal guard.
# Cancelling differences get the integer-gate rework instead
# (brier_decomposition_scores, revenue_decomposition_mom precedents).
_RATIO0 = "zero is an exact ratio/product of nonnegative counts — no sign"
_SNAP0 = "snap-to-zero guard emits literal +0e0 on both engines"
ZERO_WAIVERS: dict[str, str] = {
    "bayes_ab_conversion": (
        "abs_lift: difference of two EXACT small-int ratios that are "
        "equal — a-a is +0.0 deterministically on both engines"
    ),
    "brier_decomposition": (
        "uncertainty/resolution: every input exact at every step "
        "(sums of 1.0s, ybar=1.0) — +0.0 deterministic, order-free"
    ),
    "brier_decomposition_scores": _SNAP0,
    "capture_recapture_users": (
        "rel_error: exact floor()-integer minus integer over integer"
    ),
    "clique4_census": _RATIO0 + " (k4 count / positive null expectation)",
    "customer_balance_ranks": "percent_rank is (rank-1)/(n-1): " + _RATIO0,
    "erlang_c_staffing": (
        "p_wait/avg_wait: rounded analytically-positive ratios of "
        "nonnegative terms — cannot go negative, sign cannot flip"
    ),
    "feature_assembly_audit": (
        "val: exact feature values (min/max/exact inputs), not sums"
    ),
    "heaps_law_vocab": (
        "heaps_beta -0.0 is DETERMINISTIC: identical single-expression "
        "log-ratio with constant vocab on both engines (driver-proven "
        "green r8 with this exact value)"
    ),
    "histogram_totalprice": "bin boundary 0.0 is an exact literal",
    "hubness_audit_embeddings": "antihub_frac: " + _RATIO0,
    "kaplan_meier_conversion": (
        "survival: product of nonnegative exact ratios — one exact-0 "
        "factor makes the product +0.0; cannot be -0.0"
    ),
    "kneser_ney_bigram_docs": "oov rates: " + _RATIO0,
    "knn_loo_accuracy": "accuracy: " + _RATIO0,
    "linkpred_heuristic_eval": "precision_at_k: " + _RATIO0,
    "media_features": "deterministic decode features, exact inputs",
    "null_rate_drift_audit": "null-count rates: " + _RATIO0,
    "percolation_hub_removal": "removal_frac: " + _RATIO0,
    "platt_calibration_scores": (
        "fitted param hits an exact branch of the identical closed "
        "form on both engines (sweep-green at both tiers)"
    ),
    "pr_curve_score": "recall: " + _RATIO0,
    "qini_uplift_deciles": (
        "qini/cum_uplift: differences of EXACT equal int ratios "
        "(no treatment effect in the synthetic data) — a-a is +0.0 "
        "deterministically; counts sum exactly in int64"
    ),
    "repetition_ngram_stats": "dup_ngram_ratio: " + _RATIO0,
    "rich_club_suppliers": "phi: " + _RATIO0,
    "ridge_cv_path": "lambda_ratio: exact grid-literal ratio",
    "rmst_conversion": "survival_at_tail: nonnegative product, see KM",
    "stupid_backoff_trigram_docs": "share_oov: " + _RATIO0,
    "text_quality_stats": "punct/stopword ratios: " + _RATIO0,
    "vocab_coverage": "oov_rate: " + _RATIO0,
    "vocab_richness_estimators": "good_turing n1/N: " + _RATIO0,
    "watermark_lateness_audit": "frac_dropped: " + _RATIO0,
    "weighted_sssp_s1": "source distance 0.0 is an exact literal",
    "year_feature_audit": (
        "min_norm: exact min selection of a bounded normalization"
    ),
}

_SAFETY = 1e4  # required quantum/ulp headroom
_ULP = 2.0 ** -52


def _decimals(v: float) -> int:
    """Decimal places in the shortest repr (capped at 12) — the
    implied rounding quantum is 10^-decimals."""
    r = repr(v)
    if "e" in r or "E" in r:
        return 12
    if "." not in r:
        return 0
    return min(len(r.split(".", 1)[1]), 12)


def _zero(v) -> bool:
    """Float ±0.0 — the cancelling-difference sign-flip class (the
    r8 blind spot: `_risky` used to skip v == 0.0 exactly)."""
    return isinstance(v, float) and v == 0.0


def _risky(v) -> bool:
    if not isinstance(v, float):
        return False
    if math.isnan(v) or math.isinf(v) or v == 0.0:
        return False
    # integer-valued doubles below 2^52 are exact sufficient stats
    if v == int(v) and abs(v) < 2.0 ** 52:
        return False
    quantum = 10.0 ** -_decimals(v)
    return quantum < abs(v) * _ULP * _SAFETY


@needs_testdata
def test_no_fine_grained_large_doubles_in_oracle_outputs():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
        )
    offenders = []
    zero_offenders = []
    for name, sql in q.ORACLES.items():
        if sql is None:
            continue
        try:
            cur = con.execute(sql)
            cols = [d[0] for d in cur.description]
            rows = cur.fetchall()
        except Exception as e:  # noqa: BLE001 — surface as lint failure
            offenders.append(f"{name}: oracle failed to run: {e}")
            continue
        hit_risky = name in WAIVERS
        hit_zero = name in ZERO_WAIVERS
        for r in rows:
            if hit_risky and hit_zero:
                break
            for i, v in enumerate(r):
                vals = v if isinstance(v, (list, tuple)) else [v]
                for x in vals:
                    if not hit_risky and _risky(x):
                        offenders.append(f"{name}: {x!r}")
                        hit_risky = True
                    if not hit_zero and _zero(x):
                        sign = "-" if math.copysign(1.0, x) < 0 else "+"
                        zero_offenders.append(
                            f"{name}: {cols[i]} emits float {sign}0.0"
                        )
                        hit_zero = True
    assert not offenders, (
        "oracle outputs with |v|>1e5 doubles finer than 2dp — the "
        "engine-drift hazard class (emit integer cents/counts or "
        "coarsen the rounding; see huber_revenue_trend r7):\n  "
        + "\n  ".join(offenders)
    )
    assert not zero_offenders, (
        "oracle outputs emitting float ±0.0 — the cancelling-"
        "difference sign-flip class (r8 brier_decomposition_scores): "
        "a near-zero difference of float aggregates rounds to a zero "
        "whose SIGN depends on summation order and flips the value "
        "hash. Rework as an integer gate (CAST(abs(x) < tol AS "
        "BIGINT)) or a snap-to-zero literal, or add an audited "
        "ZERO_WAIVERS entry proving the zero cannot be a cancelling "
        "difference:\n  " + "\n  ".join(zero_offenders)
    )
