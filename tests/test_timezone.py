"""Session-timezone independence of the event-time query surface.

VERDICT-r3 #3: the engine pins ``spark.sql.session.timeZone=UTC``
(session.py), but nothing should *depend* on that — a harness that
builds its own non-UTC session must see identical results, because the
fixtures store TIMESTAMP_NTZ (parquet isAdjustedToUTC=false) and DuckDB
oracles evaluate over NTZ TIMESTAMPs with no zone at all.

The TZ-sensitive ingredients this guards:
- ``F.date_trunc`` returns session-zone TIMESTAMP even for NTZ input
  (→ ``queries._trunc_ntz`` rebuilds the truncated wall-clock as NTZ);
- ``unix_micros(cast('timestamp'))`` re-interprets the wall-clock in
  the session zone (→ ``windows.epoch_us`` uses NTZ timestamp_diff);
- ``queries._t`` normalizes every events read path to TIMESTAMP_NTZ.

Mechanism: ``spark.sql.session.timeZone`` is a runtime conf, so each
query runs twice on the same session — once under UTC, once under
America/New_York (UTC-5/-4 with DST transitions inside the fixtures'
2024 span) — and the collected rows must match exactly.
"""

from __future__ import annotations

import os

import pytest

from social_link_prediction_spark import queries as q

SF_DIR = "/root/testdata/sf0.001"

# Every catalog query whose output involves event time (bucket labels,
# session boundaries, as-of matches, day rollups, decay weights).
EVENT_TIME_QUERIES = [
    "multires_event_rollup",
    "tumbling_hourly_events",
    "sliding_event_rates",
    "sessionize_events",
    "session_window_stats",
    "session_concurrency",
    "asof_click_attribution",
    "event_rate_anomalies",
    "funnel_view_click_purchase",
    "time_decay_event_values",
    "stream_correlate_events",
    "hll_daily_users",
    "cumulative_daily_revenue",
    "scd2_asof_orders",
    # round-4 product-analytics additions over event time
    "gapfill_locf_hourly",
    "event_transition_matrix",
    "rolling_7d_active_users",
    "retention_cohorts",
    "robust_outlier_days",
    # round-4 continuation: attribution + seasonal residuals
    "multitouch_attribution",
    "markov_attribution",
    "seasonal_residual_anomalies",
    "conversion_latency_stats",
    # round-5: inter-arrival-bucketed trajectories (epoch_us gaps),
    # daily CUSUM series (to_date over NTZ)
    "trajectory_minhash_topk",
    "cusum_changepoint",
    # round-5 continuation: EWMA chart + stationary chain over event time
    "ewma_control_chart",
    "markov_stationary_events",
    "forecast_backtest_daily",
    # round-5 second continuation: ACF / STL / conformal day series,
    # experimentation family over user-weeks and calendar halves
    "acf_daily_events",
    "stl_decompose_daily",
    "conformal_forecast_intervals",
    "cuped_variance_reduction",
    "diff_in_diff_event_rates",
    "shapley_attribution_channels",
    "ab_test_power_mde",
    "frequent_event_paths",
    "overdispersion_event_counts",
    "hurst_exponent_daily",
    "entropy_rate_events",
    "logrank_test_cohorts",
    "rolling_median_daily",
    "seasonality_strength_daily",
    "msprt_ab_monitor",
    "delta_method_ratio_se",
    "cohort_ltv_curves",
    "interarrival_burstiness_users",
    "hour_of_day_uniformity",
    "negbinom_fit_events",
    "capture_recapture_users",
    "dau_mau_stickiness",
    "extreme_value_daily_peaks",
    "spectral_power_weekly",
    "session_threshold_sensitivity",
]

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def _rows_under_tz(spark, name: str, tz: str):
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", tz)
    try:
        df = q.QUERIES[name](spark, SF_DIR)
        return sorted(tuple(str(v) for v in r) for r in df.collect())
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


@needs_testdata
@pytest.mark.parametrize("name", EVENT_TIME_QUERIES)
def test_query_is_session_tz_independent(spark, name):
    assert name in q.QUERIES, f"{name} missing from catalog"
    utc = _rows_under_tz(spark, name, "UTC")
    ny = _rows_under_tz(spark, name, "America/New_York")
    assert utc == ny, f"{name} output depends on spark.sql.session.timeZone"


@needs_testdata
def test_events_read_is_ntz(spark):
    df = q._t(spark, SF_DIR, "events")
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"


def test_trunc_ntz_matches_wall_clock(spark):
    df = spark.sql(
        "SELECT TIMESTAMP_NTZ '2024-03-10 07:29:59.5' AS ts"  # inside a US DST gap day
    )
    out = df.select(
        q._trunc_ntz("hour", "ts").alias("h"),
        q._trunc_ntz("day", "ts").alias("d"),
        q._trunc_ntz("month", "ts").alias("m"),
    )
    assert [str(t) for _, t in out.dtypes] == ["timestamp_ntz"] * 3
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        results = {}
        for tz in ("UTC", "America/New_York"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            results[tz] = [tuple(str(v) for v in r) for r in out.collect()]
        assert results["UTC"] == results["America/New_York"]
        assert results["UTC"][0] == (
            "2024-03-10 07:00:00",
            "2024-03-10 00:00:00",
            "2024-03-01 00:00:00",
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
