"""Law tests for the round-5 second-continuation query families —
properties the DuckDB parity gate can't express (it replays the same
algebra; these check the MATH against independent ground truth):
conformal coverage guarantee, isotonic monotonicity + PAV pooling,
Shapley efficiency, DSIR target separation, z-order skipping
superiority, grid-DBSCAN vs brute-force connectivity."""

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
def test_conformal_interval_laws(spark):
    r = q.QUERIES["conformal_forecast_intervals"](spark, SF_DIR).collect()[0]
    # split law: cal is 70% (floor), test the rest; both non-empty
    assert r.n_cal >= 1 and r.n_test >= 1
    assert r.n_cal == math.floor(0.7 * (r.n_cal + r.n_test))
    # q_hat is a real residual (non-negative), coverage is a fraction
    assert r.q_hat >= 0
    assert 0.0 <= r.coverage <= 1.0
    assert r.n_covered <= r.n_test


@needs_testdata
def test_isotonic_fit_is_monotone_and_pools(spark):
    rows = q.QUERIES["isotonic_calibration_bins"](spark, SF_DIR).collect()
    iso = [r.iso_rate for r in rows]
    # monotone nondecreasing in the bin order
    assert all(a <= b + 1e-9 for a, b in zip(iso, iso[1:]))
    # PAV preserves the weighted mean (sum n*iso == sum pos)
    tot_fit = sum(r.n * r.iso_rate for r in rows)
    tot_pos = sum(r.n * r.frac_pos for r in rows)
    assert tot_fit == pytest.approx(tot_pos, rel=1e-4)
    # fit never escapes the observed-rate hull
    assert min(iso) >= min(r.frac_pos for r in rows) - 1e-9
    assert max(iso) <= max(r.frac_pos for r in rows) + 1e-9


@needs_testdata
def test_shapley_efficiency_law(spark):
    # sum of Shapley values must equal v(full) - v(empty): recompute
    # the characteristic function independently from the same parquet
    shap = {
        r.channel: r.shapley
        for r in q.QUERIES["shapley_attribution_channels"](spark, SF_DIR).collect()
    }
    ev = q._t(spark, SF_DIR, "events")
    jw = ev.groupBy(
        "user_id",
        F.floor(
            F.datediff(F.to_date("ts"), F.lit("1970-01-05").cast("date")) / 7.0
        ).alias("wk"),
    ).agg(
        F.max(F.when(F.col("event_type") != "purchase", 1).otherwise(0)).alias(
            "touched"
        ),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "conv"
        ),
    )
    rows = jw.collect()
    # v(N) = rate over ALL journeys; v(empty) = rate over untouched ones
    v_full = sum(r.conv for r in rows) / len(rows)
    untouched = [r for r in rows if r.touched == 0]
    v_empty = (
        sum(r.conv for r in untouched) / len(untouched) if untouched else 0.0
    )
    assert sum(shap.values()) == pytest.approx(v_full - v_empty, abs=5e-6)


@needs_testdata
def test_dsir_targets_score_highest(spark):
    rows = q.QUERIES["dsir_importance_weights"](spark, SF_DIR).collect()
    w = {r.lang: r.mean_weight for r in rows}
    # the target domain (en) must dominate every other language
    assert all(w["en"] > w[l] for l in w if l != "en")


@needs_testdata
def test_zorder_skips_both_dimensions(spark):
    rows = q.QUERIES["zorder_layout_audit"](spark, SF_DIR).collect()
    frac = {(r.layout, r.pred): r.read_frac for r in rows}
    # The z-order claim is about the WORST dimension: one linear order
    # prunes at most one dimension (here none — ingest order is random
    # in both), while Morton order buys balanced pruning on both. At
    # tiny tiers a single predicate can luck out under either layout,
    # so the law is on the max.
    z_worst = max(frac[("zorder", p)] for p in ("size_10_15", "price_5_15"))
    l_worst = max(frac[("linear", p)] for p in ("size_10_15", "price_5_15"))
    assert z_worst <= l_worst
    assert frac[("zorder", "size_10_15")] < 1.0  # it does prune


@needs_testdata
def test_grid_dbscan_matches_bruteforce(spark):
    rows = q.QUERIES["grid_dbscan_parts"](spark, SF_DIR).collect()
    # recompute dense cells + connectivity in pure Python
    p = q._t(spark, SF_DIR, "part").select("p_size", "p_retailprice").collect()
    from collections import Counter

    cells = Counter(
        (int((r.p_size - 1) // 5), int((r.p_retailprice - 900.0) // 10))
        for r in p
    )
    dense = {c for c, n in cells.items() if n >= 12}
    # union-find over 8-adjacency
    parent = {c: c for c in dense}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for (cx, cy) in dense:
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nb = (cx + dx, cy + dy)
                if nb in dense:
                    ra, rb = find((cx, cy)), find(nb)
                    if ra != rb:
                        parent[ra] = rb
    clusters = {}
    for c in dense:
        clusters.setdefault(find(c), []).append(c)
    expect = sorted(
        (len(v), sum(cells[c] for c in v)) for v in clusters.values()
    )
    got = sorted((r.n_cells, r.n_points) for r in rows)
    assert got == expect


@needs_testdata
def test_msprt_always_valid_p_is_nonincreasing_tail(spark):
    rows = q.QUERIES["msprt_ab_monitor"](spark, SF_DIR).collect()
    ps = [r.always_valid_p for r in rows]
    # 1/running-max is non-increasing by construction, and a valid p
    assert all(0.0 <= p <= 1.0 for p in ps)
    assert all(a >= b - 1e-9 for a, b in zip(ps, ps[1:]))


@needs_testdata
def test_qini_final_decile_is_total_uplift(spark):
    rows = q.QUERIES["qini_uplift_deciles"](spark, SF_DIR).collect()
    last = max(rows, key=lambda r: r.decile)
    # at decile 10 the curve covers everyone: qini = Yt - Yc*Nt/Nc
    # and cum_uplift = overall rate difference; recompute independently
    cst = q._t(spark, SF_DIR, "customer")
    o = q._t(spark, SF_DIR, "orders").select("o_custkey").dropDuplicates()
    f = cst.join(o, cst["c_custkey"] == o["o_custkey"], "left").selectExpr(
        "CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS t",
        "CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0 END AS y",
    ).collect()
    yt = sum(r.y for r in f if r.t == 1)
    yc = sum(r.y for r in f if r.t == 0)
    nt = sum(1 for r in f if r.t == 1)
    nc = len(f) - nt
    assert last.cum_treated == nt and last.cum_control == nc
    assert last.qini == pytest.approx(yt - yc * nt / nc, abs=1e-4)
    assert last.cum_uplift == pytest.approx(yt / nt - yc / nc, abs=1e-6)


def test_huber_resists_outlier_month(spark):
    # clean linear series + one wild outlier: Huber slope stays near
    # the true slope while OLS is dragged; uses the operator pipeline
    # through the registered query's fit algebra on a synthetic frame
    from social_link_prediction_spark import queries as qq
    import pyspark.sql.functions as F

    rows = [(float(i), 100.0 + 10.0 * i) for i in range(12)]
    rows[6] = (6.0, 5000.0)  # corrupted month
    m = spark.createDataFrame(rows, "x double, y double")
    # replicate the query's IRLS inline (same constants)
    def fit(df):
        s = df.agg(
            F.sum("w").alias("sw"),
            F.sum(F.col("w") * F.col("x")).alias("swx"),
            F.sum(F.col("w") * F.col("y")).alias("swy"),
            F.sum(F.col("w") * F.col("x") * F.col("x")).alias("swxx"),
            F.sum(F.col("w") * F.col("x") * F.col("y")).alias("swxy"),
        ).collect()[0]
        b = (s.sw * s.swxy - s.swx * s.swy) / (s.sw * s.swxx - s.swx**2)
        return b, (s.swy - b * s.swx) / s.sw

    cur = m.select("x", "y", F.lit(1.0).alias("w"))
    b_ols, a = fit(cur)
    for _ in range(qq._HUBER_ROUNDS):
        b, a = fit(cur)
        rr = [(r.x, r.y, abs(r.y - a - b * r.x)) for r in cur.collect()]
        ars = sorted((ar, x) for x, _, ar in rr)
        s_med = max(ars[(len(ars) + 1) // 2 - 1][0], 1e-9)
        cur = spark.createDataFrame(
            [
                (x, y, 1.0 if ar < 1e-12 else min(1.0, qq._HUBER_K * s_med / ar))
                for x, y, ar in rr
            ],
            "x double, y double, w double",
        )
    b_h, _ = fit(cur)
    assert abs(b_ols - 10.0) > 5.0      # OLS dragged far off
    assert abs(b_h - 10.0) < 1.0        # Huber stays near truth
