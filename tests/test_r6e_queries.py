"""Law tests for the round-6 part-11 inference wave — ground truth
the DuckDB parity gate can't provide (it replays the same algebra):
Naive-Bayes accuracy floors and confusion-mass conservation, the
split-conformal finite-sample quantile law recomputed from raw
residuals in pure Python, and the CMH statistic recomputed from the
stratified 2x2 cells with math-library arithmetic.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from social_link_prediction_spark import queries as q

SF_DIR = "/root/testdata/sf0.001"
needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@needs_testdata
def test_naive_bayes_beats_majority_baseline_and_conserves_mass(spark):
    rows = q.QUERIES["naive_bayes_lang"](spark, SF_DIR).collect()
    n_total = sum(r.n for r in rows)
    correct = sum(r.n for r in rows if r.actual == r.predicted)
    acc = rows[0].overall_accuracy
    assert abs(acc - correct / n_total) < 1e-6
    # majority-class baseline on the same held-out split
    con = duckdb.connect()
    maj = con.sql(
        f"""
        WITH te AS (SELECT lang FROM '{SF_DIR}/documents.parquet'
            WHERE CAST(concat('0x', substr(md5(concat_ws(chr(31),
                  CAST(doc_id AS VARCHAR), 'nb')), 1, 15)) AS BIGINT)
                  % 5 = 0)
        SELECT max(c) * 1.0 / sum(c)
        FROM (SELECT count(*) AS c FROM te GROUP BY lang)
        """
    ).fetchone()[0]
    assert acc >= maj  # a trained classifier must not lose to majority
    # every held-out doc is classified exactly once
    n_test = con.sql(
        f"""
        SELECT count(*) FROM '{SF_DIR}/documents.parquet'
        WHERE CAST(concat('0x', substr(md5(concat_ws(chr(31),
              CAST(doc_id AS VARCHAR), 'nb')), 1, 15)) AS BIGINT) % 5 = 0
        """
    ).fetchone()[0]
    assert n_total == n_test


@needs_testdata
def test_conformal_quantile_law_recomputed_from_raw_residuals(spark):
    r = q.QUERIES["conformal_interval_audit"](spark, SF_DIR).collect()[0]
    # finite-sample quantile index law: k = ceil(0.9 * (n_cal + 1))
    assert r.k == math.ceil(0.9 * (r.n_cal + 1) - 1e-12)
    assert r.n_train + r.n_cal + r.n_test <= duckdb.sql(
        f"SELECT count(*) FROM '{SF_DIR}/lineitem.parquet'"
    ).fetchone()[0]
    # recompute qhat as the k-th smallest calibration residual in
    # pure Python from the same exact-integer OLS fit
    con = duckdb.connect()
    rows = con.sql(
        f"""
        SELECT CAST(concat('0x', substr(md5(concat_ws(chr(31),
                   CAST(l_orderkey AS VARCHAR) || '-' ||
                   CAST(l_linenumber AS VARCHAR), 'cf')), 1, 15))
                   AS BIGINT) % 4 AS b,
               CAST(round(l_quantity) AS BIGINT) AS q,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS yc
        FROM '{SF_DIR}/lineitem.parquet'
        """
    ).fetchall()
    tr = [(qq, yy) for bb, qq, yy in rows if bb <= 1]
    n = float(len(tr))
    sx = float(sum(qq for qq, _ in tr))
    sy = sum(yy for _, yy in tr) / 100.0
    sxy = sum(qq * yy for qq, yy in tr) / 100.0
    sxx = float(sum(qq * qq for qq, _ in tr))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    assert abs(slope - r.slope) < 1e-5
    assert abs(intercept - r.intercept) < 1e-5
    cal = sorted(
        abs(yy / 100.0 - (slope * qq + intercept))
        for bb, qq, yy in rows
        if bb == 2
    )
    assert abs(cal[r.k - 1] - r.qhat) < 1e-5
    te = [
        abs(yy / 100.0 - (slope * qq + intercept))
        for bb, qq, yy in rows
        if bb == 3
    ]
    covered = sum(1 for v in te if v <= cal[r.k - 1])
    assert r.covered == covered
    # the distribution-free guarantee holds up to sampling noise
    assert r.coverage >= 0.9 - 4.0 * math.sqrt(0.09 / r.n_test)
    assert r.interval_width == pytest.approx(2 * r.qhat, abs=2e-6)


@needs_testdata
def test_cmh_statistic_recomputed_from_stratified_cells(spark):
    r = q.QUERIES["cmh_test_priority_status"](spark, SF_DIR).collect()[0]
    cells = duckdb.sql(
        f"""
        SELECT c.c_mktsegment,
               sum(CASE WHEN o.o_orderpriority = '1-URGENT'
                         AND o.o_orderstatus = 'F' THEN 1 ELSE 0 END),
               sum(CASE WHEN o.o_orderpriority = '1-URGENT'
                         AND o.o_orderstatus <> 'F' THEN 1 ELSE 0 END),
               sum(CASE WHEN o.o_orderpriority <> '1-URGENT'
                         AND o.o_orderstatus = 'F' THEN 1 ELSE 0 END),
               sum(CASE WHEN o.o_orderpriority <> '1-URGENT'
                         AND o.o_orderstatus <> 'F' THEN 1 ELSE 0 END)
        FROM '{SF_DIR}/orders.parquet' o
        JOIN '{SF_DIR}/customer.parquet' c ON o.o_custkey = c.c_custkey
        GROUP BY 1
        """
    ).fetchall()
    sum_a = sum_e = sum_v = s_ad = s_bc = 0.0
    for _, a, b, c, d in cells:
        n = a + b + c + d
        sum_a += a
        sum_e += (a + b) * (a + c) / n
        sum_v += (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1))
        s_ad += a * d / n
        s_bc += b * c / n
    chi2 = (abs(sum_a - sum_e) - 0.5) ** 2 / sum_v
    assert r.n_strata == len(cells)
    assert r.sum_a == int(sum_a)
    assert r.sum_e == pytest.approx(sum_e, abs=1e-4)
    assert r.sum_v == pytest.approx(sum_v, abs=1e-4)
    assert r.cmh_chi2 == pytest.approx(chi2, abs=1e-4)
    assert r.mh_odds_ratio == pytest.approx(s_ad / s_bc, abs=1e-4)
    # p from the exact erfc (A&S polynomial is 1.5e-7 accurate)
    p_exact = math.erfc(math.sqrt(chi2 / 2.0))
    assert r.p_value == pytest.approx(p_exact, abs=1e-5)
    assert 0.0 <= r.p_value <= 1.0


def _h60(*parts: str) -> int:
    import hashlib

    joined = "\x1f".join(parts)
    return int(hashlib.md5(joined.encode()).hexdigest()[:15], 16)


@needs_testdata
def test_rendezvous_sharding_replicated_in_pure_python(spark):
    rows = q.QUERIES["rendezvous_sharding_audit"](spark, SF_DIR).collect()
    assert [r.node for r in rows] == list(range(8))
    assert sum(r.share for r in rows) == pytest.approx(1.0, abs=1e-4)
    n_total = sum(r.n_keys for r in rows)
    keys = duckdb.sql(
        f"""
        SELECT CAST(l_orderkey AS VARCHAR) || '-' ||
               CAST(l_linenumber AS VARCHAR)
        FROM '{SF_DIR}/lineitem.parquet'
        """
    ).fetchall()
    assert n_total == len(keys)
    counts = [0] * 8
    mod_moved = 0
    for (k,) in keys:
        hs = [_h60(k, f"node{i}") for i in range(8)]
        counts[hs.index(max(hs))] += 1
        hm = _h60(k, "mod")
        if hm % 8 != hm % 7:
            mod_moved += 1
    assert [r.n_keys for r in rows] == counts
    assert rows[0].mod_move_frac == pytest.approx(
        mod_moved / len(keys), abs=1e-5
    )
    # HRW minimal-movement law: a node's removal moves exactly its
    # share; modulo resize moves ~7/8 — the gap is the point
    assert rows[0].mod_move_frac > 3 * max(r.share for r in rows)


@needs_testdata
def test_morans_i_recomputed_with_numpy(spark):
    import numpy as np

    r = q.QUERIES["morans_i_nation_revenue"](spark, SF_DIR).collect()[0]
    rows = duckdb.sql(
        f"""
        SELECT n.n_nationkey, n.n_regionkey,
               COALESCE(rv.s, 0) / 100.0
        FROM '{SF_DIR}/nation.parquet' n
        LEFT JOIN (
            SELECT c.c_nationkey AS nk,
                   sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS s
            FROM '{SF_DIR}/orders.parquet' o
            JOIN '{SF_DIR}/customer.parquet' c
              ON o.o_custkey = c.c_custkey
            GROUP BY 1) rv ON rv.nk = n.n_nationkey
        """
    ).fetchall()
    nk = np.array([x[0] for x in rows])
    rk = np.array([x[1] for x in rows])
    x = np.array([float(x[2]) for x in rows])
    n = len(x)
    w = ((rk[:, None] == rk[None, :]) & (nk[:, None] != nk[None, :])).astype(
        float
    )
    z = x - x.mean()
    s0 = w.sum()
    i_full = (n / s0) * (z @ w @ z) / (z @ z)
    assert r.n_nations == n
    assert r.n_weight_pairs == int(s0)
    assert r.morans_i == pytest.approx(i_full, abs=1e-4)
    assert r.expected_i == pytest.approx(-1.0 / (n - 1), abs=1e-6)
    s1 = 0.5 * ((w + w.T) ** 2).sum()
    s2 = ((w.sum(axis=0) + w.sum(axis=1)) ** 2).sum()
    e_i = -1.0 / (n - 1)
    var = (n * n * s1 - n * s2 + 3 * s0 * s0) / (
        (n * n - 1) * s0 * s0
    ) - e_i * e_i
    assert r.var_i == pytest.approx(var, abs=1e-5)
    assert r.z == pytest.approx((i_full - e_i) / math.sqrt(var), abs=1e-3)
    assert 0.0 <= r.p_value <= 1.0


@needs_testdata
def test_brier_decomposition_identity_and_numpy_replica(spark):
    import numpy as np

    r = q.QUERIES["brier_decomposition_scores"](spark, SF_DIR).collect()[0]
    assert r.identity_holds == 1
    rows = duckdb.sql(
        f"""
        SELECT 1.0 / (1.0 + exp(-(c.c_acctbal / 5000.0))),
               CASE WHEN o.o_custkey IS NOT NULL THEN 1.0 ELSE 0.0 END
        FROM '{SF_DIR}/customer.parquet' c
        LEFT JOIN (SELECT DISTINCT o_custkey
                   FROM '{SF_DIR}/orders.parquet') o
          ON o.o_custkey = c.c_custkey
        """
    ).fetchall()
    p = np.array([float(a) for a, _ in rows])
    y = np.array([float(b) for _, b in rows])
    bins = np.minimum(np.floor(p * 10).astype(int), 9)
    brier = ((p - y) ** 2).mean()
    ybar = y.mean()
    unc = ybar * (1 - ybar)
    rel = res = wbv = wbc = 0.0
    for k in np.unique(bins):
        m = bins == k
        nk = m.sum()
        pk, yk = p[m].mean(), y[m].mean()
        rel += nk * (pk - yk) ** 2
        res += nk * (yk - ybar) ** 2
        wbv += ((p[m] - pk) ** 2).sum()
        wbc += 2 * ((p[m] - pk) * (y[m] - yk)).sum()
    nn = len(p)
    rel, res, wbv, wbc = rel / nn, res / nn, wbv / nn, wbc / nn
    assert r.brier == pytest.approx(brier, abs=1e-5)
    assert r.uncertainty == pytest.approx(unc, abs=1e-5)
    assert r.resolution == pytest.approx(res, abs=1e-5)
    assert r.reliability == pytest.approx(rel, abs=1e-5)
    assert r.within_bin_var == pytest.approx(wbv, abs=1e-5)
    assert r.within_bin_cov2 == pytest.approx(wbc, abs=1e-5)
    # the exact Murphy identity, from the independent replica
    assert brier == pytest.approx(unc - res + rel + wbv - wbc, abs=1e-12)


@needs_testdata
def test_theta_forecast_equals_literal_ses_recursion(spark):
    rows = q.QUERIES["theta_forecast_daily"](spark, SF_DIR).collect()
    assert [r.h for r in rows] == list(range(1, 8))
    # independent replica: run the ACTUAL SES recursion (not the
    # linearized weights) on the gap-filled 28-day cents series
    series = duckdb.sql(
        f"""
        WITH m AS (SELECT max(CAST(o_orderdate AS DATE)) AS maxd
                   FROM '{SF_DIR}/orders.parquet'),
        days AS (SELECT unnest(generate_series(
                     (SELECT maxd FROM m) - 27, (SELECT maxd FROM m),
                     INTERVAL 1 DAY))::DATE AS day),
        cnt AS (SELECT CAST(o_orderdate AS DATE) AS day,
                       sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS yc
                FROM '{SF_DIR}/orders.parquet' GROUP BY 1)
        SELECT coalesce(c.yc, 0) FROM days d
        LEFT JOIN cnt c ON c.day = d.day ORDER BY d.day
        """
    ).fetchall()
    y = [float(v[0]) for v in series]
    n = len(y)
    assert n == 28
    st, stt = n * (n + 1) / 2, n * (n + 1) * (2 * n + 1) / 6
    sy = sum(y)
    sty = sum((i + 1) * v for i, v in enumerate(y))
    b = (n * sty - st * sy) / (n * stt - st * st)
    a = (sy - b * st) / n
    z = [2 * v - (a + b * (i + 1)) for i, v in enumerate(y)]
    s = z[0]
    for t in range(1, n):
        s = 0.3 * z[t] + 0.7 * s
    for r in rows:
        want = (0.5 * (a + b * (n + r.h)) + 0.5 * s) / 100.0
        assert r.forecast == pytest.approx(want, abs=1e-2)


@needs_testdata
def test_croston_replicated_from_raw_parquet(spark):
    r = q.QUERIES["croston_intermittent_demand"](spark, SF_DIR).collect()[0]
    pts = duckdb.sql(
        f"""
        SELECT CAST(l_shipdate AS DATE) AS day,
               sum(CAST(round(l_quantity) AS BIGINT)) AS z
        FROM '{SF_DIR}/lineitem.parquet'
        WHERE l_suppkey = 1 GROUP BY 1 ORDER BY day
        """
    ).fetchall()
    d0 = pts[0][0]
    ts = [(d - d0).days + 1 for d, _ in pts]
    zs = [float(z) for _, z in pts]
    zh, ph = zs[0], float(ts[0])
    for j in range(1, len(pts)):
        zh += 0.2 * (zs[j] - zh)
        ph += 0.2 * (ts[j] - ts[j - 1] - ph)
    assert r.n_points == len(pts)
    assert r.n_days == ts[-1]
    assert r.z_hat == pytest.approx(zh, abs=1e-4)
    assert r.p_hat == pytest.approx(ph, abs=1e-4)
    assert r.croston_rate == pytest.approx(zh / ph, abs=1e-4)
    assert r.sba_rate == pytest.approx(0.9 * zh / ph, abs=1e-4)
    # the demand-size smoother must live inside the observed sizes,
    # the interval smoother inside the observed gaps
    gaps = [ts[j] - ts[j - 1] for j in range(1, len(ts))] + [ts[0]]
    assert min(zs) <= r.z_hat <= max(zs)
    assert min(gaps) <= r.p_hat <= max(gaps)
    # intermittency precondition for Croston to be the right model
    assert r.n_points < 0.5 * r.n_days


@needs_testdata
def test_capture_recapture_replicated_with_hashlib(spark):
    r = q.QUERIES["capture_recapture_estimate"](spark, SF_DIR).collect()[0]
    keys = duckdb.sql(
        f"""
        SELECT CAST(l_orderkey AS VARCHAR) || '-' ||
               CAST(l_linenumber AS VARCHAR)
        FROM '{SF_DIR}/lineitem.parquet'
        """
    ).fetchall()
    n1 = n2 = m = 0
    for (k,) in keys:
        a = _h60(k, "cr1") % 10 == 0
        b = _h60(k, "cr2") % 10 == 0
        n1 += a
        n2 += b
        m += a and b
    assert (r.n_true, r.n1, r.n2, r.m) == (len(keys), n1, n2, m)
    nhat = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    assert r.chapman_estimate == pytest.approx(nhat, abs=1e-3)
    v = (n1 + 1) * (n2 + 1) * (n1 - m) * (n2 - m) / (
        (m + 1) ** 2 * (m + 2)
    )
    assert r.ci_lo == pytest.approx(nhat - 1.96 * math.sqrt(v), abs=1e-3)
    assert r.ci_hi == pytest.approx(nhat + 1.96 * math.sqrt(v), abs=1e-3)
    assert r.within_ci == int(r.ci_lo <= r.n_true <= r.ci_hi)


@needs_testdata
def test_association_rule_metric_laws(spark):
    rows = q.QUERIES["association_rules_metrics"](spark, SF_DIR).collect()
    assert len(rows) == 20  # 10 pairs x 2 directions
    by_pair = {}
    for r in rows:
        key = tuple(sorted((r.antecedent, r.consequent)))
        by_pair.setdefault(key, []).append(r)
    for key, pair in by_pair.items():
        assert len(pair) == 2
        a, b = pair
        # support, lift, leverage, jaccard are direction-symmetric
        assert a.support == b.support
        assert a.lift == b.lift
        assert a.leverage == pytest.approx(b.leverage, abs=2e-6)
        assert a.jaccard == b.jaccard
        for r in pair:
            assert 0.0 < r.support <= 1.0
            assert 0.0 < r.confidence <= 1.0
            assert r.lift > 0.0
            # lift-leverage sign agreement
            assert (r.lift >= 1.0) == (r.leverage >= -1e-9)
            # conviction > 1 iff rule better than independence
            if r.conviction is not None and r.lift > 1.0:
                assert r.conviction > 1.0 - 1e-6


@needs_testdata
def test_newey_west_recomputed_with_numpy(spark):
    import numpy as np

    r = q.QUERIES["newey_west_trend_se"](spark, SF_DIR).collect()[0]
    days = duckdb.sql(
        f"""
        SELECT CAST(o_orderdate AS DATE) AS day,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS yc
        FROM '{SF_DIR}/orders.parquet' GROUP BY 1 ORDER BY day
        """
    ).fetchall()
    d0 = days[0][0]
    n = (days[-1][0] - d0).days + 1
    y = np.zeros(n)
    for d, yc in days:
        y[(d - d0).days] = float(yc) / 100.0
    t = np.arange(1, n + 1, dtype=float)
    b, a = np.polyfit(t, y, 1)
    assert r.n_days == n
    assert r.slope == pytest.approx(b, rel=1e-4, abs=1e-4)
    e = y - (a + b * t)
    xc = t - t.mean()
    sxx = (xc * xc).sum()
    se_ols = math.sqrt((e * e).sum() / (n - 2) / sxx)
    g = (xc * xc * e * e).sum()
    for lag in range(1, 8):
        w = 1.0 - lag / 8.0
        g += 2 * w * (xc[lag:] * xc[:-lag] * e[lag:] * e[:-lag]).sum()
    se_nw = math.sqrt(g / (sxx * sxx))
    assert r.se_ols == pytest.approx(se_ols, rel=1e-4)
    assert r.se_nw == pytest.approx(se_nw, rel=1e-4)
    assert r.se_ratio == pytest.approx(se_nw / se_ols, rel=1e-4)
    assert r.t_nw == pytest.approx(b / se_nw, rel=1e-4)


@needs_testdata
def test_effect_sizes_recomputed_with_numpy(spark):
    import numpy as np

    r = q.QUERIES["effect_sizes_price_segments"](spark, SF_DIR).collect()[0]
    rows = duckdb.sql(
        f"""
        SELECT CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 2 END,
               o.o_totalprice
        FROM '{SF_DIR}/orders.parquet' o
        JOIN '{SF_DIR}/customer.parquet' c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
        """
    ).fetchall()
    x1 = np.array([float(x) for g, x in rows if g == 1])
    x2 = np.array([float(x) for g, x in rows if g == 2])
    n1, n2 = len(x1), len(x2)
    assert (r.n1, r.n2) == (n1, n2)
    sp = math.sqrt(
        ((n1 - 1) * x1.var(ddof=1) + (n2 - 1) * x2.var(ddof=1))
        / (n1 + n2 - 2)
    )
    d = (x1.mean() - x2.mean()) / sp
    assert r.cohen_d == pytest.approx(d, abs=1e-4)
    assert r.hedges_g == pytest.approx(
        d * (1 - 3 / (4 * (n1 + n2) - 9)), abs=1e-4
    )
    assert r.glass_delta == pytest.approx(
        (x1.mean() - x2.mean()) / x2.std(ddof=1), abs=1e-4
    )
    # Cliff's delta by brute-force dominance count
    gt = sum((x1[:, None] > x2[None, :]).sum() for _ in [0])
    lt = (x1[:, None] < x2[None, :]).sum()
    assert r.cliffs_delta == pytest.approx((gt - lt) / (n1 * n2), abs=1e-4)
    # |g| < |d| (bias correction shrinks), delta in [-1, 1]
    assert abs(r.hedges_g) <= abs(r.cohen_d) + 1e-9
    assert -1.0 <= r.cliffs_delta <= 1.0
