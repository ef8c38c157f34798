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
