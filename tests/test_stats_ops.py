"""Law tests for operators/stats.py — the monitoring / inference
family: EWMA closed form, KS extremes, chi-square exactness on a
product distribution, t-closeness TVD laws."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from social_link_prediction_spark.operators import stats as st


# ---------------------------------------------------------------------
# EWMA: constant series sits on the center line; a spike dominates
# ---------------------------------------------------------------------
def test_ewma_constant_series_is_flat(spark):
    rows = [(i, 100) for i in range(30)]
    df = spark.createDataFrame(rows, "day int, n long")
    out = st.ewma_chart(df, "day", "n").collect()
    assert len(out) == 30
    for r in out:
        assert r.ewma == pytest.approx(100.0, abs=1e-6)
        assert r.deviation == pytest.approx(0.0, abs=1e-6)
        assert r.breach == 0


def test_ewma_matches_recursion_and_flags_shift(spark):
    # EWMA's design case: a small SUSTAINED level shift (a lone spike
    # inflates sigma faster than the smoothed statistic can chase it)
    xs = [100] * 25 + [160] * 5
    df = spark.createDataFrame(list(enumerate(xs)), "day int, n long")
    out = {r.day: r for r in st.ewma_chart(df, "day", "n", lam=0.2, span=20).collect()}
    # replay the truncated closed form in pure Python
    mu = sum(xs) / len(xs)
    for t0 in range(len(xs)):
        k = min(t0 + 1, 20)
        z = 0.2 * sum(0.8**j * xs[t0 - j] for j in range(k)) + 0.8**k * mu
        assert out[t0].ewma == pytest.approx(round(z, 6), abs=1e-6)
    # the shift's last day carries the largest |deviation| and breaches
    peak = max(out.values(), key=lambda r: abs(r.deviation))
    assert peak.day == 29
    assert peak.breach == 1


def test_ewma_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, 1)], "day int, n long")
    with pytest.raises(ValueError):
        st.ewma_chart(df, lam=0.0)
    with pytest.raises(ValueError):
        st.ewma_chart(df, span=0)


# ---------------------------------------------------------------------
# KS: identical samples -> D=0; disjoint supports -> D=1
# ---------------------------------------------------------------------
def test_ks_identical_and_disjoint(spark):
    same = spark.createDataFrame(
        [(g, float(x)) for g in (1, 2) for x in range(50)], "g int, x double"
    )
    r = st.ks_two_sample(same).first()
    assert r.ks_d == 0.0 and r.n1 == 50 and r.n2 == 50

    disjoint = spark.createDataFrame(
        [(1, float(x)) for x in range(50)] + [(2, float(x + 100)) for x in range(50)],
        "g int, x double",
    )
    r = st.ks_two_sample(disjoint).first()
    assert r.ks_d == 1.0
    assert r.ks_scaled == pytest.approx(round(math.sqrt(50 * 50 / 100), 6), abs=1e-6)


def test_ks_shifted_half(spark):
    # group 2 = group 1 shifted by half the support: D = 0.5 exactly
    g1 = [(1, float(x)) for x in range(100)]
    g2 = [(2, float(x + 50)) for x in range(100)]
    r = st.ks_two_sample(spark.createDataFrame(g1 + g2, "g int, x double")).first()
    assert r.ks_d == 0.5


# ---------------------------------------------------------------------
# chi2: exact product distribution -> chi2 = 0; dof from marginals;
# empty cells contribute their full expected mass
# ---------------------------------------------------------------------
def test_chi2_independent_grid_is_zero(spark):
    rows = []
    for a, na in (("x", 2), ("y", 3)):
        for b, nb in (("u", 4), ("v", 8)):
            rows += [(a, b)] * (na * nb)
    r = st.chi2_independence(
        spark.createDataFrame(rows, "pri string, seg string")
    ).first()
    assert r.chi2 == 0.0
    assert r.dof == 1
    assert r.n_obs == len(rows)


def test_chi2_empty_cell_counts(spark):
    # diagonal-only 2x2: chi2 = n exactly (perfect association)
    rows = [("a", "u")] * 30 + [("b", "v")] * 30
    r = st.chi2_independence(
        spark.createDataFrame(rows, "pri string, seg string")
    ).first()
    assert r.chi2 == pytest.approx(60.0, abs=1e-6)
    assert r.dof == 1


# ---------------------------------------------------------------------
# t-closeness: group == global -> tvd 0; concentrated group -> 1 - p
# ---------------------------------------------------------------------
def test_t_closeness_laws(spark):
    # global buckets: 0 with mass 60, 1 with mass 40 (p0=0.6, p1=0.4).
    # group "mirror" replicates the global mix -> tvd = 0.
    # group "point" sits entirely in bucket 0 -> tvd = 1 - 0.6 = 0.4.
    rows = [("mirror", 0)] * 30 + [("mirror", 1)] * 20
    rows += [("point", 0)] * 30 + [("point", 1)] * 20  # second mirror half
    # reshape: make "point" all-bucket-0 while keeping global 60/40
    rows = (
        [("mirror", 0)] * 36 + [("mirror", 1)] * 24  # 60/40 inside the group
        + [("point", 0)] * 24 + [("point", 1)] * 16
    )
    df = spark.createDataFrame(rows, "qi string, bkt int")
    out = {
        r.qi: r
        for r in st.t_closeness(df, ["qi"], F.col("bkt"), threshold=0.35).collect()
    }
    assert out["mirror"].tvd == 0.0 and out["mirror"].breach == 0
    assert out["point"].tvd == 0.0  # both groups mirror the global mix

    rows2 = [("mix", 0)] * 60 + [("mix", 1)] * 40 + [("conc", 0)] * 100
    df2 = spark.createDataFrame(rows2, "qi string, bkt int")
    out2 = {
        r.qi: r
        for r in st.t_closeness(df2, ["qi"], F.col("bkt"), threshold=0.2).collect()
    }
    # global: p0 = 160/200 = 0.8, p1 = 0.2
    # conc: (1.0, 0.0) -> tvd = 0.5*(|1-0.8| + |0-0.2|) = 0.2
    assert out2["conc"].tvd == pytest.approx(0.2, abs=1e-6)
    assert out2["conc"].breach == 0  # compare is strict >
    # mix: (0.6, 0.4) -> tvd = 0.5*(0.2 + 0.2) = 0.2
    assert out2["mix"].tvd == pytest.approx(0.2, abs=1e-6)


# ---------------------------------------------------------------------
# Theil-Sen: exact on a clean line; unmoved by a gross outlier
# ---------------------------------------------------------------------
def test_theil_sen_robust_to_outlier(spark):
    clean = [(x, 3.0 * x + 7.0) for x in range(20)]
    r = st.theil_sen(spark.createDataFrame(clean, "x int, y double")).first()
    assert r.slope == pytest.approx(3.0, abs=1e-6)
    assert r.intercept == pytest.approx(7.0, abs=1e-6)
    assert r.n_points == 20 and r.n_pairs == 190

    # poison one point by 1000x: median slope stays 3.0 (OLS would not)
    dirty = clean[:10] + [(10, 30000.0)] + clean[11:]
    r2 = st.theil_sen(spark.createDataFrame(dirty, "x int, y double")).first()
    assert r2.slope == pytest.approx(3.0, abs=1e-6)
    assert r2.intercept == pytest.approx(7.0, abs=1e-6)


# ---------------------------------------------------------------------
# Mann-Whitney: symmetry, scipy-free closed cases, tie correction
# ---------------------------------------------------------------------
def test_mann_whitney_identical_groups(spark):
    # identical samples: U1 = U2 = n^2/2, z = 0 (full ties)
    df = spark.createDataFrame(
        [(g, float(x)) for g in (1, 2) for x in range(1, 21)], "g int, x double"
    )
    r = st.mann_whitney_u(df).collect()[0]
    assert r.n1 == r.n2 == 20
    assert r.u1 == pytest.approx(200.0)
    assert r.u2 == pytest.approx(200.0)
    assert r.z == pytest.approx(0.0, abs=1e-9)


def test_mann_whitney_disjoint_supports(spark):
    # group 2 strictly above group 1: U1 = 0, z at its minimum
    rows = [(1, float(x)) for x in range(10)] + [(2, float(x + 100)) for x in range(10)]
    df = spark.createDataFrame(rows, "g int, x double")
    r = st.mann_whitney_u(df).collect()[0]
    assert r.u1 == pytest.approx(0.0)
    assert r.u2 == pytest.approx(100.0)
    # no ties: var = n1*n2*(n+1)/12 = 10*10*21/12 = 175
    assert r.z == pytest.approx(round(-50.0 / math.sqrt(175.0), 6), abs=1e-6)


def test_mann_whitney_hand_computed_ties(spark):
    # pooled [1,2,2,3] g1={1,2} g2={2,3}: ranks 1, 2.5, 2.5, 4
    df = spark.createDataFrame(
        [(1, 1.0), (1, 2.0), (2, 2.0), (2, 3.0)], "g int, x double"
    )
    r = st.mann_whitney_u(df).collect()[0]
    # R1 = 1 + 2.5 = 3.5; U1 = 3.5 - 3 = 0.5; U2 = 4 - 0.5 = 3.5
    assert r.u1 == pytest.approx(0.5)
    assert r.u2 == pytest.approx(3.5)
    # ties term: one group of 2 -> sum(c^3-c) = 6
    # var = (4/12) * (5 - 6/(4*3)) = 1.5; z = (0.5 - 2)/sqrt(1.5)
    assert r.z == pytest.approx(round(-1.5 / math.sqrt(1.5), 6), abs=1e-6)


# ---------------------------------------------------------------------
# Spearman: monotone nonlinear -> rho=1; reversal -> -1; ties average
# ---------------------------------------------------------------------
def test_spearman_monotone_and_reverse(spark):
    rows = [(float(i), float(i * i * i)) for i in range(1, 30)]
    df = spark.createDataFrame(rows, "x double, y double")
    assert st.spearman_rho(df, "x", "y").collect()[0].rho == pytest.approx(1.0)
    rev = spark.createDataFrame(
        [(float(i), float(-i) ** 3) for i in range(1, 30)], "x double, y double"
    )
    assert st.spearman_rho(rev, "x", "y").collect()[0].rho == pytest.approx(-1.0)


def test_spearman_ties_average_rank(spark):
    # x has ties; hand-check vs scipy's published value for this case:
    # x=[1,2,2,3], y=[1,2,3,4] -> rank_x=[1,2.5,2.5,4], rank_y=[1,2,3,4]
    # rho = 4.5/sqrt(4.5*5) = 0.9486832...
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 2.0), (2.0, 3.0), (3.0, 4.0)], "x double, y double"
    )
    r = st.spearman_rho(df, "x", "y").collect()[0]
    assert r.n_rows == 4
    assert r.rho == pytest.approx(0.948683, abs=1e-6)


# ---------------------------------------------------------------------
# STL: trend + seasonal + remainder == n; pure-seasonal series is
# recovered exactly; edges carry NULL trend
# ---------------------------------------------------------------------
def test_stl_reconstruction_and_pure_seasonal(spark):
    import datetime as dt

    base = dt.date(2024, 1, 1)  # a Monday -> dow 0
    season = [10, -5, 0, 5, -10, 3, -3]  # sums to 0
    rows = [
        (base + dt.timedelta(days=i), 100 + season[i % 7]) for i in range(35)
    ]
    df = spark.createDataFrame(rows, "day date, n long")
    out = st.stl_decompose(df, "day", "n").collect()
    assert len(out) == 35
    by_day = {r.day: r for r in out}
    for i, (d, n) in enumerate(rows):
        r = by_day[d]
        if 3 <= i <= 31:  # full 7-day window
            # flat trend, exact seasonal recovery, zero remainder
            assert r.trend == pytest.approx(100.0, abs=1e-6)
            assert r.seasonal == pytest.approx(season[i % 7], abs=1e-6)
            assert r.remainder == pytest.approx(0.0, abs=1e-6)
        else:
            assert r.trend is None and r.remainder is None
        # reconstruction law wherever trend exists
        if r.trend is not None:
            assert r.trend + r.seasonal + r.remainder == pytest.approx(
                float(n), abs=1e-5
            )


# ---------------------------------------------------------------------
# Mann-Kendall: strict monotone -> S = n(n-1)/2; constant -> S=0, z=0;
# tie-corrected variance on a hand case
# ---------------------------------------------------------------------
def test_mann_kendall_extremes_and_ties(spark):
    up = spark.createDataFrame(
        [(float(i), float(i * i)) for i in range(10)], "x double, y double"
    )
    r = st.mann_kendall(up).collect()[0]
    assert r.s_stat == 45  # all 45 pairs increasing
    # no ties: var = 10*9*25/18 = 125; z = 44/sqrt(125)
    assert r.z == pytest.approx(round(44.0 / math.sqrt(125.0), 6), abs=1e-6)

    flat = spark.createDataFrame(
        [(float(i), 7.0) for i in range(10)], "x double, y double"
    )
    rf = st.mann_kendall(flat).collect()[0]
    assert rf.s_stat == 0 and rf.z == pytest.approx(0.0)

    # y = [1,2,2,3]: pairs (1,2)+ (1,2)+ (1,3)+ (2,2)0 (2,3)+ (2,3)+ -> S=5
    t = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 2.0), (3.0, 2.0), (4.0, 3.0)], "x double, y double"
    )
    rt = st.mann_kendall(t).collect()[0]
    assert rt.s_stat == 5
    # var = (4*3*13 - 2*1*9)/18 = (156-18)/18 = 7.6667; z = 4/sqrt(var)
    assert rt.z == pytest.approx(round(4.0 / math.sqrt(138.0 / 18.0), 6), abs=1e-6)


# ---------------------------------------------------------------------
# Brute-force cross-checks on seeded random data: the operator's
# distinct-value rank algebra vs the textbook O(n^2)/sort definitions
# ---------------------------------------------------------------------
import random


@pytest.mark.parametrize("seed", [7, 42, 1337])
def test_mann_whitney_matches_bruteforce(spark, seed):
    rng = random.Random(seed)
    xs1 = [float(rng.randint(0, 15)) for _ in range(30)]
    xs2 = [float(rng.randint(3, 18)) for _ in range(25)]
    df = spark.createDataFrame(
        [(1, x) for x in xs1] + [(2, x) for x in xs2], "g int, x double"
    )
    r = st.mann_whitney_u(df).collect()[0]
    # textbook: U1 = #(x1 > x2) + 0.5 * #(x1 == x2) over the cross product
    u1 = sum(
        1.0 if a > b else (0.5 if a == b else 0.0) for a in xs1 for b in xs2
    )
    assert r.u1 == pytest.approx(u1, abs=1e-6)
    assert r.u2 == pytest.approx(len(xs1) * len(xs2) - u1, abs=1e-6)


def _avg_ranks(vals):
    order = sorted(range(len(vals)), key=lambda i: vals[i])
    ranks = [0.0] * len(vals)
    i = 0
    while i < len(order):
        j = i
        while j < len(order) and vals[order[j]] == vals[order[i]]:
            j += 1
        r = (i + 1 + j) / 2.0
        for k in range(i, j):
            ranks[order[k]] = r
        i = j
    return ranks


@pytest.mark.parametrize("seed", [7, 42, 1337])
def test_spearman_matches_bruteforce(spark, seed):
    rng = random.Random(seed)
    xs = [float(rng.randint(0, 9)) for _ in range(40)]
    ys = [x + rng.uniform(-3, 3) for x in xs]
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    got = st.spearman_rho(df, "x", "y").collect()[0].rho
    rx, ry = _avg_ranks(xs), _avg_ranks(ys)
    mx, my = sum(rx) / len(rx), sum(ry) / len(ry)
    cov = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    sd = (
        sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)
    ) ** 0.5
    assert got == pytest.approx(round(cov / sd, 6), abs=1e-6)


@pytest.mark.parametrize("seed", [7, 42])
def test_mann_kendall_matches_bruteforce(spark, seed):
    rng = random.Random(seed)
    ys = [float(rng.randint(0, 8)) for _ in range(25)]
    df = spark.createDataFrame(
        [(float(i), y) for i, y in enumerate(ys)], "x double, y double"
    )
    r = st.mann_kendall(df).collect()[0]
    s = sum(
        (1 if ys[j] > ys[i] else (-1 if ys[j] < ys[i] else 0))
        for i in range(len(ys))
        for j in range(i + 1, len(ys))
    )
    assert r.s_stat == s


# ---------------------------------------------------------------------
# Range-bucketed rank statistics (VERDICT r5 item 5a): bucketed ==
# global for every n_buckets — the 100 TB fallback is a pure
# re-partitioning of the same arithmetic.
# ---------------------------------------------------------------------
@pytest.mark.parametrize("n_buckets", [1, 3, 8, 64])
def test_bucketed_prefix_sums_law(spark, n_buckets):
    rng = random.Random(11)
    rows = [(float(v), rng.randint(1, 5), rng.randint(0, 3))
            for v in rng.sample(range(-50, 200), 60)]
    d = spark.createDataFrame(rows, "x double, a int, b int")
    exact = {
        r.x: (r.cum_a, r.cum_b)
        for r in st.bucketed_prefix_sums(d, "x", ["a", "b"]).collect()
    }
    got = {
        r.x: (r.cum_a, r.cum_b)
        for r in st.bucketed_prefix_sums(d, "x", ["a", "b"], n_buckets).collect()
    }
    assert got == exact


@pytest.mark.parametrize("n_buckets", [2, 7])
def test_bucketed_rank_stats_match_global(spark, n_buckets):
    rng = random.Random(23)
    vals = [(rng.choice([1, 2]), float(rng.randint(0, 12))) for _ in range(80)]
    df = spark.createDataFrame(vals, "g int, x double")
    assert (
        st.mann_whitney_u(df, n_buckets=n_buckets).collect()
        == st.mann_whitney_u(df).collect()
    )
    assert (
        st.ks_two_sample(df, n_buckets=n_buckets).collect()
        == st.ks_two_sample(df).collect()
    )
    xy = spark.createDataFrame(
        [(float(rng.randint(0, 9)), float(rng.randint(0, 9))) for _ in range(60)],
        "x double, y double",
    )
    assert (
        st.spearman_rho(xy, "x", "y", n_buckets=n_buckets).collect()
        == st.spearman_rho(xy, "x", "y").collect()
    )


def test_bucketed_prefix_sums_degenerate_single_value(spark):
    d = spark.createDataFrame([(5.0, 3)], "x double, a int")
    assert st.bucketed_prefix_sums(d, "x", ["a"], 16).collect()[0].cum_a == 3
