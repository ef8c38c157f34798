"""Statistical monitoring and hypothesis-test operators.

The process-control / inference family next to the anomaly screens in
``queries.py`` (CUSUM, seasonal residuals) and the privacy audits
(k-anonymity, l-diversity): an EWMA control chart, the two-sample
Kolmogorov-Smirnov test, Pearson's chi-square independence test, and
the t-closeness release audit. Reference analog: the reference's
quality checks are ad-hoc notebook cells around the degree
distribution (NB cells 86-106); these are the productionized
engine-side equivalents.

Every operator is pure DataFrame algebra (no UDFs, no collect): one
corpus-sized grouped aggregation, then marginal-sized broadcast math,
so each survives a 100x scale-up unchanged. Formulas are written so a
SQL oracle can replay them term-for-term (closed forms, not
recursions; 6-dp rounding before any threshold compare).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bucketed_prefix_sums(
    d: DataFrame,
    order_col: str,
    cols: list[str],
    n_buckets: int | None = None,
) -> DataFrame:
    """Inclusive prefix sums of ``cols`` ordered by numeric
    ``order_col`` — the shared primitive under every rank statistic
    (KS, Mann-Whitney, Spearman average ranks).

    With ``n_buckets`` unset: ONE global ordered window (exact, fine
    while the frame is distinct-values-sized). With ``n_buckets``
    set: the 100 TB shape (VERDICT r5 item 5a) — the value axis is
    range-partitioned into uniform-width buckets between min and max,
    each bucket computes its prefix sums under
    ``Window.partitionBy(bucket)`` (parallel, no single-partition
    sort), per-bucket totals collapse to an ``n_buckets``-row frame
    whose exclusive cumulative sum is broadcast back as the bucket
    offset. Identical output for every n_buckets by construction
    (buckets are range-contiguous, within-bucket order = global
    order); pytest pins the law. Uniform widths can skew under
    pathological value distributions — the per-bucket window still
    never exceeds that bucket's distinct-value count, and callers
    with known-skewed axes can pre-transform (log) the order column.

    Returns ``d``'s columns plus ``cum_<c>`` for each requested
    column. ``order_col`` values must be unique (callers group by the
    value first — the same contract the global window had)."""
    if not n_buckets or n_buckets <= 1:
        w = Window.orderBy(order_col).rowsBetween(Window.unboundedPreceding, 0)
        return d.select(
            "*", *[F.sum(c).over(w).alias(f"cum_{c}") for c in cols]
        )
    mm = d.agg(
        F.min(F.col(order_col).cast("double")).alias("__lo"),
        F.max(F.col(order_col).cast("double")).alias("__hi"),
    )
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(n_buckets))
    db = (
        d.crossJoin(F.broadcast(mm))
        .withColumn(
            "__bkt",
            F.when(F.col("__hi") <= F.col("__lo"), F.lit(0)).otherwise(
                F.least(
                    F.lit(n_buckets - 1),
                    F.floor(
                        (F.col(order_col).cast("double") - F.col("__lo")) / width
                    ).cast("int"),
                )
            ),
        )
        .drop("__lo", "__hi")
    )
    win = Window.partitionBy("__bkt").orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    within = db.select(
        "*", *[F.sum(c).over(win).alias(f"__w_{c}") for c in cols]
    )
    tot = db.groupBy("__bkt").agg(
        *[F.sum(c).alias(f"__t_{c}") for c in cols]
    )
    wo = Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
    off = tot.select(
        "__bkt",
        *[
            F.coalesce(F.sum(f"__t_{c}").over(wo), F.lit(0)).alias(f"__o_{c}")
            for c in cols
        ],
    )
    return within.join(F.broadcast(off), "__bkt").select(
        *d.columns,
        *[(F.col(f"__w_{c}") + F.col(f"__o_{c}")).alias(f"cum_{c}") for c in cols],
    )


def ewma_chart(
    series: DataFrame,
    order_col: str = "day",
    value_col: str = "n",
    lam: float = 0.2,
    span: int = 20,
    nsigma: float = 3.0,
) -> DataFrame:
    """EWMA control chart over an already-aggregated series.

    The textbook recursion Z_t = lam*x_t + (1-lam)*Z_{t-1} with
    Z_0 = mean is evaluated in CLOSED FORM as a ``span``-term
    truncated geometric sum: Z_t = lam * sum_{j<min(t,span)}
    (1-lam)^j x_{t-j} + (1-lam)^min(t,span) * mean. Truncation makes
    the formula a bounded-range self-join on the row index — no
    sequential scan, engine-portable, and numerically safe (no
    (1-lam)^-t blowup). The control limit uses the asymptotic EWMA
    sigma sqrt(lam/(2-lam)); the breach compare happens on
    6-dp-rounded values so float drift cannot flip the flag.

    ``series`` must be one row per ``order_col`` value (pre-aggregate
    first — the self-join is series-sized, not corpus-sized).
    Returns (order_col, n_events, ewma, deviation, breach) unordered.
    """
    if not 0 < lam < 1:
        raise ValueError(f"lam must be in (0, 1), got {lam}")
    if span < 1:
        raise ValueError(f"span must be >= 1, got {span}")
    decay = 1.0 - lam
    ix = series.select(
        F.col(order_col),
        F.col(value_col).alias("n"),
        F.row_number().over(Window.orderBy(order_col)).cast("long").alias("t"),
    )
    st = ix.agg(F.avg("n").alias("mu"), F.stddev_pop("n").alias("sigma"))
    b = ix.select(F.col("n").alias("bn"), F.col("t").alias("bt"))
    z = (
        ix.join(b, (F.col("bt") <= F.col("t")) & (F.col("bt") > F.col("t") - span))
        .groupBy(order_col, "n", "t")
        .agg(
            F.sum(F.pow(F.lit(decay), F.col("t") - F.col("bt")) * F.col("bn")).alias(
                "gsum"
            )
        )
        .crossJoin(F.broadcast(st))
        .withColumn(
            "ewma",
            F.lit(lam) * F.col("gsum")
            + F.pow(F.lit(decay), F.least(F.col("t"), F.lit(span))) * F.col("mu"),
        )
    )
    limit = F.lit(nsigma) * F.col("sigma") * F.sqrt(F.lit(lam / (2.0 - lam)))
    return z.select(
        order_col,
        F.col("n").alias("n_events"),
        F.round("ewma", 6).alias("ewma"),
        F.round(F.col("ewma") - F.col("mu"), 6).alias("deviation"),
        F.when(F.round(F.abs(F.col("ewma") - F.col("mu")), 6) > F.round(limit, 6), 1)
        .otherwise(0)
        .cast("long")
        .alias("breach"),
        F.abs(F.col("ewma") - F.col("mu")).alias("_ord"),
    )


def ks_two_sample(
    values: DataFrame,
    group_col: str = "g",
    value_col: str = "x",
    n_buckets: int | None = None,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic.

    ``values``: rows (group_col in {1, 2}, value_col numeric).
    D = max_x |F1(x) - F2(x)| evaluated at the pooled DISTINCT values
    (grouping by value first means ties never expose an intermediate
    CDF state), with both groups' cumulative counts sharing ONE
    ordered window. ks_scaled = sqrt(n1*n2/(n1+n2)) * D is what the
    asymptotic Kolmogorov distribution consumes.

    Scale shape: with ``n_buckets`` unset the global window runs over
    distinct values only; set it to range-bucket the value axis
    (``bucketed_prefix_sums``) so no single partition ever sorts the
    whole distinct-value domain — output is IDENTICAL for any
    n_buckets. Returns one row (ks_d, n1, n2, ks_scaled).
    """
    n = values.agg(
        F.sum(F.when(F.col(group_col) == 1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col(group_col) == 2, 1).otherwise(0)).cast("long").alias("n2"),
    )
    d = values.groupBy(F.col(value_col).alias("x")).agg(
        F.sum(F.when(F.col(group_col) == 1, 1).otherwise(0)).cast("long").alias("c1"),
        F.sum(F.when(F.col(group_col) == 2, 1).otherwise(0)).cast("long").alias("c2"),
    )
    c = bucketed_prefix_sums(d, "x", ["c1", "c2"], n_buckets).select(
        F.col("cum_c1").cast("double").alias("a1"),
        F.col("cum_c2").cast("double").alias("a2"),
    )
    dmax = (
        c.crossJoin(F.broadcast(n))
        .agg(
            F.max(F.abs(F.col("a1") / F.col("n1") - F.col("a2") / F.col("n2"))).alias(
                "d_raw"
            )
        )
    )
    return dmax.crossJoin(F.broadcast(n)).select(
        F.round("d_raw", 6).alias("ks_d"),
        "n1",
        "n2",
        F.round(
            F.sqrt(
                F.col("n1").cast("double")
                * F.col("n2")
                / (F.col("n1") + F.col("n2")).cast("double")
            )
            * F.col("d_raw"),
            6,
        ).alias("ks_scaled"),
    )


def chi2_independence(
    obs_rows: DataFrame, a_col: str = "pri", b_col: str = "seg"
) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns. Expected counts come from the row/column marginals (two
    tiny grouped frames, broadcast); the cell grid is their CROSS
    JOIN LEFT-joined onto observed counts so EMPTY cells still
    contribute their full (0-E)^2/E term — the mistake ad-hoc
    versions make. One corpus-sized groupBy; everything after is
    marginal-sized. Returns one row (chi2, dof, n_obs)."""
    obs = obs_rows.groupBy(a_col, b_col).agg(F.count(F.lit(1)).alias("obs"))
    r = obs_rows.groupBy(a_col).agg(F.count(F.lit(1)).alias("rn"))
    c = obs_rows.groupBy(b_col).agg(F.count(F.lit(1)).alias("cn"))
    t = obs_rows.agg(F.count(F.lit(1)).alias("n"))
    nr = r.agg(F.count(F.lit(1)).alias("n_a"))
    nc = c.agg(F.count(F.lit(1)).alias("n_b"))
    cells = (
        F.broadcast(r)
        .crossJoin(F.broadcast(c))
        .join(obs, [a_col, b_col], "left")
        .crossJoin(F.broadcast(t))
        .select(
            F.coalesce(F.col("obs"), F.lit(0)).alias("o"),
            (F.col("rn") * F.col("cn") / F.col("n").cast("double")).alias("e"),
        )
    )
    return (
        cells.agg(
            F.round(
                F.sum((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")),
                6,
            ).alias("chi2")
        )
        .crossJoin(F.broadcast(nr))
        .crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(t))
        .select(
            "chi2",
            ((F.col("n_a") - 1) * (F.col("n_b") - 1)).cast("long").alias("dof"),
            F.col("n").alias("n_obs"),
        )
    )


def t_closeness(
    rows: DataFrame, qi_cols: list[str], bucket: Column, threshold: float = 0.35
) -> DataFrame:
    """t-closeness audit: per quasi-identifier group, the total-
    variation distance (categorical EMD) between the group's
    sensitive-bucket distribution and the global one. The grid CROSS
    JOIN of (QI groups x global buckets) guarantees buckets a group
    never hits still contribute their |0 - p| mass. Returns
    (*qi_cols, group_n, tvd, breach) unordered; all frames after the
    first groupBy are marginal-sized and broadcast."""
    c0 = rows.select(*qi_cols, bucket.alias("bkt"))
    g = c0.groupBy(*qi_cols, "bkt").agg(F.count(F.lit(1)).alias("cnt"))
    gt = c0.groupBy(*qi_cols).agg(F.count(F.lit(1)).alias("gn"))
    gl = c0.groupBy("bkt").agg(F.count(F.lit(1)).alias("gcnt"))
    t = c0.agg(F.count(F.lit(1)).alias("n"))
    tv = (
        gt.crossJoin(F.broadcast(gl))
        .join(g, [*qi_cols, "bkt"], "left")
        .crossJoin(F.broadcast(t))
        .groupBy(*qi_cols, "gn")
        .agg(
            (
                F.lit(0.5)
                * F.sum(
                    F.abs(
                        F.coalesce(F.col("cnt"), F.lit(0)) / F.col("gn").cast("double")
                        - F.col("gcnt") / F.col("n").cast("double")
                    )
                )
            ).alias("tvd")
        )
    )
    return tv.select(
        *qi_cols,
        F.col("gn").alias("group_n"),
        F.round("tvd", 6).alias("tvd"),
        F.when(F.round("tvd", 6) > threshold, 1).otherwise(0).cast("long").alias(
            "breach"
        ),
    )


def theil_sen(
    series: DataFrame, x_col: str = "x", y_col: str = "y"
) -> DataFrame:
    """Theil-Sen robust trend estimator: the MEDIAN of all pairwise
    slopes (y_j - y_i)/(x_j - x_i), x_j > x_i — up to ~29% outlier
    contamination leaves the fit unmoved, where OLS chases every
    spike. Median is the exact LOWER median (element ceil(n/2) of the
    sorted multiset) so both engines pick the identical value with no
    interpolation. Intercept = lower median of (y - slope * x).

    ``series`` must already be aggregated to one row per x (pre-group
    first): the pair join is series-sized squared, which is why the
    caller aggregates to a bounded series (months, days) before
    calling — the 100 TB shape. Returns one row
    (slope, intercept, n_points, n_pairs)."""
    m = series.select(F.col(x_col).alias("xi"), F.col(y_col).alias("yi"))
    b = m.select(F.col("xi").alias("xj"), F.col("yi").alias("yj"))
    p = m.join(b, F.col("xj") > F.col("xi")).select(
        ((F.col("yj") - F.col("yi")) / (F.col("xj") - F.col("xi"))).alias("s")
    )
    np_ = p.agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    ws = Window.orderBy("s")
    ms = (
        p.withColumn("rk", F.row_number().over(ws))
        .crossJoin(F.broadcast(np_))
        .filter(F.col("rk") == F.floor((F.col("n_pairs") + 1) / 2))
        .select(F.col("s").alias("slope_raw"))
    )
    nm = m.agg(F.count(F.lit(1)).cast("long").alias("n_points"))
    res = m.crossJoin(F.broadcast(ms)).select(
        (F.col("yi") - F.col("slope_raw") * F.col("xi")).alias("r")
    )
    wr = Window.orderBy("r")
    mr = (
        res.withColumn("rk", F.row_number().over(wr))
        .crossJoin(F.broadcast(nm))
        .filter(F.col("rk") == F.floor((F.col("n_points") + 1) / 2))
        .select(F.col("r").alias("intercept_raw"))
    )
    return (
        ms.crossJoin(F.broadcast(mr))
        .crossJoin(F.broadcast(nm))
        .crossJoin(F.broadcast(np_))
        .select(
            F.round("slope_raw", 6).alias("slope"),
            F.round("intercept_raw", 6).alias("intercept"),
            "n_points",
            "n_pairs",
        )
    )


def mann_whitney_u(
    values: DataFrame,
    group_col: str = "g",
    value_col: str = "x",
    n_buckets: int | None = None,
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test with tie correction —
    the nonparametric two-sample location test next to ks_two_sample
    (distribution shape) and the z/t family (means): robust to
    heavy-tailed metrics like revenue where a mean test is dominated
    by outliers.

    ``values``: rows (group_col in {1, 2}, value_col numeric). Ranks
    are AVERAGE ranks computed on the pooled DISTINCT values: a value
    seen c times at cumulative-count-before ``cb`` has average rank
    cb + (c+1)/2, so the corpus-sized work is ONE value-keyed groupBy
    and the ordered window runs over distinct values only (the same
    100 TB shape as ks_two_sample). U1 = R1 - n1(n1+1)/2; the normal
    approximation uses the tie-corrected variance
    n1*n2/12 * ((n+1) - sum(c^3-c)/(n(n-1))). Returns one row
    (n1, n2, u1, u2, z)."""
    n = values.agg(
        F.sum(F.when(F.col(group_col) == 1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col(group_col) == 2, 1).otherwise(0)).cast("long").alias("n2"),
    )
    d = values.groupBy(F.col(value_col).alias("x")).agg(
        F.sum(F.when(F.col(group_col) == 1, 1).otherwise(0)).cast("long").alias("c1"),
        F.sum(F.when(F.col(group_col) == 2, 1).otherwise(0)).cast("long").alias("c2"),
    ).withColumn("c", F.col("c1") + F.col("c2"))
    # exclusive prefix = inclusive − own count (the bucketed primitive
    # only emits inclusive sums)
    r = bucketed_prefix_sums(d, "x", ["c"], n_buckets).select(
        "c1", "c", (F.col("cum_c") - F.col("c")).alias("cb")
    )
    s = r.agg(
        F.sum(
            F.col("c1")
            * (F.col("cb") + (F.col("c") + 1) / F.lit(2.0))
        ).alias("r1"),
        F.sum(
            F.col("c") * F.col("c") * F.col("c") - F.col("c")
        ).cast("double").alias("ties"),
    )
    return s.crossJoin(F.broadcast(n)).select(
        "n1",
        "n2",
        F.round(
            F.col("r1") - F.col("n1") * (F.col("n1") + 1) / F.lit(2.0), 6
        ).alias("u1"),
        F.round(
            F.col("n1").cast("double") * F.col("n2")
            - (F.col("r1") - F.col("n1") * (F.col("n1") + 1) / F.lit(2.0)),
            6,
        ).alias("u2"),
        F.round(
            (
                F.col("r1")
                - F.col("n1") * (F.col("n1") + 1) / F.lit(2.0)
                - F.col("n1").cast("double") * F.col("n2") / F.lit(2.0)
            )
            / F.sqrt(
                F.col("n1").cast("double") * F.col("n2") / F.lit(12.0)
                * (
                    (F.col("n1") + F.col("n2") + 1).cast("double")
                    - F.col("ties")
                    / (
                        (F.col("n1") + F.col("n2")).cast("double")
                        * (F.col("n1") + F.col("n2") - 1)
                    )
                )
            ),
            6,
        ).alias("z"),
    )


def _avg_rank(
    df: DataFrame, col: str, out: str, n_buckets: int | None = None
) -> DataFrame:
    """Distinct-value average-rank frame for ``col``: (value, avg rank).

    Average rank = cumulative count of strictly-smaller values +
    (count+1)/2 — the tie convention Spearman/Mann-Whitney need. The
    window runs over DISTINCT values only; callers join this back to
    the corpus on the value column (broadcast when the domain is
    small), so no corpus-sized global sort ever happens. ``n_buckets``
    range-buckets even the distinct-value window
    (``bucketed_prefix_sums``) for axes whose distinct domain is
    itself corpus-sized (timestamps, doubles)."""
    d = df.groupBy(F.col(col).alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    return bucketed_prefix_sums(d, "v", ["c"], n_buckets).select(
        F.col("v").alias(col),
        (
            (F.col("cum_c") - F.col("c")) + (F.col("c") + 1) / F.lit(2.0)
        ).alias(out),
    )


def spearman_rho(
    df: DataFrame, x_col: str, y_col: str, n_buckets: int | None = None
) -> DataFrame:
    """Spearman rank correlation: Pearson correlation over AVERAGE
    ranks (the tie-correct definition, not the 6*sum(d^2) shortcut
    which is only valid tie-free). Monotone-association measure that
    Pearson misses on nonlinear-but-monotone relations and that
    outliers can't dominate. Two distinct-value rank frames (window
    over distinct values only) joined back on the value columns, then
    one corr() aggregate. Returns one row (n_rows, rho)."""
    rx = _avg_rank(df, x_col, "rx", n_buckets)
    ry = _avg_rank(df, y_col, "ry", n_buckets)
    j = df.select(x_col, y_col).join(rx, x_col).join(ry, y_col)
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.round(F.corr("rx", "ry"), 6).alias("rho"),
    )


def stl_decompose(
    series: DataFrame,
    day_col: str = "day",
    value_col: str = "n",
    period: int = 7,
) -> DataFrame:
    """Additive seasonal-trend decomposition (STL-lite, one pass of
    the classical method): trend = centered ``period``-term moving
    average (NULL at the edges where the window is short), seasonal =
    mean detrended value per day-of-week recentred to sum ~0,
    remainder = value - trend - seasonal. The decomposition every
    forecast/anomaly operator implicitly assumes (seasonal_residual
    _anomalies, forecast_backtest_daily) made explicit and reusable.

    ``series`` is the already-aggregated daily frame — the ONLY
    corpus-sized work happens before this call; every window here
    runs on the days-sized series. Day-of-week is epoch-day
    arithmetic (Monday anchor), session-TZ-proof. Returns per-day
    rows (day, n, trend, seasonal, remainder)."""
    half = period // 2
    w7 = Window.orderBy(day_col).rowsBetween(-half, half)
    t = series.select(
        day_col,
        F.col(value_col).alias("n"),
        F.when(
            F.count(value_col).over(w7) == period,
            F.avg(value_col).over(w7),
        ).alias("trend"),
        (
            F.datediff(F.col(day_col), F.lit("1970-01-05").cast("date")) % period
        ).alias("dow"),
    )
    sm = (
        t.filter(F.col("trend").isNotNull())
        .groupBy("dow")
        .agg(F.avg(F.col("n") - F.col("trend")).alias("s_raw"))
    )
    sc = sm.agg(F.avg("s_raw").alias("s_mean"))
    s = sm.crossJoin(F.broadcast(sc)).select(
        "dow", (F.col("s_raw") - F.col("s_mean")).alias("seasonal")
    )
    return (
        t.join(F.broadcast(s), "dow")
        .select(
            day_col,
            "n",
            F.round("trend", 6).alias("trend"),
            F.round("seasonal", 6).alias("seasonal"),
            F.round(F.col("n") - F.col("trend") - F.col("seasonal"), 6).alias(
                "remainder"
            ),
        )
        .orderBy(day_col)
    )


def mann_kendall(
    series: DataFrame, x_col: str = "x", y_col: str = "y"
) -> DataFrame:
    """Mann-Kendall trend test: S = sum over ordered pairs of
    sign(y_j - y_i) with the tie-corrected normal approximation —
    the SIGNIFICANCE companion of theil_sen (which estimates the
    slope magnitude; this says whether a monotone trend exists at
    all, with no linearity or normality assumption). Variance
    var = (n(n-1)(2n+5) - sum t(t-1)(2t+5)) / 18 over tie groups t;
    z uses the standard continuity correction (S-1 / S+1).

    ``series`` must already be aggregated to one row per x (the
    pairwise frame is series-sized squared — callers aggregate to a
    bounded series first, the same 100 TB discipline as theil_sen).
    Returns one row (n_points, s_stat, z)."""
    m = series.select(F.col(x_col).alias("xi"), F.col(y_col).alias("yi"))
    b = m.select(F.col("xi").alias("xj"), F.col("yi").alias("yj"))
    s = (
        m.join(b, F.col("xj") > F.col("xi"))
        .agg(
            F.sum(F.signum(F.col("yj") - F.col("yi")))
            .cast("long")
            .alias("s_stat")
        )
    )
    n = m.agg(F.count(F.lit(1)).cast("long").alias("n_points"))
    t = (
        m.groupBy("yi")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).cast("double").alias("ties")
        )
    )
    var = (
        F.col("n_points").cast("double")
        * (F.col("n_points") - 1)
        * (2 * F.col("n_points") + 5)
        - F.col("ties")
    ) / F.lit(18.0)
    z = F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1) / F.sqrt(var)).when(
        F.col("s_stat") < 0, (F.col("s_stat") + 1) / F.sqrt(var)
    ).otherwise(F.lit(0.0))
    return (
        s.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(t))
        .select("n_points", "s_stat", F.round(z, 6).alias("z"))
    )
