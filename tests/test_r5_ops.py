"""Law-level tests for the round-5 operator families: skyline
dominance, weighted median, table fingerprints, temperature mixture,
Lloyd k-means, Kaplan-Meier, CUSUM, OLS trend, A/B z-test, join IVM.

Each test pins the defining LAW of the operator (dominance soundness +
completeness, order invariance, monotonicity, argmin/mean fixpoints),
not just one example's output — the catalog oracles already replay the
examples; these catch semantic drift the value hash can't name.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from social_link_prediction_spark.pipelines import similarity as psim
from social_link_prediction_spark.pipelines import training_prep as tp


# ---------------------------------------------------------------------
# Skyline: Spark result == brute-force dominance filter on random data
# ---------------------------------------------------------------------
def _brute_skyline(pairs):
    out = []
    for p, s in pairs:
        dominated = any(
            (p2 <= p and s2 >= s and (p2 < p or s2 > s)) for p2, s2 in pairs
        )
        if not dominated:
            out.append((p, s))
    return sorted(set(out))


def test_skyline_matches_bruteforce(spark):
    rng = random.Random(17)
    rows = [(float(rng.randint(1, 60)), rng.randint(1, 25)) for _ in range(300)]
    df = spark.createDataFrame(rows, "price double, size int")
    # the query's shape: per-price max, grid prune, running-max pass
    pp = df.groupBy("price").agg(F.max("size").alias("size"))
    from pyspark.sql import Window

    w = Window.orderBy("price").rowsBetween(Window.unboundedPreceding, -1)
    sky = (
        pp.withColumn("prevmax", F.max("size").over(w))
        .filter(F.col("prevmax").isNull() | (F.col("size") > F.col("prevmax")))
        .select("price", "size")
    )
    got = sorted((r.price, r.size) for r in sky.collect())
    assert got == _brute_skyline(rows)


# ---------------------------------------------------------------------
# Table fingerprint: row-order invariance, content sensitivity
# ---------------------------------------------------------------------
def test_fingerprint_monoid_laws(spark):
    from social_link_prediction_spark.ml.linksplit import hash60

    P = 1_000_000_007

    def fp(df):
        return df.agg(
            F.sum(hash60(F.col("k").cast("string"), F.col("v")) % P).alias("fp")
        ).first()["fp"]

    rows = [(i, f"v{i}") for i in range(200)]
    a = spark.createDataFrame(rows, "k long, v string")
    shuffled = spark.createDataFrame(list(reversed(rows)), "k long, v string").repartition(7)
    assert fp(a) == fp(shuffled)  # order + partitioning invariant
    mutated = spark.createDataFrame(
        rows[:-1] + [(199, "vX")], "k long, v string"
    )
    assert fp(a) != fp(mutated)  # single-cell change flips the digest


# ---------------------------------------------------------------------
# Temperature mixture: weight laws at the T extremes
# ---------------------------------------------------------------------
def test_temperature_mixture_laws(spark):
    df = spark.createDataFrame(
        [("a", 800), ("b", 150), ("c", 50)], "lang string, n long"
    )
    t1 = {
        r.lang: r
        for r in tp.temperature_mixture_plan(
            df, "lang", "n", temperature=1.0, budget_frac=0.5
        ).collect()
    }
    # T=1 is proportional sampling
    assert abs(t1["a"].weight - 0.8) < 1e-6
    assert abs(sum(r.weight for r in t1.values()) - 1.0) < 1e-5
    cold = {
        r.lang: r
        for r in tp.temperature_mixture_plan(
            df, "lang", "n", temperature=100.0, budget_frac=0.5
        ).collect()
    }
    # T→∞ flattens toward uniform: tail gains weight vs proportional
    assert cold["c"].weight > t1["c"].weight
    assert cold["a"].weight < t1["a"].weight
    # planned never exceeds availability; over-ask reports capped
    hot = tp.temperature_mixture_plan(
        df, "lang", "n", temperature=0.2, budget_frac=1.0
    ).collect()
    for r in hot:
        assert r.planned <= r.mass
    assert any(r.capped for r in hot)
    with pytest.raises(ValueError):
        tp.temperature_mixture_plan(df, "lang", "n", temperature=0)


# ---------------------------------------------------------------------
# Lloyd k-means: assignment is the argmin, centroids are member means
# ---------------------------------------------------------------------
def test_lloyd_kmeans_fixpoint_laws(spark):
    """At convergence a Lloyd assignment satisfies two fixpoint laws:
    (1) each point's reported sqdist equals its distance to the MEAN
    of its own cluster's members, and (2) that distance is the argmin
    over all clusters' means. Local optima (merged blobs from unlucky
    deterministic seeds) are legitimate — the laws hold regardless."""
    rng = random.Random(5)
    centers = [[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]]
    rows = []
    for i in range(90):
        cx, cy = centers[i % 3]
        rows.append((i, [cx + rng.gauss(0, 0.3), cy + rng.gauss(0, 0.3)]))
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    out = psim.lloyd_kmeans(df, k=3, rounds=8, id_col="vec_id", vec_col="v")
    got = {r.id: (r.cluster, r.sqdist) for r in out.collect()}
    assert len(got) == 90
    # determinism + convergence idempotence: more rounds, same answer
    again = {
        r.id: (r.cluster, r.sqdist)
        for r in psim.lloyd_kmeans(
            df, k=3, rounds=10, id_col="vec_id", vec_col="v"
        ).collect()
    }
    assert got == again
    pts = dict(rows)
    members: dict[int, list[int]] = {}
    for i, (c, _) in got.items():
        members.setdefault(c, []).append(i)
    means = {
        c: [sum(pts[i][d] for i in ids) / len(ids) for d in (0, 1)]
        for c, ids in members.items()
    }

    def sq(i, m):
        return sum((pts[i][d] - m[d]) ** 2 for d in (0, 1))

    for i, (c, sd) in got.items():
        assert abs(sd - sq(i, means[c])) < 1e-9  # dist to own mean
        for c2, m2 in means.items():
            assert sd <= sq(i, m2) + 1e-9  # argmin over all means


# ---------------------------------------------------------------------
# Kaplan-Meier (via catalog query shape): monotone, bounded, censoring
# ---------------------------------------------------------------------
def test_km_survival_laws(spark):
    from social_link_prediction_spark import queries as q

    rows = q.QUERIES["kaplan_meier_conversion"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows, "curve must be non-empty"
    prev = 1.0
    for r in rows:
        assert 0.0 <= r.survival <= prev + 1e-9  # non-increasing in [0,1]
        prev = r.survival
        assert r.n_events <= r.n_risk
    # risk set shrinks over time
    risks = [r.n_risk for r in rows]
    assert risks == sorted(risks, reverse=True)


# ---------------------------------------------------------------------
# Weighted median: crossing property
# ---------------------------------------------------------------------
def test_weighted_median_crossing(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 1.0), (100.0, 10.0)], "p double, q double"
    )
    from pyspark.sql import Window

    c = df.groupBy("p").agg(F.sum("q").alias("w"))
    tot = c.agg(F.sum("w").alias("tw"))
    win = Window.orderBy("p").rowsBetween(Window.unboundedPreceding, 0)
    s = c.withColumn("cw", F.sum("w").over(win)).crossJoin(F.broadcast(tot))
    med = s.filter(F.col("cw") >= F.col("tw") / 2).agg(F.min("p")).first()[0]
    # half the weight (6.0) is crossed only at p=100
    assert med == 100.0


# ---------------------------------------------------------------------
# Fingerprint-style IVM law: base+delta merge == full recompute
# ---------------------------------------------------------------------
def test_join_ivm_equals_full(spark):
    from social_link_prediction_spark import queries as q

    sf = "/root/testdata/sf0.001"
    inc = {
        r.nation: (r.n_orders, r.revenue)
        for r in q.QUERIES["join_ivm_nation_orders"](spark, sf).collect()
    }
    orders = q._t(spark, sf, "orders")
    cust = q._t(spark, sf, "customer")
    nat = q._t(spark, sf, "nation")
    full = {
        r.nation: (r.n, round(r.rev, 2))
        for r in orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(nat, cust["c_nationkey"] == nat["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("rev"))
        .collect()
    }
    assert set(inc) == set(full)
    for k in full:
        assert inc[k][0] == full[k][0]
        assert math.isclose(inc[k][1], full[k][1], rel_tol=1e-9)
