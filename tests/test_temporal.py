"""As-of join, bucketed interval join, and sketch-rollup operators
(engine extensions beyond the reference's equi-join surface)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from social_link_prediction_spark.operators import joins as jn


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 12, minute, second)


def test_asof_join_basic_tie_and_tolerance(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts(10)),   # matches click at 12:10 (equal ts visible)
            (2, "u1", _ts(30)),   # matches latest click 12:25
            (3, "u2", _ts(5)),    # no click at all -> nulls
            (4, "u3", _ts(40)),   # only click is outside tolerance -> nulls
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts(10), 100),
            ("u1", _ts(25), 101),
            ("u1", _ts(25), 102),  # tie on ts: greater id (102) must win
            ("u1", _ts(35), 103),  # after left ts=30: invisible to event 2
            ("u3", _ts(0), 104),   # 40 min before event 4
        ],
        "user_id string, click_ts timestamp, click_id long",
    )
    out = jn.asof_join(
        left, right, on=["user_id"], left_ts="ts", right_ts="click_ts",
        payload=["click_id"], tolerance_seconds=30 * 60,
        right_order="click_id", matched_ts="click_ts",
    )
    rows = {r["event_id"]: r for r in out.collect()}
    assert len(rows) == 4
    assert rows[1]["click_id"] == 100 and rows[1]["click_ts"] == _ts(10)
    assert rows[2]["click_id"] == 102 and rows[2]["click_ts"] == _ts(25)
    assert rows[3]["click_id"] is None and rows[3]["click_ts"] is None
    assert rows[4]["click_id"] is None  # 40 min > 30 min tolerance


def test_asof_join_without_tolerance_keeps_oldest_match(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts(59))], "event_id long, user_id string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u1", _ts(0), 7)], "user_id string, click_ts timestamp, click_id long"
    )
    out = jn.asof_join(
        left, right, on=["user_id"], left_ts="ts", right_ts="click_ts",
        payload=["click_id"],
    )
    assert out.collect()[0]["click_id"] == 7


def test_bucketed_interval_join_exactly_once(spark):
    # interval spans 3 buckets at 60s; the point must match once, not 3x
    points = spark.createDataFrame(
        [(1, _ts(1, 30)), (2, _ts(0, 0)), (3, _ts(2, 59)), (4, _ts(3, 1))],
        "pid long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [("a", _ts(0, 0), _ts(2, 59))], "iid string, s timestamp, e timestamp"
    )
    out = jn.bucketed_interval_join(
        points, intervals, "ts", "s", "e", bucket_seconds=60
    )
    got = sorted(r["pid"] for r in out.collect())
    assert got == [1, 2, 3]  # boundaries inclusive, outside point dropped, no dups


def test_bucketed_interval_join_matches_nested_loop(spark):
    # property: bucket decomposition == naive theta join, any bucket width
    points = spark.createDataFrame(
        [(i, _ts(i % 60, (i * 7) % 60)) for i in range(40)], "pid long, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [(j, _ts(j * 3), _ts(j * 3 + 10)) for j in range(12)],
        "iid long, s timestamp, e timestamp",
    )
    fast = jn.bucketed_interval_join(points, intervals, "ts", "s", "e", bucket_seconds=137)
    slow = points.join(
        intervals, (F.col("ts") >= F.col("s")) & (F.col("ts") <= F.col("e"))
    )
    a = sorted((r["pid"], r["iid"]) for r in fast.collect())
    b = sorted((r["pid"], r["iid"]) for r in slow.collect())
    assert a == b and len(a) > 0


def test_hll_rollup_merge_is_lossless_and_accurate(spark):
    ev = spark.range(0, 5000).select(
        (F.col("id") % 37).alias("hour"), (F.col("id") % 411).alias("user_id")
    )
    hourly = ev.groupBy("hour").agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"))
    merged = hourly.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).collect()[0]["est"]
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(14))).alias("est")
    ).collect()[0]["est"]
    exact = ev.select("user_id").distinct().count()
    assert merged == direct  # union of sketches == sketch of union
    assert abs(merged - exact) / exact < 0.05


def test_cms_never_underestimates_and_merges(spark):
    from pyspark.sql import functions as F

    from social_link_prediction_spark.operators import aggregates as agg

    rows = [("a",)] * 50 + [("b",)] * 20 + [("c",)] * 5 + [("d",)] * 1
    df = spark.createDataFrame(rows, ["w"])
    cms = agg.cms_build(df, "w", depth=4, width=64)
    keys = spark.createDataFrame([("a",), ("b",), ("c",), ("d",)], ["w"])
    est = {r.w: r.cms_estimate for r in agg.cms_estimate(cms, keys, "w", 4, 64).collect()}
    exact = {"a": 50, "b": 20, "c": 5, "d": 1}
    for k, v in exact.items():
        assert est[k] >= v  # CMS can only overestimate
    # mergeability: sketch(A) + sketch(B) == sketch(A union B), counter-wise
    a = spark.createDataFrame([("a",)] * 30 + [("b",)] * 5, ["w"])
    b = spark.createDataFrame([("a",)] * 20 + [("b",)] * 15 + [("c",)] * 5 + [("d",)] * 1, ["w"])
    ca = agg.cms_build(a, "w", depth=4, width=64)
    cb = agg.cms_build(b, "w", depth=4, width=64)
    merged = (
        ca.unionByName(cb).groupBy("r", "b").agg(F.sum("cnt").alias("cnt"))
    )
    full = agg.cms_build(df, "w", depth=4, width=64)
    diff = merged.join(full, ["r", "b"], "full")
    bad = diff.filter(
        F.coalesce(merged["cnt"], F.lit(0)) != F.coalesce(full["cnt"], F.lit(0))
    ).count()
    assert bad == 0


def test_sketch_quantile_error_bound(spark):
    # histogram-sketch quantile is within half a bin width of exact
    import numpy as np
    from pyspark.sql import functions as F

    vals = [float(x) for x in np.random.RandomState(7).lognormal(3, 1, 4000)]
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    lo, hi = min(vals), max(vals)
    bins = 512
    width = (hi - lo) / bins
    binned = (
        df.select(
            F.least(F.lit(bins - 1), F.floor((F.col("x") - lo) / width).cast("long")).alias("b")
        )
        .groupBy("b").agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    counts = {r.b: r.n for r in binned}
    total = sum(counts.values())
    for q in (0.5, 0.9, 0.99):
        c = 0
        for b in sorted(counts):
            c += counts[b]
            if c >= q * total:
                est = lo + (b + 0.5) * width
                break
        exact = float(np.quantile(np.array(vals), q, method="inverted_cdf"))
        assert abs(est - exact) <= width, (q, est, exact, width)


def test_bucket_head_topk_equals_direct(spark):
    # per-bucket rank-k heads answer the global top-k exactly
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    import numpy as np

    vals = np.random.RandomState(11).permutation(5000)
    df = spark.createDataFrame(
        [(int(i), float(v)) for i, v in enumerate(vals)], ["k", "v"]
    )
    wb = Window.partitionBy(F.pmod(F.col("k"), F.lit(16))).orderBy(
        F.col("v").desc(), F.col("k").asc()
    )
    heads = df.withColumn("__r", F.row_number().over(wb)).filter(F.col("__r") <= 10)
    from_heads = [
        (r.k, r.v)
        for r in heads.orderBy(F.col("v").desc(), F.col("k")).limit(10).collect()
    ]
    direct = [
        (r.k, r.v) for r in df.orderBy(F.col("v").desc(), F.col("k")).limit(10).collect()
    ]
    assert from_heads == direct
