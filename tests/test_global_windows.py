"""Law tests for the corpus-frame global-window devices (ADVICE r8):
``global_row_number`` + ``exact_ntile`` must be bit-identical to the
``row_number() / ntile() OVER (ORDER BY ...)`` window forms for every
partition count, sort direction, and k>n — the ~20 rewired catalog
queries rest on this equivalence, and until now only the end-to-end
oracle sweep pinned it (mirrors the bucketed_prefix_sums law test in
test_stats_ops.py)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from social_link_prediction_spark.operators.windows import (
    exact_ntile,
    global_row_number,
)


def _frame(spark, n=97, seed=7):
    rng = random.Random(seed)
    # unique order keys (the per-row rank-identity contract), uneven
    # value distribution so range partitions are skewed
    keys = rng.sample(range(-1000, 5000), n)
    rows = [(k, rng.randint(0, 4)) for k in keys]
    return spark.createDataFrame(rows, "x int, g int")


@pytest.mark.parametrize("n_parts", [1, 3, 32, 200])
@pytest.mark.parametrize("desc", [False, True])
def test_global_row_number_matches_window(spark, n_parts, desc):
    d = _frame(spark)
    order = F.col("x").desc() if desc else F.col("x").asc()
    got_df, n = global_row_number(d, order, out="rn", n_parts=n_parts)
    got = {r.x: r.rn for r in got_df.collect()}
    w = Window.orderBy(F.col("x").desc() if desc else F.col("x").asc())
    want = {
        r.x: r.rn
        for r in d.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert n == len(want)
    assert got == want


@pytest.mark.parametrize("k", [1, 2, 7, 10, 96, 97, 150, 400])
def test_exact_ntile_matches_window(spark, k):
    """Includes k > n (every row its own singleton bucket, trailing
    buckets empty) — the window ntile's documented degenerate case."""
    d = _frame(spark, n=97, seed=13)
    rn_df, n = global_row_number(d, "x", out="rn", n_parts=5)
    got = {
        r.x: r.b
        for r in rn_df.withColumn(
            "b", exact_ntile(F.col("rn"), n, k)
        ).collect()
    }
    w = Window.orderBy("x")
    want = {
        r.x: r.b for r in d.withColumn("b", F.ntile(k).over(w)).collect()
    }
    assert got == want


def test_global_row_number_multi_key(spark):
    rng = random.Random(29)
    rows = [
        (rng.randint(0, 9), i, rng.randint(0, 99)) for i in range(60)
    ]
    d = spark.createDataFrame(rows, "a int, b int, v int")
    got_df, n = global_row_number(
        d, [F.col("a").desc(), F.col("b").asc()], out="rn", n_parts=7
    )
    w = Window.orderBy(F.col("a").desc(), F.col("b").asc())
    want = {
        (r.a, r.b): r.rn
        for r in d.withColumn("rn", F.row_number().over(w)).collect()
    }
    got = {(r.a, r.b): r.rn for r in got_df.collect()}
    assert n == 60
    assert got == want


def test_global_row_number_tied_keys_value_selection(spark):
    """The blessed tied-key use (interarrival_burstiness_users):
    per-row rank identity is NOT guaranteed under ties, but the VALUE
    at any rank is — equal keys land in one range partition, so ties
    form one contiguous rank block."""
    rng = random.Random(31)
    rows = [(rng.randint(0, 5),) for _ in range(200)]
    d = spark.createDataFrame(rows, "x int")
    got_df, n = global_row_number(d, "x", out="rn", n_parts=8)
    got = {r.rn: r.x for r in got_df.collect()}
    want = sorted(x for (x,) in rows)
    assert n == 200
    assert sorted(got) == list(range(1, 201))
    assert [got[i] for i in range(1, 201)] == want
