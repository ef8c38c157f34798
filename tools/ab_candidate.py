"""Candidate: als_panel_factorization with the rating aggregate r0 and
the panel frame pr persisted — r0 (lineitem x orders join + groupBy,
the heaviest subtree) is referenced 3x (itop, utop, pr) and pr ~7x
(both half-steps of both rounds, the residual join, the count)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from social_link_prediction_spark.catalog.c06 import _t
from social_link_prediction_spark.ml.linksplit import hash60


def candidate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    r0 = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            F.col("o_custkey").alias("u"), F.col("l_partkey").alias("i")
        )
        .agg(F.sum(F.round("l_quantity").cast("long")).cast("long").alias("rv"))
        .persist()
    )
    itop = (
        r0.groupBy("i").agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "i")
        .limit(16)
        .select("i")
    )
    utop = (
        r0.groupBy("u").agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "u")
        .limit(64)
        .select("u")
    )
    pr = r0.join(F.broadcast(itop), "i").join(F.broadcast(utop), "u").persist()
    h = itop.select(
        "i",
        (
            1e0
            + (hash60(F.col("i").cast("string"), F.lit("als0")) % 1000)
            / 1000e0
        ).alias("h1"),
        (
            1e0
            + (hash60(F.col("i").cast("string"), F.lit("als1")) % 1000)
            / 1000e0
        ).alias("h2"),
    )
    lam = F.lit(0.1)

    def _solve(grp: DataFrame) -> tuple[Column, Column]:
        det = (F.col("a") + lam) * (F.col("c") + lam) - F.col("b") * F.col("b")
        s1 = ((F.col("c") + lam) * F.col("d1") - F.col("b") * F.col("d2")) / det
        s2 = ((F.col("a") + lam) * F.col("d2") - F.col("b") * F.col("d1")) / det
        return s1, s2

    def _folds(df: DataFrame, key: str, ordk: str, f1: str, f2: str):
        arr = F.array_sort(
            F.collect_list(F.struct(ordk, f1, f2, "rv"))
        )
        return df.groupBy(key).agg(
            F.aggregate(arr, F.lit(0.0), lambda a, x: a + x[f1] * x[f1]).alias("a"),
            F.aggregate(arr, F.lit(0.0), lambda a, x: a + x[f1] * x[f2]).alias("b"),
            F.aggregate(arr, F.lit(0.0), lambda a, x: a + x[f2] * x[f2]).alias("c"),
            F.aggregate(arr, F.lit(0.0), lambda a, x: a + x[f1] * x["rv"]).alias("d1"),
            F.aggregate(arr, F.lit(0.0), lambda a, x: a + x[f2] * x["rv"]).alias("d2"),
        )

    stats = []
    for _ in (1, 2):
        wagg = _folds(pr.join(h, "i"), "u", "i", "h1", "h2")
        s1, s2 = _solve(wagg)
        w = wagg.select("u", s1.alias("w1"), s2.alias("w2")).localCheckpoint()
        hagg = _folds(
            pr.join(w, "u").select(
                "i", "u", F.col("w1").alias("h1"),
                F.col("w2").alias("h2"), "rv",
            ),
            "i", "u", "h1", "h2",
        )
        t1, t2 = _solve(hagg)
        h = hagg.select("i", t1.alias("h1"), t2.alias("h2")).localCheckpoint()
        joined = pr.join(w, "u").join(h, "i")
        resid = F.col("rv") - (
            F.col("w1") * F.col("h1") + F.col("w2") * F.col("h2")
        )
        sse = joined.agg(
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct("u", "i", resid.alias("e")))
                ),
                F.lit(0.0),
                lambda a, x: a + x["e"] * x["e"],
            ).alias("sse")
        )
        wn = w.agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("u", "w1", "w2"))),
                F.lit(0.0),
                lambda a, x: a + x["w1"] * x["w1"] + x["w2"] * x["w2"],
            ).alias("wnm")
        )
        hn = h.agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("i", "h1", "h2"))),
                F.lit(0.0),
                lambda a, x: a + x["h1"] * x["h1"] + x["h2"] * x["h2"],
            ).alias("hnm")
        )
        stats.append((sse, wn, hn))
    cnt = pr.agg(
        F.countDistinct("u").cast("long").alias("n_users"),
        F.countDistinct("i").cast("long").alias("n_items"),
        F.count(F.lit(1)).cast("long").alias("n_ratings"),
    )
    out = cnt
    for r_, (sse, wn, hn) in enumerate(stats, start=1):
        out = (
            out.crossJoin(F.broadcast(sse))
            .crossJoin(F.broadcast(wn))
            .crossJoin(F.broadcast(hn))
            .withColumn(
                f"rmse_round{r_}",
                F.round(F.sqrt(F.col("sse") / F.col("n_ratings")), 6),
            )
            .withColumn(
                f"loss_round{r_}",
                F.round(
                    F.col("sse") + F.lit(0.1) * (F.col("wnm") + F.col("hnm")),
                    4,
                ),
            )
            .drop("sse", "wnm", "hnm")
        )
    return out.select(
        "n_users", "n_items", "n_ratings",
        "rmse_round1", "rmse_round2", "loss_round1", "loss_round2",
    )
