"""Candidate: fellegi_sunter_em with the blocked self-join's probe side
repartitioned to defaultParallelism — the broadcast join otherwise runs
the ~4.5M-pair fan-out + md5 thinning inside the 1-3-task scan stage."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from social_link_prediction_spark.catalog.c05 import _FS_W, _t
from social_link_prediction_spark.ml import linksplit as mls


def candidate(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    sp = spark.sparkContext.defaultParallelism
    a = c.select(
        F.col("c_custkey").alias("ik"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_mktsegment").alias("sa"),
        F.col("c_acctbal").alias("ba"),
    ).repartition(sp)
    b = c.select(
        F.col("c_custkey").alias("jk"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_mktsegment").alias("sb"),
        F.col("c_acctbal").alias("bb"),
    )
    cp = (
        a.join(F.broadcast(b), "nk")
        .filter(F.col("ik") < F.col("jk"))
        .filter(
            mls.hash60(F.format_string("%d-%d", "ik", "jk"), F.lit("fs")) % 10
            < 3
        )
        .select(
            (F.col("sa") == F.col("sb")).cast("int").alias("g1"),
            (F.abs(F.col("ba") - F.col("bb")) < 500).cast("int").alias("g2"),
            (F.col("ik") % 10 == F.col("jk") % 10).cast("int").alias("g3"),
        )
    )
    pat = cp.groupBy("g1", "g2", "g3").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    ).persist()
    e = pat.limit(1).select(
        F.lit(0.1).alias("pm"),
        F.lit(0.9).alias("m1"), F.lit(0.9).alias("m2"), F.lit(0.9).alias("m3"),
        F.lit(0.5).alias("u1"), F.lit(0.5).alias("u2"), F.lit(0.5).alias("u3"),
    )
    for _ in range(6):
        wdf = pat.crossJoin(F.broadcast(e)).select(
            "g1", "g2", "g3", "n", F.expr(_FS_W).alias("w")
        )
        e = wdf.agg(
            (F.sum(F.col("w") * F.col("n")) / F.sum("n")).alias("pm"),
            *[
                (
                    F.sum(F.col("w") * F.col("n") * F.col(f"g{i}"))
                    / F.sum(F.col("w") * F.col("n"))
                ).alias(f"m{i}")
                for i in (1, 2, 3)
            ],
            *[
                (
                    F.sum((1.0 - F.col("w")) * F.col("n") * F.col(f"g{i}"))
                    / F.sum((1.0 - F.col("w")) * F.col("n"))
                ).alias(f"u{i}")
                for i in (1, 2, 3)
            ],
        )
    n_pairs = pat.agg(F.sum("n").cast("long").alias("n_pairs"))
    return n_pairs.crossJoin(F.broadcast(e)).select(
        "n_pairs",
        F.round("pm", 6).alias("p_match"),
        F.round("m1", 6).alias("m1"),
        F.round("m2", 6).alias("m2"),
        F.round("m3", 6).alias("m3"),
        F.round("u1", 6).alias("u1"),
        F.round("u2", 6).alias("u2"),
        F.round("u3", 6).alias("u3"),
    )
